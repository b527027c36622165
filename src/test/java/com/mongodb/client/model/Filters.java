package com.mongodb.client.model;

import com.mongodb.client.FakeMongoRegistry;

/** Test-only fake: see com.mongodb.client.FakeMongoRegistry. */
public final class Filters {
  private Filters() {}

  public static Object eq(String field, Object value) {
    FakeMongoRegistry.log("Filters.eq", field + "=" + value);
    return "eq(" + field + ", " + value + ")";
  }
}
