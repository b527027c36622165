package com.mongodb.client.model;

import com.mongodb.client.FakeMongoRegistry;

/** Test-only fake: see com.mongodb.client.FakeMongoRegistry. */
public final class ReplaceOptions {
  private boolean upsert = false;

  public ReplaceOptions() {}

  public ReplaceOptions upsert(boolean value) {
    FakeMongoRegistry.log("ReplaceOptions.upsert", String.valueOf(value));
    this.upsert = value;
    return this;
  }

  public boolean isUpsert() {
    return upsert;
  }

  @Override
  public String toString() {
    return "ReplaceOptions{upsert=" + upsert + "}";
  }
}
