package com.mongodb.client;

/** Test-only fake: see FakeMongoRegistry. */
public final class FakeMongoDatabase {
  private final String uri;
  private final String db;

  FakeMongoDatabase(String uri, String db) {
    this.uri = uri;
    this.db = db;
  }

  public FakeMongoCollection getCollection(String name) {
    FakeMongoRegistry.log("getCollection", name);
    return new FakeMongoCollection(uri, db, name);
  }
}
