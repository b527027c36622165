package com.mongodb.client;

/** Test-only fake: see FakeMongoRegistry. */
public final class FakeMongoCollection {
  private final String uri;
  private final String db;
  private final String coll;

  FakeMongoCollection(String uri, String db, String coll) {
    this.uri = uri;
    this.db = db;
    this.coll = coll;
  }

  /**
   * Matches the real driver's replaceOne(Bson, TDocument,
   * ReplaceOptions) by name and parameter count — the lookup
   * MongoDocStore.insertMany performs.
   */
  public Object replaceOne(Object filter, Object replacement,
      Object options) {
    FakeMongoRegistry.log("replaceOne",
        filter + " | " + replacement + " | " + options);
    return "ack";
  }
}
