package com.mongodb.client;

/** Test-only fake: see FakeMongoRegistry. */
public final class MongoClients {
  private MongoClients() {}

  public static FakeMongoClient create(String uri) {
    FakeMongoRegistry.log("create", uri);
    return new FakeMongoClient(uri);
  }
}
