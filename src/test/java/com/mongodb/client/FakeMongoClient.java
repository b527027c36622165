package com.mongodb.client;

/** Test-only fake: see FakeMongoRegistry. */
public final class FakeMongoClient {
  private final String uri;

  FakeMongoClient(String uri) {
    this.uri = uri;
  }

  public FakeMongoDatabase getDatabase(String name) {
    FakeMongoRegistry.log("getDatabase", name);
    return new FakeMongoDatabase(uri, name);
  }
}
