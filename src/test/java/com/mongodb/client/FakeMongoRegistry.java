package com.mongodb.client;

import java.util.ArrayList;
import java.util.Collections;
import java.util.List;

/**
 * Call recorder for the TEST-ONLY fake Mongo driver (see
 * MongoClients.java in this directory). graft's MongoDocStore reaches
 * the real driver via reflection so the build stays jar-less; these
 * fakes occupy the exact same class/method coordinates on the TEST
 * classpath, so the full reflective call chain executes offline and a
 * renamed class, method, or document field fails a golden spec
 * instead of a production submit (r13 VERDICT item 7).
 */
public final class FakeMongoRegistry {
  private FakeMongoRegistry() {}

  public static final List<String> CALLS =
      Collections.synchronizedList(new ArrayList<String>());

  public static void log(String op, String arg) {
    CALLS.add(op + "(" + arg + ")");
  }

  public static void clear() {
    CALLS.clear();
  }
}
