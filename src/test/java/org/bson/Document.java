package org.bson;

import java.util.LinkedHashMap;
import java.util.Map;

/** Test-only fake: see com.mongodb.client.FakeMongoRegistry. */
public final class Document {
  private final Map<String, Object> fields = new LinkedHashMap<>();

  public Document(String key, Object value) {
    fields.put(key, value);
  }

  public Document append(String key, Object value) {
    fields.put(key, value);
    return this;
  }

  public Object get(String key) {
    return fields.get(key);
  }

  @Override
  public String toString() {
    return "Document" + fields;
  }
}
