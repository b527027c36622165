package graft.streaming

/** Concrete MongoDB adapter for [[DocStoreSink.DocStore]] — the
  * reference's real sink target (DataStreamJob.java:125-135 wires
  * MongoSink with a connection URI, database and collection on top of
  * the batch/retry knobs that [[DocStoreSink]] already maps 1:1).
  *
  * Each insertMany(key, docs) is a `replaceOne({_id: key}, {_id: key,
  * docs: [...]}, upsert)` — a keyed OVERWRITE, which is exactly the
  * idempotence contract DocStore requires: an epoch replay rewrites
  * the same `_id`s with the same contents and the collection converges
  * to one copy per chunk (the reference relies on the same Mongo
  * upsert behavior for its AT_LEAST_ONCE delivery).
  *
  * The Mongo Java driver is reached via reflection, same preflight
  * pattern as [[KafkaEditSource]]: this file compiles and loads
  * without the driver jar; [[MongoDocStore.isAvailable]] reports
  * whether `org.mongodb:mongodb-driver-sync` is on the executor
  * classpath, and `insertMany` fails fast with a clear message when it
  * is not. Swap it in for the directory fake one line at a time:
  *
  * {{{
  * // test:        DocStoreSink.start(df, DirDocStore("/out/docs"), cp)
  * // production:  DocStoreSink.start(df,
  * //   MongoDocStore("mongodb://host:27017", "wiki", "edits"), cp)
  * }}}
  *
  * Holds only the three connection strings; the client is created
  * lazily per executor JVM (transient) and reused across insertMany
  * calls on that executor.
  */
final case class MongoDocStore(
    uri: String,
    database: String,
    collection: String) extends DocStoreSink.DocStore {

  @transient private lazy val coll: AnyRef = {
    require(MongoDocStore.isAvailable,
      "mongodb-driver-sync not on the classpath; add " +
        "org.mongodb:mongodb-driver-sync (cluster deploys ship it) or " +
        "use DirDocStore / another DocStore for local runs")
    val clients = Class.forName("com.mongodb.client.MongoClients")
    val client = clients.getMethod("create", classOf[String])
      .invoke(null, uri)
    val db = client.getClass.getMethod("getDatabase", classOf[String])
      .invoke(client, database)
    db.getClass.getMethod("getCollection", classOf[String])
      .invoke(db, collection)
  }

  override def insertMany(key: String, docs: Seq[String]): Unit = {
    val c = coll // preflight + connect before touching driver classes
    val docCls = Class.forName("org.bson.Document")
    val replacement = docCls.getConstructor(classOf[String], classOf[Object])
      .newInstance("_id", key).asInstanceOf[AnyRef]
    docCls.getMethod("append", classOf[String], classOf[Object])
      .invoke(replacement, "docs",
        scala.jdk.CollectionConverters.SeqHasAsJava(docs).asJava)
    val filters = Class.forName("com.mongodb.client.model.Filters")
    val filter = filters.getMethod("eq", classOf[String], classOf[Object])
      .invoke(null, "_id", key)
    val optsCls = Class.forName("com.mongodb.client.model.ReplaceOptions")
    val opts = optsCls.getConstructor().newInstance().asInstanceOf[AnyRef]
    optsCls.getMethod("upsert", classOf[Boolean])
      .invoke(opts, java.lang.Boolean.TRUE)
    val replaceOne = c.getClass.getMethods
      .find(m => m.getName == "replaceOne" && m.getParameterCount == 3)
      .getOrElse(throw new NoSuchMethodException(
        "MongoCollection.replaceOne(Bson, TDocument, ReplaceOptions)"))
    replaceOne.invoke(c, filter, replacement, opts)
    ()
  }
}

object MongoDocStore {

  /** True when the synchronous Mongo driver is loadable. */
  lazy val isAvailable: Boolean =
    try {
      Class.forName("com.mongodb.client.MongoClients")
      true
    } catch { case _: Throwable => false }
}
