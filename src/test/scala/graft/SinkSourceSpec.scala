package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.streaming.{DocStoreSink, EditStream, KafkaEditSource, MongoDocStore, WikiEditPipeline}
import graft.streaming.DocStoreSink.{DirDocStore, DocStore}

/** Kafka source surface (offline: the option map + decode path) and the
  * concrete batched external-store sink (batch size / flush interval /
  * retry / idempotence semantics) — reference
  * DataStreamJob.java:114-120 and 125-135.
  */
class SinkSourceSpec extends GraftSpecBase {

  // ---- KafkaEditSource -------------------------------------------------

  test("kafka source builder produces the exact readStream option map") {
    val src = KafkaEditSource(
      brokers = "broker1:9092,broker2:9092",
      topic = "wikipedia-events",
      groupId = Some("consumer-group-1"),
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(50000L))
    assert(src.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "wikipedia-events",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "true",
      "kafka.group.id" -> "consumer-group-1",
      "maxOffsetsPerTrigger" -> "50000"))
  }

  test("kafka source defaults mirror the reference job; extras pass through") {
    val src = KafkaEditSource(brokers = "b:9092",
      extra = Map("kafka.security.protocol" -> "SASL_SSL"))
    val o = src.options
    assert(o("subscribe") == "wikipedia-events")      // reference topic
    assert(o("startingOffsets") == "latest")          // OffsetsInitializer.latest()
    assert(!o.contains("kafka.group.id"))
    assert(o("kafka.security.protocol") == "SASL_SSL")
  }

  test("kafka preflight resolves the provider; decode works on " +
      "kafka-shaped frames") {
    initLog()
    // r17: the TEST classpath carries a fake provider at the real
    // class coordinates + ServiceLoader shortName (the Mongo
    // fake-driver precedent), so the preflight sees the jar-ful world
    // and load() resolves format("kafka") — the full E2E lives in
    // StreamingSpec. The jar-less fail-fast require() in load() is
    // unchanged production logic gated on the same preflight.
    assert(KafkaEditSource.isAvailable)
    val frames = KafkaEditSource(brokers = "b:9092",
      topic = s"preflight-${System.nanoTime()}").load(spark)
    assert(frames.isStreaming)
    assert(frames.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset",
        "timestamp", "timestampType"))
    // decode() is the same path proven e2e in StreamingSpec's
    // kafka-shaped test; here: schema contract only
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = KafkaEditSource(brokers = "b:9092")
      .decode(mem.toDF().withColumnRenamed("value", "ignored")
        .withColumn("value", col("ignored").cast("binary")))
    assert(decoded.columns.contains("domain") &&
      decoded.columns.contains("new_length"))
  }

  // ---- DocStoreSink ----------------------------------------------------

  private def docsDf(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"title_$i")).toDF("id", "title")
  }

  private def readStore(dir: String): Seq[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".jsonl")).toSeq
      .flatMap(p => Files.readAllLines(p).asScala)

  test("batched sink chunks by batchSize and stores every doc exactly once") {
    initLog()
    val dir = Files.createTempDirectory("graft_store").toString
    val df = docsDf(250).repartition(3)
    DocStoreSink.writeBatch(df, epochId = 7L, DirDocStore(dir), batchSize = 40)
    val lines = readStore(dir)
    assert(lines.length == 250)
    assert(lines.distinct.length == 250)
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".jsonl")).toSeq
    assert(files.forall(_.startsWith("e7-p")))
    // 250 rows over 3 partitions at batchSize 40 → ceil per partition
    assert(files.size >= 7 && files.size <= 9, files.mkString(","))
  }

  test("epoch replay (at-least-once redelivery) leaves one copy per doc") {
    initLog()
    val dir = Files.createTempDirectory("graft_store2").toString
    val df = docsDf(100).repartition(2)
    DocStoreSink.writeBatch(df, 3L, DirDocStore(dir), batchSize = 30)
    DocStoreSink.writeBatch(df, 3L, DirDocStore(dir), batchSize = 30) // replay
    val lines = readStore(dir)
    assert(lines.length == 100 && lines.distinct.length == 100)
  }

  test("replay of a SHUFFLED batch regenerates byte-identical chunks") {
    initLog()
    // An aggregation's reduce-side row order depends on shuffle-fetch
    // order; the sink's per-partition sort must make chunk contents a
    // pure function of the data so replays overwrite instead of
    // duplicating. Compare full store snapshots (file name -> bytes)
    // across two independent executions of the same aggregated plan.
    import org.apache.spark.sql.functions._
    val agg = docsDf(500)
      .groupBy((col("id") % 97).as("k"))
      .agg(count(lit(1)).as("n"), max(col("title")).as("top_title"))
    def snapshot(): Map[String, String] = {
      val dir = Files.createTempDirectory("graft_store_det").toString
      DocStoreSink.writeBatch(agg, 11L, DirDocStore(dir), batchSize = 13)
      Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".jsonl"))
        .map(p => p.getFileName.toString ->
          new String(Files.readAllBytes(p), "UTF-8")).toMap
    }
    val a = snapshot()
    val b = snapshot()
    assert(a.keySet == b.keySet)
    assert(a == b, "chunk contents must be deterministic under replay")
    assert(a.size > 1, "expect multiple chunks so the test is non-trivial")
  }

  test("transient insert failures are retried up to maxRetries (Mongo setMaxRetries analog)") {
    initLog()
    val dir = Files.createTempDirectory("graft_store3").toString
    SinkSourceSpec.reset()
    val flaky = SinkSourceSpec.FlakyStore(DirDocStore(dir), failuresPerKey = 2)
    DocStoreSink.writeBatch(docsDf(50).repartition(2), 1L, flaky,
      batchSize = 20, maxRetries = 3)
    assert(readStore(dir).length == 50)
    assert(SinkSourceSpec.totalFailures.get() > 0, "retry path never exercised")
  }

  test("insert failing beyond maxRetries fails the task (no silent loss)") {
    initLog()
    val dir = Files.createTempDirectory("graft_store4").toString
    SinkSourceSpec.reset()
    val broken = SinkSourceSpec.FlakyStore(DirDocStore(dir), failuresPerKey = 99)
    intercept[org.apache.spark.SparkException] {
      DocStoreSink.writeBatch(docsDf(10).coalesce(1), 1L, broken,
        batchSize = 10, maxRetries = 2)
    }
  }

  test("sink restart from checkpoint: no loss, no duplicates across stop/start") {
    initLog()
    val in = Files.createTempDirectory("graft_rs_in").toString
    val dir = Files.createTempDirectory("graft_rs_store").toString
    val ck = Files.createTempDirectory("graft_rs_ck").toString
    def doc(i: Int) = s"""{"doc_id":$i,"text":"doc number $i"}"""
    def startQ() = DocStoreSink.start(
      spark.readStream.schema("doc_id LONG, text STRING").json(in),
      DirDocStore(dir), ck, batchSize = 10, outputMode = "append")
    Files.write(Paths.get(in, "b1.json"), (1 to 5).map(doc).mkString("\n").getBytes)
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    Files.write(Paths.get(in, "b2.json"), (6 to 9).map(doc).mkString("\n").getBytes)
    val q2 = startQ()                       // same checkpoint: resumes
    try q2.processAllAvailable() finally q2.stop()
    val ids = readStore(dir).flatMap(l =>
      "\"doc_id\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
    assert(ids.sorted == (1 to 9).toList, ids.sorted.mkString(","))
  }

  test("store outage: failed epoch replays on restart, converging exactly-once") {
    initLog()
    val in = Files.createTempDirectory("graft_cr_in").toString
    val dir = Files.createTempDirectory("graft_cr_store").toString
    val ck = Files.createTempDirectory("graft_cr_ck").toString
    Files.write(Paths.get(in, "b1.json"),
      (1 to 6).map(i => s"""{"doc_id":$i,"text":"d$i"}""").mkString("\n").getBytes)
    def startQ(store: DocStore) = DocStoreSink.start(
      spark.readStream.schema("doc_id LONG, text STRING").json(in),
      store, ck, batchSize = 10, maxRetries = 1, outputMode = "append")
    // outage: every insert fails -> retries exhaust -> the QUERY fails,
    // the epoch is NOT committed to the checkpoint
    SinkSourceSpec.reset()
    val down = SinkSourceSpec.FlakyStore(DirDocStore(dir), failuresPerKey = 99)
    val q1 = startQ(down)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(readStore(dir).isEmpty, "no partial batch should be visible")
    // store heals; restart from the same checkpoint replays the epoch
    val q2 = startQ(DirDocStore(dir))
    try q2.processAllAvailable() finally q2.stop()
    val ids = readStore(dir).flatMap(l =>
      "\"doc_id\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
    assert(ids.sorted == (1 to 6).toList, ids.sorted.mkString(","))
  }

  test("crash MID-epoch: partially written chunks stay visible, and a " +
      "checkpoint restart converges byte-identically to an " +
      "uninterrupted twin run (at-least-once -> effectively-once)") {
    initLog()
    // the reference sink is DeliveryGuarantee.AT_LEAST_ONCE
    // (DataStreamJob.java:133): a crash between chunk inserts leaves a
    // PARTIAL epoch in the store (unlike the outage spec, where no
    // insert lands). Restarting from the same checkpoint replays the
    // whole uncommitted epoch; the keyed (epoch,partition,chunk)
    // upsert + deterministic chunk contents overwrite the partial
    // writes, so the final store equals a run that never crashed.
    val in = Files.createTempDirectory("graft_mid_in").toString
    val dir = Files.createTempDirectory("graft_mid_store").toString
    val ck = Files.createTempDirectory("graft_mid_ck").toString
    val twinDir = Files.createTempDirectory("graft_mid_twin").toString
    val twinCk = Files.createTempDirectory("graft_mid_twin_ck").toString
    def doc(i: Int) = s"""{"doc_id":$i,"text":"doc number $i"}"""
    Files.write(Paths.get(in, "b1.json"),
      (1 to 15).map(doc).mkString("\n").getBytes)
    Files.write(Paths.get(in, "b2.json"),
      (16 to 30).map(doc).mkString("\n").getBytes)
    def startQ(store: DocStore, c: String) = DocStoreSink.start(
      spark.readStream.schema("doc_id LONG, text STRING").json(in),
      store, c, batchSize = 5, maxRetries = 1, outputMode = "append")
    // crash after the first 2 chunk inserts land (JVM-wide allowance)
    SinkSourceSpec.resetBudget(2)
    val q1 = startQ(
      SinkSourceSpec.CrashAfterStore(DirDocStore(dir)), ck)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    val partial = readStore(dir)
    assert(partial.nonEmpty,
      "crash must leave a PARTIAL epoch visible — else this test " +
        "degenerates to the outage spec")
    assert(partial.length < 30, s"only a strict subset may land " +
      s"pre-crash (got ${partial.length}/30)")
    // heal + restart from the SAME checkpoint: epoch replays in full
    val q2 = startQ(DirDocStore(dir), ck)
    try q2.processAllAvailable() finally q2.stop()
    // uninterrupted twin: same input, healthy store from the start
    val qt = startQ(DirDocStore(twinDir), twinCk)
    try qt.processAllAvailable() finally qt.stop()
    def snapshot(d: String): Map[String, String] =
      Files.list(Paths.get(d)).iterator().asScala
        .filter(_.toString.endsWith(".jsonl"))
        .map(p => p.getFileName.toString ->
          new String(Files.readAllBytes(p), "UTF-8")).toMap
    val recovered = snapshot(dir)
    val twin = snapshot(twinDir)
    assert(recovered.keySet == twin.keySet,
      s"chunk sets differ: ${recovered.keySet} vs ${twin.keySet}")
    assert(recovered == twin,
      "recovered store must be byte-identical to the uninterrupted run")
    assert(recovered.size > 2, "expect the replay to add chunks " +
      "beyond the pre-crash survivors")
  }

  test("streaming quality-gated ingest: low-quality docs never reach the store") {
    initLog()
    // The batch quality transform applied 1:1 to a stream — ingest-time
    // corpus gating, the streaming face of the curation pipeline.
    val in = Files.createTempDirectory("graft_gate_in").toString
    val dir = Files.createTempDirectory("graft_gate_store").toString
    val ck = Files.createTempDirectory("graft_gate_ck").toString
    val good = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo"
    val junk = "the the the the the the the the the the the the"
    Files.write(Paths.get(in, "b1.json"),
      (s"""{"doc_id":1,"text":"$good"}""" + "\n" +
        s"""{"doc_id":2,"text":"$junk"}""").getBytes)
    val stream = spark.readStream.schema("doc_id LONG, text STRING").json(in)
    val gated = graft.operators.TextAnalysis.qualityScores(stream)
      .filter(col("quality_score") >= 0.5)
    val q = DocStoreSink.start(gated, DirDocStore(dir), ck,
      batchSize = 100, outputMode = "append")
    try {
      q.processAllAvailable()
      val lines = readStore(dir)
      assert(lines.exists(_.contains("\"doc_id\":1")), lines.mkString("|"))
      assert(!lines.exists(_.contains("\"doc_id\":2")), lines.mkString("|"))
    } finally q.stop()
  }

  test("streaming e2e: windowed docs land in the store via the batched sink") {
    initLog()
    val in = Files.createTempDirectory("graft_sink_in").toString
    val dir = Files.createTempDirectory("graft_store5").toString
    val ck = Files.createTempDirectory("graft_sink_ck").toString
    Files.write(Paths.get(in, "b1.json"),
      ("""{"id":"1","domain":"fr.wikipedia.org","namespace":"main namespace",""" +
        """"title":"T","timestamp":"2023-11-27T10:00:10Z","user_name":"u",""" +
        """"user_type":"human","old_length":10,"new_length":30}""").getBytes)
    val stream = WikiEditPipeline.windowedEditSize(
      EditStream.readJsonFiles(spark, in))
    val q = DocStoreSink.start(stream, DirDocStore(dir), ck,
      batchSize = 1000, flushInterval = "1 second", outputMode = "complete")
    try {
      q.processAllAvailable()
      val lines = readStore(dir)
      assert(lines.exists(d => d.contains("\"fr.wikipedia.org\"") &&
        d.contains("\"edit_size\":20")), lines.mkString("|"))
    } finally q.stop()
  }

  test("mongo adapter: the FULL reflective call chain against the " +
      "fake driver — a renamed class/method/field fails here, not in " +
      "a production submit (golden call sequence)") {
    initLog()
    import com.mongodb.client.FakeMongoRegistry
    val store = MongoDocStore("mongodb://host:27017", "wiki", "edits")
    // connection mapping is plain data — the one-line swap target
    assert(store.uri == "mongodb://host:27017")
    assert(store.database == "wiki" && store.collection == "edits")
    // the TEST classpath carries a fake driver at the real driver's
    // exact class/method coordinates (src/test/java/com/mongodb/...)
    // so the reflection that production defers to the cluster jar
    // executes — and is golden-pinned — offline
    assert(MongoDocStore.isAvailable)
    FakeMongoRegistry.clear()
    store.insertMany("e0-p0-c0", Seq("{\"a\":1}", "{\"b\":2}"))
    import scala.jdk.CollectionConverters._
    assert(FakeMongoRegistry.CALLS.asScala.toList == List(
      "create(mongodb://host:27017)",
      "getDatabase(wiki)",
      "getCollection(edits)",
      "Filters.eq(_id=e0-p0-c0)",
      "ReplaceOptions.upsert(true)",
      "replaceOne(eq(_id, e0-p0-c0) | " +
        "Document{_id=e0-p0-c0, docs=[{\"a\":1}, {\"b\":2}]} | " +
        "ReplaceOptions{upsert=true})"),
      FakeMongoRegistry.CALLS.asScala.mkString("\n"))
    // replay idempotence shape: the SAME key re-upserts the same _id
    // (replaceOne again), and the lazily-created client is REUSED on
    // the same executor — no second create/getDatabase/getCollection
    FakeMongoRegistry.clear()
    store.insertMany("e0-p0-c0", Seq("{\"a\":1}", "{\"b\":2}"))
    val replay = FakeMongoRegistry.CALLS.asScala.toList
    assert(!replay.exists(_.startsWith("create(")), replay.mkString("\n"))
    assert(replay.count(_.startsWith("replaceOne(")) == 1)
    // one instance ships to every executor — must survive JVM serialization
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(store)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
      .asInstanceOf[MongoDocStore]
    assert(back == store)
  }
}

object SinkSourceSpec {
  /** Store that fails the first `failuresPerKey` attempts of each key —
    * shared JVM state works because local-mode executors are in-process.
    */
  private val attempts = new ConcurrentHashMap[String, AtomicInteger]()
  val totalFailures = new AtomicInteger(0)
  def reset(): Unit = { attempts.clear(); totalFailures.set(0) }

  final case class FlakyStore(inner: DocStore, failuresPerKey: Int)
      extends DocStore {
    override def insertMany(key: String, docs: Seq[String]): Unit = {
      val n = attempts.computeIfAbsent(key, _ => new AtomicInteger(0))
        .incrementAndGet()
      if (n <= failuresPerKey) {
        totalFailures.incrementAndGet()
        throw new RuntimeException(s"transient store failure #$n for $key")
      }
      inner.insertMany(key, docs)
    }
  }

  /** Store with a JVM-wide insert allowance: the first `resetBudget(n)`
    * inserts land, every later one crashes — models a process dying
    * MID-epoch with some chunks already durable (the at-least-once
    * exposure the crash-recovery spec replays through).
    */
  private val insertBudget = new AtomicInteger(0)
  def resetBudget(n: Int): Unit = insertBudget.set(n)

  final case class CrashAfterStore(inner: DocStore) extends DocStore {
    override def insertMany(key: String, docs: Seq[String]): Unit = {
      if (insertBudget.getAndDecrement() <= 0)
        throw new RuntimeException(s"simulated crash before insert of $key")
      inner.insertMany(key, docs)
    }
  }
}
