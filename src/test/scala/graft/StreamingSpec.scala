package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.{EditStream, JsonDocSink, SessionTracker, WikiEditPipeline}

/** End-to-end streaming specs driven through the real file-stream
  * source (new file = new micro-batch, advancing the watermark
  * between processAllAvailable calls — the closest local stand-in
  * for the reference's Kafka topic).
  */
class StreamingSpec extends GraftSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def editJson(id: Int, domain: String, userType: String,
      ns: String, t: String, oldLen: Long, newLen: Long): String =
    s"""{"id":"$id","domain":"$domain","namespace":"$ns","title":"T$id",""" +
      s""""timestamp":"$t","user_name":"u$id","user_type":"$userType",""" +
      s""""old_length":$oldLen,"new_length":$newLen}"""

  test("full pipeline: stream result equals batch twin (reference semantics)") {
    initLog()
    val in = tmp("graft_in")
    val lines = Seq(
      editJson(1, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:01:00Z", 100, 150),                       // +50
      editJson(2, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:03:30Z", 150, 120),                       // +30
      editJson(3, "en.wikipedia.org", "bot", "main namespace",
        "2023-11-27T19:02:00Z", 0, 999),                         // dropped
      editJson(4, "de.wikipedia.org", "human", "talk",
        "2023-11-27T19:02:00Z", 0, 999),                         // dropped
      editJson(5, "de.wikipedia.org", "HUMAN", "Main Namespace",
        "2023-11-27T19:06:00Z", 500, 400))                       // +100, win 2
    Files.write(Paths.get(in, "batch1.json"),
      String.join("\n", lines: _*).getBytes)

    val stream = WikiEditPipeline.windowedEditSize(
      EditStream.readJsonFiles(spark, in))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("wiki_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wiki_out")
        .select(col("domain"), col("edit_size"), col("n_edits"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set(("en.wikipedia.org", 80L, 2L),
        ("de.wikipedia.org", 100L, 1L)))
    } finally q.stop()
  }

  test("socket source: the full reference pipeline runs against a " +
      "live TCP feed, schema and results matching the file-backed twin") {
    initLog()
    // local ServerSocket fixture on an ephemeral loopback port; a
    // feeder thread accepts Spark's one connection and writes the
    // SAME json lines the file-backed full-pipeline spec uses
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    val lines = Seq(
      editJson(1, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:01:00Z", 100, 150),                       // +50
      editJson(2, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:03:30Z", 150, 120),                       // +30
      editJson(3, "en.wikipedia.org", "bot", "main namespace",
        "2023-11-27T19:02:00Z", 0, 999),                         // dropped
      editJson(4, "de.wikipedia.org", "human", "talk",
        "2023-11-27T19:02:00Z", 0, 999),                         // dropped
      editJson(5, "de.wikipedia.org", "HUMAN", "Main Namespace",
        "2023-11-27T19:06:00Z", 500, 400))                       // +100
    @volatile var feedErr: Throwable = null
    @volatile var conn: java.net.Socket = null
    val feeder = new Thread(() => {
      try {
        conn = server.accept()
        val w = new java.io.PrintWriter(new java.io.OutputStreamWriter(
          conn.getOutputStream, java.nio.charset.StandardCharsets.UTF_8))
        lines.foreach(w.println)
        w.flush() // keep the socket OPEN — EOF mid-query is a source stop
      } catch { case t: Throwable => feedErr = t }
    })
    feeder.setDaemon(true)
    feeder.start()
    val src = EditStream.readSocket(spark, "127.0.0.1", port)
    // schema parity: a consumer of the file-backed stream can point
    // at the socket feed without touching the pipeline
    assert(src.schema == EditStream.readJsonFiles(spark, tmp("graft_sp"))
      .schema)
    val q = WikiEditPipeline.windowedEditSize(src)
      .writeStream.outputMode("complete")
      .format("memory").queryName("socket_wiki_out").start()
    try {
      // socket delivery is asynchronous (a receiver thread buffers
      // lines) — processAllAvailable drains only what has ARRIVED, so
      // poll until the expected aggregate materializes
      val expected = Set(("en.wikipedia.org", 80L, 2L),
        ("de.wikipedia.org", 100L, 1L))
      val deadline = System.currentTimeMillis + 60000
      var got = Set.empty[(String, Long, Long)]
      while (got != expected && System.currentTimeMillis < deadline) {
        q.processAllAvailable()
        got = spark.table("socket_wiki_out")
          .select(col("domain"), col("edit_size"), col("n_edits"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        if (got != expected) Thread.sleep(200)
      }
      assert(feedErr == null, s"feeder failed: $feedErr")
      assert(got == expected, got.mkString(","))
    } finally {
      q.stop()
      if (conn != null) conn.close()
      server.close()
    }
  }

  test("kafka source: the full reference pipeline runs against a live " +
      "in-process broker through format(\"kafka\") — results match the " +
      "file-backed twin, appends land while the query runs, " +
      "maxOffsetsPerTrigger admission holds") {
    initLog()
    import org.apache.spark.sql.kafka010.FakeKafkaBroker
    // the fake provider sits at the REAL class coordinates + the real
    // ServiceLoader shortName, so this is the production path end to
    // end: isAvailable preflight → format("kafka") → option map →
    // wire-schema frames → fromKafkaShaped decode → pipeline
    assert(graft.streaming.KafkaEditSource.isAvailable)
    val topic = s"wikipedia-events-spec-${System.nanoTime()}"
    val preload = Seq(
      editJson(1, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:01:00Z", 100, 150),                       // +50
      editJson(2, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:03:30Z", 150, 120),                       // +30
      editJson(3, "en.wikipedia.org", "bot", "main namespace",
        "2023-11-27T19:02:00Z", 0, 999),                         // dropped
      editJson(4, "de.wikipedia.org", "human", "talk",
        "2023-11-27T19:02:00Z", 0, 999),                         // dropped
      editJson(5, "de.wikipedia.org", "HUMAN", "Main Namespace",
        "2023-11-27T19:06:00Z", 500, 400))                       // +100
    preload.foreach(FakeKafkaBroker.send(topic, _))
    val src = graft.streaming.KafkaEditSource(
      brokers = "fakebroker:9092", topic = topic,
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(2L))
    val events = src.loadEvents(spark)
    // schema parity: the Kafka feed is a drop-in for the file twin
    assert(events.schema ==
      EditStream.readJsonFiles(spark, tmp("graft_kafka_parity")).schema)
    val q = WikiEditPipeline.windowedEditSize(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("kafka_wiki_out").start()
    try {
      def result(): Set[(String, Long, Long)] =
        spark.table("kafka_wiki_out")
          .select(col("domain"), col("edit_size"), col("n_edits"))
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      q.processAllAvailable()
      assert(result() == Set(("en.wikipedia.org", 80L, 2L),
        ("de.wikipedia.org", 100L, 1L)))
      // admission control: 5 preloaded messages under a 2-per-trigger
      // cap need >= 3 micro-batches, none above the cap
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length >= 3, s"expected >=3 capped batches, " +
        s"got ${batches.map(_.numInputRows).mkString(",")}")
      assert(batches.forall(_.numInputRows <= 2))
      // LIVE append while the query is running (the reference is an
      // unbounded feed, llmIngestBatch's read-while-append shape)
      FakeKafkaBroker.send(topic, editJson(6, "en.wikipedia.org",
        "human", "main namespace", "2023-11-27T19:04:10Z", 120, 140)) // +20
      q.processAllAvailable()
      assert(result() == Set(("en.wikipedia.org", 100L, 3L),
        ("de.wikipedia.org", 100L, 1L)))
    } finally {
      q.stop()
      FakeKafkaBroker.deleteTopic(topic)
    }
  }

  test("watermark-alignment analog: with per-trigger admission capped " +
      "on BOTH sources, their per-batch event-time high-water marks " +
      "stay within one admission quantum; uncapped, the drift exceeds " +
      "it (the enforcement is the cap)") {
    initLog()
    // reference: DataStreamJob.java:63-64 withWatermarkAlignment —
    // Flink pauses a source that runs ahead. Spark's analog is
    // bounding every source's per-trigger intake
    // (maxFilesPerTrigger / maxOffsetsPerTrigger): aligned sources
    // then advance in lockstep. Two file sources, 3 files each,
    // 5-minute event-time stride per file; the source tag rides the
    // domain so it survives the pipeline's projection.
    val base = "2023-11-27T19:%02d:00Z"
    def mkDir(domain: String): String = {
      val d = tmp(s"graft_align_${domain.takeWhile(_ != '.')}")
      (0 until 3).foreach { k =>
        val lines = (0 until 3).map(j => editJson(k * 10 + j, domain,
          "human", "main namespace", base.format(k * 5 + j), 100, 110))
        val p = Files.write(Paths.get(d, f"b$k%02d.json"),
          lines.mkString("\n").getBytes)
        // distinct mtimes pin the admission order oldest-first (the
        // file source orders by modification time; same-ms writes tie)
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
          .fromMillis(1700000000000L + k * 60000L))
      }
      d
    }
    val d1 = mkDir("s1.wikipedia.org")
    val d2 = mkDir("s2.wikipedia.org")
    val quantumMs = 5 * 60 * 1000L // one file spans < 5 min of events
    // (batch, domain) -> event-time high-water of that source's rows
    def measure(src: org.apache.spark.sql.DataFrame)
        : Seq[Map[String, Long]] = {
      val perBatch =
        scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
      val q = WikiEditPipeline.editDeltas(src).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val hw = df.groupBy(col("domain"))
            .agg(max(col("ts")).as("hw")).collect()
            .map(r => r.getString(0) ->
              r.getAs[java.sql.Timestamp]("hw").getTime).toMap
          if (hw.nonEmpty) perBatch.synchronized { perBatch += hw }
          ()
        }
        .option("checkpointLocation", tmp("graft_align_ck")).start()
      try q.processAllAvailable() finally q.stop()
      perBatch.toSeq
    }
    // ALIGNED: both sources capped at one file per trigger
    val aligned = measure(
      EditStream.readJsonFiles(spark, d1, maxFilesPerTrigger = 1)
        .unionByName(
          EditStream.readJsonFiles(spark, d2, maxFilesPerTrigger = 1)))
    assert(aligned.length >= 3, s"cap admits 1 file/source/trigger: " +
      s"expected >=3 batches, got ${aligned.length}")
    aligned.foreach { hw =>
      assert(hw.keySet ==
        Set("s1.wikipedia.org", "s2.wikipedia.org"),
        s"both sources must land rows in every batch: $hw")
      val drift = math.abs(hw("s1.wikipedia.org") -
        hw("s2.wikipedia.org"))
      assert(drift <= quantumMs, s"aligned drift ${drift}ms exceeds " +
        s"the ${quantumMs}ms admission quantum")
    }
    // high-waters ADVANCE: the cap spreads the 3 files over triggers
    val s1hw = aligned.map(_("s1.wikipedia.org"))
    assert(s1hw == s1hw.sorted && s1hw.distinct.length >= 3, s1hw)
    // UNCAPPED control: source 2 ingests everything in its first
    // batch while source 1 admits one file — the drift the cap
    // prevents is real and measured
    val unaligned = measure(
      EditStream.readJsonFiles(spark, d1, maxFilesPerTrigger = 1)
        .unionByName(EditStream.readJsonFiles(spark, d2)))
    val worst = unaligned
      .filter(_.keySet.size == 2)
      .map(hw => math.abs(hw("s1.wikipedia.org") -
        hw("s2.wikipedia.org"))).maxOption.getOrElse(0L)
    assert(worst > quantumMs,
      s"uncapped control should drift past one quantum (got ${worst}ms)")
  }

  test("processing-time window mode: literal TumblingProcessingTimeWindows twin") {
    initLog()
    val in = tmp("graft_in_pt")
    // event timestamps DECADES apart — processing time must ignore
    // them entirely and window every row at the ingesting batch's
    // wall clock (values are wall-clock-dependent, so the spec checks
    // schema, per-batch window collapse, alignment, and conservation
    // of total mass — not window placements)
    val lines = Seq(
      editJson(1, "en.wikipedia.org", "human", "main namespace",
        "2003-01-01T00:00:00Z", 100, 150),                       // +50
      editJson(2, "en.wikipedia.org", "human", "main namespace",
        "2013-06-01T00:00:00Z", 150, 120),                       // +30
      editJson(3, "de.wikipedia.org", "HUMAN", "Main Namespace",
        "1999-12-31T23:59:00Z", 400, 500))                       // +100
    Files.write(Paths.get(in, "batch1.json"),
      String.join("\n", lines: _*).getBytes)
    val src = EditStream.readJsonFiles(spark, in)
    val pt = WikiEditPipeline.windowedEditSize(src, processingTime = true)
    // identical output schema to the event-time mode — a consumer can
    // flip the flag without touching the sink
    assert(pt.schema == WikiEditPipeline.windowedEditSize(src).schema)
    val t0 = System.currentTimeMillis()
    val q = pt.writeStream.outputMode("complete")
      .format("memory").queryName("wiki_pt_out").start()
    try {
      q.processAllAvailable()
      val t1 = System.currentTimeMillis()
      val got = spark.table("wiki_pt_out").collect()
      // one ingesting batch ⇒ exactly one wall-clock window per domain,
      // whatever the event times said
      assert(got.length == 2, got.mkString(";"))
      got.foreach { r =>
        val start = r.getAs[java.sql.Timestamp]("start").getTime
        val end = r.getAs[java.sql.Timestamp]("end").getTime
        assert(end - start == 300000L, s"window width ${end - start}")
        assert(start % 300000L == 0, s"unaligned window start $start")
        // the batch's timestamp falls inside [t0, t1] and its window
        // must bracket it
        assert(start <= t1 && end > t0, s"window [$start,$end) vs [$t0,$t1]")
      }
      // total mass conserved: the same rows pass the same filter, only
      // the window assignment differs
      assert(got.map(_.getAs[Long]("edit_size")).sum == 180L)
      assert(got.map(_.getAs[Long]("n_edits")).sum == 3L)
    } finally q.stop()
  }

  test("JSON doc sink emits one document per window (Mongo-sink analog)") {
    initLog()
    val in = tmp("graft_in2")
    Files.write(Paths.get(in, "b1.json"), editJson(1, "fr.wikipedia.org",
      "human", "main namespace", "2023-11-27T10:00:10Z", 10, 30).getBytes)
    val docs = scala.collection.mutable.ArrayBuffer.empty[String]
    val stream = WikiEditPipeline.windowedEditSize(
      EditStream.readJsonFiles(spark, in))
    val q = JsonDocSink.startForeachBatch(stream, "complete") { (b, _) =>
      docs ++= b.collect().map(_.getString(0))
    }
    try {
      q.processAllAvailable()
      assert(docs.exists(d => d.contains("\"fr.wikipedia.org\"") &&
        d.contains("\"edit_size\":20")))
    } finally q.stop()
  }

  test("streaming top-k view keeps only the k busiest domains per window") {
    initLog()
    val in = tmp("graft_topk")
    val t = "2023-11-27T12:01:00Z"
    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      editJson(1, "aa.org", "human", "main namespace", t, 0, 500),
      editJson(2, "bb.org", "human", "main namespace", t, 0, 300),
      editJson(3, "cc.org", "human", "main namespace", t, 0, 100),
      editJson(4, "dd.org", "human", "main namespace", t, 0, 50)).getBytes)
    val views = scala.collection.mutable.Map.empty[Long, Set[(String, Long)]]
    val stream = WikiEditPipeline.windowedEditSize(
      EditStream.readJsonFiles(spark, in))
    val q = WikiEditPipeline.startTopDomainsView(stream, k = 2) { (b, epoch) =>
      views(epoch) = b.select("domain", "edit_size").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    }
    try {
      q.processAllAvailable()
      val last = views(views.keys.max)
      assert(last == Set(("aa.org", 500L), ("bb.org", 300L)), views.toString)
    } finally q.stop()
  }

  test("stream-stream as-of join matches the batch answer under out-of-order arrival") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, Long)]   // (k, sec, left_id)
    val rights = MemoryStream[(Long, Long, Double)] // (k, sec, right_val)
    val leftDf = lefts.toDF().select(col("_1").as("k"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("left_id"))
    val rightDf = rights.toDF().select(col("_1").as("k"),
      timestamp_seconds(col("_2")).as("ts"), col("_3").as("right_val"))
    val q = graft.streaming.StreamAsOf.join(leftDf, rightDf, "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("asof_out").start()
    try {
      // batch 1: a right at 10 and lefts at 5 and 15
      rights.addData((1L, 10L, 1.0))
      lefts.addData((1L, 5L, 50L), (1L, 15L, 51L))
      q.processAllAvailable()
      // batch 2: an OUT-OF-ORDER right at 12 (within the 10s bound) —
      // the true latest-prior for the left at 15 — plus later data
      rights.addData((1L, 12L, 1.2), (1L, 40L, 4.0))
      lefts.addData((1L, 30L, 52L))
      q.processAllAvailable()
      // advance BOTH sides' watermarks (the global watermark is their
      // min — an idle left stream would hold every pending left back
      // forever); the sentinel left at t=1000 is never asserted on
      rights.addData((1L, 100L, 9.0))
      lefts.addData((1L, 1000L, 99L))
      q.processAllAvailable()
      rights.addData((1L, 200L, 9.9))
      lefts.addData((1L, 2000L, 98L))
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .select("left_id", "matched_t", "matched_val").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getDouble(2))))).toMap
        .removedAll(Seq(99L, 98L))
      // the batch as-of answer, hand-computed: left@5 has no prior
      // right; left@15 matches the out-of-order right@12 (NOT the
      // first-arrived right@10); left@30 still matches right@12
      assert(got == Map(
        50L -> None,
        51L -> Some((12000000L, 1.2)),
        52L -> Some((12000000L, 1.2))), got.toString)
    } finally q.stop()
  }

  test("stateful session tracker closes sessions across micro-batches") {
    initLog()
    val in = tmp("graft_sess")
    val schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    def row(u: Long, t: String, v: Double) =
      s"""{"user_id":$u,"ts":"$t","value":$v}"""
    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      row(7, "2024-01-01T00:00:00Z", 1.0),
      row(7, "2024-01-01T00:10:00Z", 2.0)).getBytes)

    val events = spark.readStream.schema(schema).json(in)
    val sessions = SessionTracker.fromEvents(spark, events)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      // second batch far in the future -> watermark passes gap -> close
      Files.write(Paths.get(in, "b2.json"),
        row(7, "2024-01-01T06:00:00Z", 9.0).getBytes)
      q.processAllAvailable()
      // one more to let the timeout fire after watermark advance
      Files.write(Paths.get(in, "b3.json"),
        row(8, "2024-01-01T12:00:00Z", 1.0).getBytes)
      q.processAllAvailable()
      val closed = spark.table("sess_out").collect()
      assert(closed.exists(r => r.getAs[Long]("user_id") == 7L &&
        r.getAs[Long]("n_events") == 2L &&
        r.getAs[Double]("session_value") == 3.0), closed.mkString(";"))
    } finally q.stop()
  }

  test("batch/stream parity: streaming the events parquet reproduces the flagship") {
    initLog()
    import graft.operators.EditAnalytics
    import graft.sources.Tables
    val batch = EditAnalytics.editSizeByWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4))).toSet
    // stream the same parquet through the same transform, mirroring
    // Tables.events' conditional normalization: a TIMESTAMP(NANOS)
    // file arrives as a long under nanosAsLong and needs the µs
    // floor; a TIMESTAMP(MICROS) file (driver testdata generations
    // vary) is already a proper timestamp
    val rawSchema = spark.read.parquet(s"$sf/events.parquet").schema
    val dir = tmp("graft_parity")
    Files.createSymbolicLink(Paths.get(dir, "events.parquet"),
      Paths.get(s"$sf/events.parquet"))
    val streamedRaw = spark.readStream.schema(rawSchema).parquet(dir)
    val streamed =
      if (rawSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        streamedRaw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else streamedRaw
    val out = EditAnalytics.editSizeByWindow(streamed)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("parity_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("parity_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("stateless pipeline ops run unchanged on a stream: chunking parity") {
    initLog()
    import graft.operators.TextAnalysis
    val docsPath = s"$sf/documents.parquet"
    val batch = TextAnalysis.chunkDocs(
      spark.read.parquet(docsPath)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val dir = tmp("graft_chunk_stream")
    Files.createSymbolicLink(Paths.get(dir, "documents.parquet"),
      Paths.get(docsPath))
    val streamed = spark.readStream
      .schema(spark.read.parquet(docsPath).schema).parquet(dir)
    val q = TextAnalysis.chunkDocs(streamed)
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_stream_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("chunk_stream_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
  }

  test("kafka-shaped binary frames decode to typed edit events") {
    initLog()
    import graft.sources.EditEvents
    val frames = Seq(
      editJson(1, "en.wikipedia.org", "human", "main namespace",
        "2023-11-27T19:01:00Z", 1, 2).getBytes("UTF-8"),
      "not json at all".getBytes("UTF-8"))
      .map(Tuple1(_))
    import spark.implicits._
    val df = frames.toDF("value")   // binary column, like the Kafka source
    val decoded = EditEvents.fromJson(df).collect()
    assert(decoded.length == 2)
    val good = decoded.find(_.getAs[String]("domain") == "en.wikipedia.org")
    assert(good.isDefined && good.get.getAs[Long]("new_length") == 2L)
    // malformed frame degrades to nulls, not a crash
    assert(decoded.exists(r => r.isNullAt(r.fieldIndex("domain"))))
  }

  test("streaming session_window closes per-user sessions by gap") {
    initLog()
    val in = tmp("graft_sw")
    def row(u: Long, t: String, v: Double) =
      s"""{"user_id":$u,"ts":"$t","value":$v}"""
    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      row(5, "2024-02-01T00:00:00Z", 1.5),
      row(5, "2024-02-01T00:10:00Z", 2.5),
      row(5, "2024-02-01T03:00:00Z", 4.0)).getBytes)
    val events = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE").json(in)
    val q = WikiEditPipeline.sessionizedValue(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sw_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("sw_out").collect()
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("session_value")))
        .toSet
      assert(rows == Set((2L, 4.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("stream-static enrichment joins the broadcast dimension") {
    initLog()
    import spark.implicits._
    val in = tmp("graft_enrich")
    Files.write(Paths.get(in, "b1.json"), editJson(1, "en.wikipedia.org",
      "human", "main namespace", "2023-11-27T10:00:00Z", 1, 2).getBytes)
    val dim = Seq(("u1", "admin"), ("uX", "newbie")).toDF("user_name", "role")
    val q = graft.streaming.StreamJoins.enrichWithStatic(
        EditStream.readJsonFiles(spark, in), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[String]("role") == "admin")
    } finally q.stop()
  }

  test("stream-stream join correlates within the time bound only") {
    initLog()
    val lIn = tmp("graft_ssl"); val rIn = tmp("graft_ssr")
    def ev(u: Long, t: String, v: Double) =
      s"""{"user_id":$u,"ts":"$t","value":$v}"""
    Files.write(Paths.get(lIn, "b1.json"), String.join("\n",
      ev(1, "2024-03-01T00:00:00Z", 1.0)).getBytes)
    Files.write(Paths.get(rIn, "b1.json"), String.join("\n",
      ev(1, "2024-03-01T00:00:30Z", 2.0),     // within 60s -> joins
      ev(1, "2024-03-01T00:05:00Z", 3.0)).getBytes)  // too late -> dropped
    val schema = "user_id LONG, ts TIMESTAMP, value DOUBLE"
    val left = spark.readStream.schema(schema).json(lIn)
    val right = spark.readStream.schema(schema).json(rIn)
    val q = graft.streaming.StreamJoins
      .streamStreamWithin(left, right, "user_id", maxLagSeconds = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ss_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Double]("r_value") == 2.0)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    initLog()
    val in = tmp("graft_dd")
    def ev(id: Long, t: String) =
      s"""{"event_id":$id,"ts":"$t","value":1.0}"""
    Files.write(Paths.get(in, "b1.json"), String.join("\n",
      ev(1, "2024-04-01T00:00:00Z"),
      ev(1, "2024-04-01T00:00:05Z"),    // redelivery -> dropped
      ev(2, "2024-04-01T00:00:10Z")).getBytes)
    val events = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, value DOUBLE").json(in)
    val q = graft.streaming.StreamDedup
      .dropDupesWithin(events, Seq("event_id"), "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_out").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dd_out").collect().map(_.getAs[Long]("event_id"))
      assert(ids.sorted.toSeq == Seq(1L, 2L), ids.mkString(","))
    } finally q.stop()
  }

  test("segment-level streaming dedup reassembles to the batch operator's md5") {
    initLog()
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // same corpus shape as the batch paragraph fixture: a licence blurb
    // in every doc, one paragraph shared between docs 0 and 2
    val corpus = Seq(
      (0L, "licensed under cc\nalpha body\nshared para"),
      (1L, "licensed under cc\nbeta body"),
      (2L, "licensed under cc\nshared para"),
      (3L, "free text only"))
    val mem = MemoryStream[(Long, String)]
    // epoch 0 would sit AT the query's initial watermark and be dropped
    // as late — anchor the fixture in real time
    val docs = mem.toDF.toDF("doc_id", "text")
      .withColumn("ts", timestamp_seconds(col("doc_id") + 1700000000L))
    val q = graft.streaming.StreamDedup
      .dropSegmentDupesWithin(docs, "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("segdd_out").start()
    try {
      // in-order arrival, one doc per micro-batch -> first arrival IS
      // the batch argmin's (doc_id, seg_idx) winner
      corpus.foreach { d => mem.addData(d); q.processAllAvailable() }
      val streamed = spark.table("segdd_out")
        .groupBy(col("doc_id"))
        .agg(md5(array_join(array_sort(collect_list(
          struct(col("seg_idx"), col("seg")))).getField("seg"), "\n"))
          .as("stream_md5"))
      val batch = graft.operators.Segments
        .segmentDedupFrames(
          graft.operators.Segments.paragraphs(corpus.toDF("doc_id", "text")),
          sep = "\n")
        .filter(col("n_kept") > 0) // fully-deduped docs emit no stream rows
      val joined = batch.join(streamed, "doc_id")
      // doc 2 dedups away entirely -> 3 docs with kept segments
      assert(joined.count() == 3)
      assert(joined.filter(col("stream_md5") =!= col("dedup_md5")).isEmpty)
    } finally q.stop()
  }

  test("synthetic rate source produces schema-complete edit events") {
    initLog()
    val df = EditStream.synthetic(spark, rowsPerSecond = 10)
    assert(df.isStreaming)
    assert(Seq("domain", "namespace", "user_type", "old_length",
      "new_length", "ts").forall(df.columns.contains))
  }

  test("incremental snapshot diff: per-epoch parity, state convergence, composition") {
    initLog()
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val stateTable = "graft_incdiff_state_spec"
    spark.sql(s"DROP TABLE IF EXISTS $stateTable")
    val diffDir = tmp("graft_incdiff")
    val q = graft.streaming.IncrementalDiff.start(
      mem.toDF().toDF("k", "v"), "k", stateTable, diffDir,
      tmp("graft_incdiff_ck"), buckets = 4)
    // three full snapshots, one per micro-batch; no value reverts
    val s0 = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
    val s1 = Seq((1L, 1.0), (2L, 2.5), (4L, 4.0), (5L, 5.0)) // ~2, -3, +5
    val s2 = Seq((1L, 1.0), (2L, 2.5), (4L, 4.5), (6L, 6.0)) // ~4, -5, +6
    try {
      Seq(s0, s1, s2).foreach { s =>
        mem.addData(s: _*); q.processAllAvailable()
      }
    } finally q.stop()
    def snap(s: Seq[(Long, Double)]) = s.toDF("k", "v")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byEpoch = (0 to 2).map(e =>
      e -> asMap(spark.read.parquet(s"$diffDir/epoch=$e"))).toMap
    // epoch 0: everything added; epochs 1..2: parity with the batch diff
    assert(byEpoch(0) == s0.map(_._1 -> "added").toMap)
    assert(byEpoch(1) ==
      asMap(graft.operators.BatchQueries.diffSnapshots(snap(s0), snap(s1), "k")))
    assert(byEpoch(2) ==
      asMap(graft.operators.BatchQueries.diffSnapshots(snap(s1), snap(s2), "k")))
    // the maintained state converged to the last snapshot
    assert(spark.table(stateTable).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet == s2.toSet)
    // epoch diffs COMPOSE to the one-shot batch diff s0 -> s2: chain
    // each key's statuses chronologically (valid while values don't
    // revert, as here)
    val chains = (1 to 2).flatMap(e => byEpoch(e).toSeq.map {
      case (k, st) => (k, e, st)
    }).groupBy(_._1).map { case (k, sts) =>
      k -> sts.sortBy(_._2).map(_._3)
    }
    val composed = chains.flatMap { case (k, sts) =>
      (sts.head == "added", sts.last == "removed") match {
        case (true, true) => None // added then removed: no net effect
        case (true, false) => Some(k -> "added")
        case (false, true) => Some(k -> "removed")
        case (false, false) => Some(k -> "changed")
      }
    }.toMap
    assert(composed ==
      asMap(graft.operators.BatchQueries.diffSnapshots(snap(s0), snap(s2), "k")))
  }

  test("streaming novelty gate: corpus dups tagged, re-deliveries dropped, batch parity") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, md5, timestamp_seconds}
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpusHashes = corpus.select(md5(col("text")).as("text_hash"))
    val in = MemoryStream[(Long, Long, String)] // (sec, doc_id, text)
    val stream = in.toDF().select(timestamp_seconds(col("_1")).as("ts"),
      col("_2").as("doc_id"), col("_3").as("text"))
    val q = graft.streaming.StreamNovelty
      .novelOnly(stream, corpusHashes, "ts", "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("novel_out").start()
    try {
      in.addData(
        (10L, 100L, "alpha beta gamma"),   // exact corpus dup: gated
        (11L, 101L, "fresh document one"), // novel
        (12L, 102L, "fresh document one"), // within-stream re-delivery
        (13L, 103L, "fresh document two")) // novel
      q.processAllAvailable()
      val got = spark.table("novel_out").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(101L, 103L))
    } finally q.stop()
    // tagged() parity with the batch operator's exact lane
    val delta = Seq((100L, "alpha beta gamma"), (101L, "fresh document one"))
      .toDF("doc_id", "text")
    val streamStatus = graft.streaming.StreamNovelty
      .tagged(delta, corpusHashes)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("status")).toMap
    val batchStatus = graft.operators.Governance
      .incrementalDedup(corpus, delta)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamStatus(100L) == "exact_dup" && batchStatus(100L) == "exact_dup")
    assert(streamStatus(101L) == "novel" && batchStatus(101L) == "novel")
  }

  test("streaming SEMANTIC novelty gate: near-dups gated, novel vectors " +
      "pass, parity with semanticProbeDelta") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // persisted index over two tight groups on distinct axes
    def jig(base: Array[Float], i: Int): Seq[Float] = {
      val v = base.clone(); v(3) = v(3) + 0.001f * i; v.toSeq
    }
    val ex = Array(1f, 0f, 0f, 0f)
    val ey = Array(0f, 1f, 0f, 0f)
    val corpus = (Seq.tabulate(4)(i => (10L + i, jig(ex, i))) ++
      Seq.tabulate(4)(i => (20L + i, jig(ey, i))))
      .toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_semgate").toString
    graft.operators.Similarity.writeIvfIndex(corpus, dir, nlist = 2)
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.StreamNovelty
      .semanticNovelOnly(stream, dir, tau = 0.9)
      .writeStream.outputMode("append").format("memory")
      .queryName("sem_novel_out").start()
    try {
      in.addData(
        (100L, jig(ex, 1)),            // exact corpus copy: gated
        (101L, Seq(0f, 0f, 1f, 0f)),   // new direction: passes
        (102L, jig(ey, 0)))            // exact corpus copy: gated
      q.processAllAvailable()
      val got = spark.table("sem_novel_out").select("vec_id").collect()
        .map(_.getLong(0)).toSet
      assert(got == Set(101L), got.mkString(","))
      // survivors carry the INPUT schema — no internal list/norm
      // columns (a caller unions them with raw stream rows)
      assert(spark.table("sem_novel_out").columns.toSeq ==
        stream.columns.toSeq)
    } finally q.stop()
    // parity: the same delta through the BATCH probe (the 100 TB
    // foreachBatch form) produces the same classification
    val delta = Seq((100L, jig(ex, 1)), (101L, Seq(0f, 0f, 1f, 0f)),
      (102L, jig(ey, 0))).toDF("vec_id", "embedding")
    val batch = graft.operators.Similarity
      .semanticProbeDelta(delta, dir, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(batch == Map(100L -> "semantic_dup", 101L -> "novel",
      102L -> "semantic_dup"), batch)
    // and the semi-join complement sees exactly the gated pair
    val dupDf = graft.streaming.StreamNovelty
      .semanticDuplicates(delta, dir, tau = 0.9)
    assert(dupDf.columns.toSeq == delta.columns.toSeq)
    val dups = dupDf.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(dups == Set(100L, 102L), dups.mkString(","))
    // an input that already carries a `list` column must come back
    // with ITS values — the gate's internal assignment column may not
    // shadow (and then drop) a user column of the same name
    val withList = delta.withColumn("list", col("vec_id") * 7L)
    val kept = graft.streaming.StreamNovelty
      .semanticNovelOnly(withList, dir, tau = 0.9)
    assert(kept.columns.toSeq == withList.columns.toSeq)
    val keptRows = kept.select("vec_id", "list").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keptRows == Map(101L -> 707L), keptRows)
  }

  test("semantic ingest loop: novel vectors append to the index, " +
      "re-deliveries gate on the next batch") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def jig(base: Array[Float], i: Int): Seq[Float] = {
      val v = base.clone(); v(3) = v(3) + 0.001f * i; v.toSeq
    }
    val ex = Array(1f, 0f, 0f, 0f)
    val ey = Array(0f, 1f, 0f, 0f)
    val corpus = (Seq.tabulate(4)(i => (10L + i, jig(ex, i))) ++
      Seq.tabulate(4)(i => (20L + i, jig(ey, i))))
      .toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft_semingest")
    val dir = base.resolve("idx").toString
    graft.operators.Similarity.writeIvfIndex(corpus, dir, nlist = 2)
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.StreamNovelty.startSemanticIngest(
      stream, dir, base.resolve("ckpt").toString, tau = 0.9)
    try {
      // batch 1: one corpus dup (not appended), one novel (appended)
      in.addData((100L, jig(ex, 1)), (101L, Seq(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      val ids1 = spark.read.parquet(s"$dir/corpus")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(ids1.contains(101L), s"novel not appended: $ids1")
      assert(!ids1.contains(100L), s"dup appended: $ids1")
      // batch 2: re-delivery of the ingested vector + a fresh one
      in.addData((200L, Seq(0f, 0f, 1f, 0f)), (201L, Seq(0f, 0f, 0f, 1f)))
      q.processAllAvailable()
      val ids2 = spark.read.parquet(s"$dir/corpus")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(!ids2.contains(200L), s"re-delivery re-ingested: $ids2")
      assert(ids2.contains(201L), s"fresh vector lost: $ids2")
    } finally q.stop()
  }

  test("semantic ingest retrain cadence: every N epochs the IVF index " +
      "re-trains (lists re-bucket, append fragments merge)") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq.tabulate(8)(i =>
        ((10 + i).toLong, Seq.tabulate(4)(d =>
          if (d == i % 2) 1f else 0.001f * i)))
      .toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft_semretrain")
    val dir = base.resolve("idx").toString
    graft.operators.Similarity.writeIvfIndex(corpus, dir, nlist = 2)
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.StreamNovelty.startSemanticIngest(
      stream, dir, base.resolve("ckpt").toString, tau = 0.9,
      retrainEvery = 2)
    def listFiles = new java.io.File(s"$dir/corpus").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("list="))
      .map(_.listFiles.count(_.getName.endsWith(".parquet")))
    try {
      // epoch 0: novel vector appends — its list dir now holds the
      // original file plus the appended fragment
      in.addData((100L, Seq(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      assert(listFiles.exists(_ > 1), "append did not fragment a list")
      // epoch 1: cadence fires — retrain merges every list to one file
      in.addData((101L, Seq(0f, 0f, 0f, 1f)))
      q.processAllAvailable()
      assert(listFiles.forall(_ == 1),
        s"retrain did not merge fragments: ${listFiles.toSeq}")
      val ids = spark.read.parquet(s"$dir/corpus")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(100L) && ids.contains(101L), ids.toString)
      // the retrained index still probes the ingested vector exactly
      val probe = graft.operators.Similarity.ivfIndexProbe(spark, dir,
        Seq(0.0, 0.0, 1.0, 0.0), k = 1).collect()
      assert(probe.head.getLong(0) == 100L &&
        probe.head.getDouble(1) == 1.0, probe.toSeq)
    } finally q.stop()
  }

  test("hnsw ingest loop: appends are replay-idempotent by id and the " +
      "compaction cadence merges adjacency fragments") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(16)(d =>
        (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft_hnswingest")
    val dir = base.resolve("idx").toString
    graft.operators.Hnsw.writeHnswIndex(corpus, dir, dims0 = 16)
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.IndexIngest.startHnswIngest(
      stream, dir, base.resolve("ckpt").toString, compactEvery = 2,
      dims0 = 16)
    val twin = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0)
    try {
      // epoch 0: two new vectors (one a twin of node 3); 1001 arrives
      // TWICE IN THE SAME BATCH — the catalog anti-join alone cannot
      // see it (r14 ADVICE), the within-batch dedup must
      in.addData((1000L, twin), (1001L, twin.map(v => -v)),
        (1001L, twin.map(v => -v)))
      q.processAllAvailable()
      val n1 = spark.read.parquet(s"$dir/nodes")
        .filter(col("layer") === 0).select("vec_id")
        .collect().map(_.getLong(0))
      assert(n1.count(_ == 1000L) == 1 && n1.count(_ == 1001L) == 1,
        "same-batch duplicate id inserted twin nodes")
      // epoch 1: REPLAY of 1000 plus a fresh id — no duplicate node,
      // fresh appended; the cadence fires and compacts
      in.addData((1000L, twin), (1002L, twin.map(v => v * 2f)))
      q.processAllAvailable()
      val n2 = spark.read.parquet(s"$dir/nodes")
        .filter(col("layer") === 0).select("vec_id")
        .collect().map(_.getLong(0))
      assert(n2.count(_ == 1000L) == 1, "replayed id duplicated a node")
      assert(n2.count(_ == 1002L) == 1, "fresh id lost")
      val files0 = new java.io.File(s"$dir/adj/layer=0")
        .listFiles.count(_.getName.endsWith(".parquet"))
      assert(files0 == 1, s"cadence did not compact (layer0=$files0)")
      // the ingested twin is findable at cos 1.0
      val got = graft.operators.Hnsw.hnswIndexProbe(spark, dir,
          twin.map(_.toDouble), k = 2, excludeId = Some(3L))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.exists(p => p._1 == 1000L && p._2 == 1.0), got.toSeq)
    } finally q.stop()
  }

  test("ivfpq ingest loop: appends are replay-idempotent by id and " +
      "the compaction cadence merges code fragments") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(16)(d =>
        (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat))
    }.toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft_ivfpqingest")
    val dir = base.resolve("idx").toString
    graft.operators.Similarity.writeIvfPqIndex(corpus, dir, nlist = 8,
      m = 8, ksub = 16, dims0 = 16)
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    val q = graft.streaming.IndexIngest.startIvfPqIngest(
      stream, dir, base.resolve("ckpt").toString, compactEvery = 2,
      dims0 = 16)
    val twin = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0)
    try {
      // epoch 0: two new vectors (one a twin of vec 3); 1001 arrives
      // TWICE IN THE SAME BATCH — must append ONE code row (r14
      // ADVICE: the catalog anti-join only sees persisted ids)
      in.addData((1000L, twin), (1001L, twin.map(v => -v)),
        (1001L, twin.map(v => -v)))
      q.processAllAvailable()
      val c1 = spark.read.parquet(s"$dir/codes").select("vec_id")
        .collect().map(_.getLong(0))
      assert(c1.count(_ == 1000L) == 1 && c1.count(_ == 1001L) == 1,
        "same-batch duplicate id appended duplicate code rows")
      // epoch 1: REPLAY of 1000 plus a fresh id — no duplicate code
      // row, fresh appended; the cadence fires and compacts
      in.addData((1000L, twin), (1002L, twin.map(v => v * 2f)))
      q.processAllAvailable()
      val c2 = spark.read.parquet(s"$dir/codes").select("vec_id")
        .collect().map(_.getLong(0))
      assert(c2.count(_ == 1000L) == 1, "replayed id duplicated codes")
      assert(c2.count(_ == 1002L) == 1, "fresh id lost")
      val listDirs = new java.io.File(s"$dir/codes").listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("list="))
      assert(listDirs.nonEmpty && listDirs.forall(
          _.listFiles.count(_.getName.endsWith(".parquet")) == 1),
        "cadence did not compact the code fragments")
      // the ingested twin is findable at cos 1.0 under exact refine
      val raw = corpus.unionByName(
        Seq((1000L, twin.toSeq), (1001L, twin.map(v => -v).toSeq),
          (1002L, twin.map(v => v * 2f).toSeq))
          .toDF("vec_id", "embedding"))
      val got = graft.operators.Similarity.ivfPqIndexProbe(spark, dir,
          twin.map(_.toDouble), k = 3, nprobe = 4, rerank = 20,
          refineFrom = Some(raw), excludeId = Some(3L))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.exists(p => p._1 == 1000L && p._2 == 1.0), got.toSeq)
    } finally q.stop()
  }

  test("llm ingest chain e2e: quality -> exact novelty -> segment " +
      "novelty -> hnsw ingest on ONE stream; batch parity with a " +
      "driver-side replica and whole-chain replay idempotence") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def emb(i: Long): Seq[Float] = Seq.tabulate(16)(d =>
      (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat)
    // corpus docs: 20 unique words each -> 2 segments at window=10
    def words(tag: String, a: Int, b: Int): String =
      (a until b).map(j => s"$tag$j").mkString(" ")
    val corpusTexts = (0 until 10).map(i => i.toLong -> words(s"c$i-", 0, 20))
    val corpus = corpusTexts
      .map { case (i, t) => (i, t, emb(i)) }
      .toDF("doc_id", "text", "embedding")
    val base = Files.createTempDirectory("graft_llm_ingest")
    val idx = base.resolve("idx").toString
    val st = base.resolve("state").toString
    graft.operators.Hnsw.writeHnswIndex(
      corpus.select(col("doc_id").as("vec_id"), col("embedding")),
      idx, dims0 = 16)
    graft.streaming.IngestPipeline.initCatalogs(corpus, st, window = 10)
    val rules = Seq(
      "min_words" -> (size(split(col("text"), " ")) >= 10))
    val in = MemoryStream[(Long, String, Seq[Float])]
    val stream = in.toDF().select(col("_1").as("doc_id"),
      col("_2").as("text"), col("_3").as("embedding"))
    val q = graft.streaming.IngestPipeline.startLlmIngest(stream, st,
      idx, base.resolve("ckpt").toString, rules, window = 10,
      compactEvery = 2, dims0 = 16)
    val batch0 = Seq(
      (100L, words("n100-", 0, 20), emb(100)), // novel -> ingests
      (101L, corpusTexts(3)._2, emb(101)),     // exact corpus dup
      (102L, "too short", emb(102)),           // quality drop
      (103L, words("n103-", 0, 20), emb(103)), // within-batch twin A
      (104L, words("n103-", 0, 20), emb(104))) // twin B (higher id) drops
    // recombined doc: both segments already known (corpus 1 seg0 +
    // corpus 2 seg1) -> exact hash NOVEL but segment stage drops it
    val recombined = words("c1-", 0, 10) + " " + words("c2-", 10, 20)
    // half-novel: one known segment + one novel -> survives
    val halfNovel = words("c1-", 0, 10) + " " + words("n106-", 10, 20)
    val batch1 = Seq(
      (105L, recombined, emb(105)),
      (106L, halfNovel, emb(106)),
      (100L, words("n100-", 0, 20), emb(100))) // re-delivery drops
    try {
      in.addData(batch0: _*)
      q.processAllAvailable()
      in.addData(batch1: _*)
      q.processAllAvailable()
      def nodeIds() = spark.read.parquet(s"$idx/nodes")
        .filter(col("layer") === 0).select("vec_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      def docCatalog() = spark.read.parquet(s"$st/doc_catalog")
        .select("text_hash").collect().map(_.getString(0)).toSeq.sorted
      def segCatalogN() = spark.read.parquet(s"$st/seg_catalog").count()
      // batch parity: a driver-side replica of the whole chain over
      // the same arrival order
      def md5hex(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val seenHash = collection.mutable.Set(
        corpusTexts.map(t => md5hex(t._2)): _*)
      val seenSeg = collection.mutable.Set(corpusTexts.flatMap(t =>
        t._2.split(" ").grouped(10).map(g => md5hex(g.mkString(" ")))): _*)
      val expectIngested = collection.mutable.Buffer[Long]()
      Seq(batch0, batch1).foreach { b =>
        val inBatchHash = collection.mutable.Set[String]()
        val inBatchSeg = collection.mutable.Set[String]()
        b.foreach { case (id, text, _) =>
          val h = md5hex(text)
          if (text.split(" ").count(_.nonEmpty) >= 10 &&
              !seenHash(h) && !inBatchHash(h)) {
            inBatchHash += h
            val segHashes = text.split(" ").grouped(10)
              .map(g => md5hex(g.mkString(" "))).toSeq
            val fresh = segHashes.filterNot(s =>
              seenSeg(s) || inBatchSeg(s))
            if (fresh.nonEmpty) {
              expectIngested += id
              inBatchSeg ++= fresh
              seenSeg ++= fresh
            }
            // fully-adjudicated docs are catalogued whether or not
            // they survived segment novelty: a recombined duplicate's
            // future arrivals short-circuit at the exact gate
            seenHash += h
          }
        }
      }
      assert(expectIngested.toSeq == Seq(100L, 103L, 106L))
      val expectedNodes = ((0L until 10L) ++ expectIngested).sorted
      assert(nodeIds() == expectedNodes,
        s"index nodes ${nodeIds()} != expected $expectedNodes")
      // seenHash now includes the recombined duplicate (105) even
      // though it never reached the index
      assert(docCatalog() == seenHash.toSeq.sorted)
      assert(seenHash(md5hex(recombined)),
        "segment-dropped doc missing from the doc catalog")
      // the ingested novel doc is findable at cos 1.0
      val got = graft.operators.Hnsw.hnswIndexProbe(spark, idx,
          emb(106).map(_.toDouble), k = 1)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.head == ((106L, 1.0)), got.toSeq)
      // WHOLE-CHAIN replay: re-run epoch 0's batch body directly (the
      // committed-epoch re-delivery case) — nothing may change
      val nodesBefore = nodeIds()
      val docsBefore = docCatalog()
      val segsBefore = segCatalogN()
      graft.streaming.IngestPipeline.llmIngestBatch(
        batch0.toDF("doc_id", "text", "embedding"), 0L, st, idx,
        rules, window = 10, dims0 = 16)
      assert(nodeIds() == nodesBefore, "replay changed index nodes")
      assert(docCatalog() == docsBefore, "replay changed doc catalog")
      assert(segCatalogN() == segsBefore, "replay changed seg catalog")
    } finally q.stop()
  }

  test("llm ingest: neither catalog-append frame's plan scans the " +
      "directory it is appended to (listing-vs-commit object-store " +
      "races engineered out by the pinned snapshots)") {
    initLog()
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val corpus = (0 until 5)
      .map(i => (i.toLong, (0 until 20).map(j => s"c$i-$j").mkString(" "),
        Seq.fill(16)(0.1f)))
      .toDF("doc_id", "text", "embedding")
    val st = Files.createTempDirectory("graft_llm_planspec").toString
    graft.streaming.IngestPipeline.initCatalogs(corpus, st, window = 10)
    val batch = Seq((100L,
      (0 until 20).map(j => s"n-$j").mkString(" "),
      Seq.fill(16)(0.2f))).toDF("doc_id", "text", "embedding")
    val rules = Seq(
      "min_words" -> (size(split(col("text"), " ")) >= 10))
    val (_, segAppend, docAppend) = graft.streaming.IngestPipeline
      .planBatch(batch, 0L, st, rules, window = 10)
    def scansOf(df: org.apache.spark.sql.DataFrame, sub: String) = {
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        p +: (p.children ++ p.subqueries).flatMap(all)
      all(df.queryExecution.executedPlan).collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths
              .exists(_.toString.contains(sub)) => f
      }
    }
    assert(scansOf(segAppend, "seg_catalog").isEmpty,
      "seg append frame lists seg_catalog — read-while-append")
    assert(scansOf(docAppend, "doc_catalog").isEmpty,
      "doc append frame lists doc_catalog — read-while-append")
    // the frames still do their job: the novel doc's hash appends,
    // the catalog state rides the pinned snapshot
    assert(docAppend.count() == 1L && segAppend.count() == 2L)
  }

  test("ivfpq ingest under load: FILTERED probe recall holds the 0.8 " +
      "floor after every epoch, across the compaction epoch, on the " +
      "maintained composite index") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def vec(i: Long): Seq[Float] = Seq.tabulate(16)(d =>
      (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat)
    val corpus = (0 until 200).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val base = Files.createTempDirectory("graft_ivfpq_load")
    val dir = base.resolve("idx").toString
    graft.operators.Similarity.writeIvfPqIndex(corpus, dir, nlist = 8,
      m = 8, ksub = 16, dims0 = 16)
    val in = MemoryStream[(Long, Seq[Float])]
    val stream = in.toDF()
      .select(col("_1").as("vec_id"), col("_2").as("embedding"))
    // compactEvery=2: epoch 1 rewrites the codes mid-test
    val q = graft.streaming.IndexIngest.startIvfPqIngest(
      stream, dir, base.resolve("ckpt").toString, compactEvery = 2,
      dims0 = 16)
    val pred = col("vec_id") % 2 === 0 // 50% selectivity, both sides
    def recallAt(raw: org.apache.spark.sql.DataFrame,
        queryIds: Seq[Long]): Double = {
      val hits = queryIds.map { qid =>
        val v = raw.filter(col("vec_id") === qid)
          .select(col("embedding").cast("array<double>"))
          .head().getSeq[Double](0)
        val qc = typedLit(v)
        val exact = raw.filter(pred && col("vec_id") =!= qid)
          .select(col("vec_id"),
            graft.functions.Vectors.cosine(
              col("embedding").cast("array<double>"), qc).as("c"))
          .orderBy(col("c").desc, col("vec_id")).limit(10)
          .collect().map(_.getLong(0)).toSet
        val got = graft.operators.Similarity.ivfPqIndexProbe(spark, dir,
            v, k = 10, nprobe = 6, rerank = 50,
            refineFrom = Some(raw), excludeId = Some(qid), pred = pred)
          .collect().map(_.getLong(0)).toSet
        (exact & got).size.toDouble / exact.size
      }
      hits.sum / hits.size
    }
    try {
      var raw = corpus
      val recalls = collection.mutable.Buffer[Double]()
      for (epoch <- 0 until 3) {
        val batch = (0 until 40).map { j =>
          val id = 1000L + epoch * 40 + j
          (id, vec(id))
        }
        in.addData(batch: _*)
        q.processAllAvailable()
        raw = raw.unionByName(batch.toDF("vec_id", "embedding"))
        val queryIds = Seq(0L, 1L, 2L, 1000L + epoch * 40,
          1001L + epoch * 40)
        recalls += recallAt(raw, queryIds)
      }
      // epoch 1 ran compaction (fresh single-file generation); epochs
      // 0/2 probe append-fragmented state — the floor holds everywhere
      recalls.zipWithIndex.foreach { case (r, ep) =>
        assert(r >= 0.8, s"epoch $ep filtered recall $r < 0.8 " +
          s"(all: ${recalls.toSeq})")
      }
      // compaction actually happened (one file per list dir)
      val listDirs = new java.io.File(s"$dir/codes").listFiles
        .filter(f => f.isDirectory && f.getName.startsWith("list="))
      assert(listDirs.nonEmpty)
    } finally q.stop()
  }

  test("streaming dq gate: violations quarantined, per-batch observe metrics, batch parity") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rules = Seq(
      "qty_range" -> col("qty").between(1, 100),
      "flag_known" -> col("flag").isin("a", "b"))
    val in = MemoryStream[(Long, Long, String)] // (id, qty, flag)
    val stream = in.toDF().select(col("_1").as("id"),
      col("_2").as("qty"), col("_3").as("flag"))
    @volatile var observed: Map[String, Long] = Map.empty
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val m = e.progress.observedMetrics.get("dq")
        if (m != null) observed = Map(
          "rows_total" -> m.getAs[Long]("rows_total"),
          "qty_range" -> m.getAs[Long]("qty_range_violations"),
          "flag_known" -> m.getAs[Long]("flag_known_violations"))
      }
    }
    spark.streams.addListener(listener)
    val q = graft.streaming.StreamQuality.gate(stream, rules)
      .writeStream.outputMode("append").format("memory")
      .queryName("dq_clean").start()
    try {
      in.addData((1L, 5L, "a"), (2L, 500L, "a"), (3L, 5L, "zz"),
        (4L, -1L, "c"), (5L, 99L, "b"))
      q.processAllAvailable()
      // the clean lane carries exactly the rows every rule passed
      val clean = spark.table("dq_clean").select("id").collect()
        .map(_.getLong(0)).toSet
      assert(clean == Set(1L, 5L))
      // listener delivery is async wrt processAllAvailable
      var waited = 0
      while (observed.isEmpty && waited < 100) { Thread.sleep(100); waited += 1 }
      assert(observed == Map(
        "rows_total" -> 5L, "qty_range" -> 2L, "flag_known" -> 2L), observed)
    } finally { q.stop(); spark.streams.removeListener(listener) }
    // annotated() on a static frame agrees with the batch expectations op
    val df = Seq((1L, 5L, "a"), (2L, 500L, "a"), (3L, 5L, "zz"))
      .toDF("id", "qty", "flag")
    val ann = graft.streaming.StreamQuality.annotated(df, rules)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("dq_failed")).toMap
    assert(ann == Map(1L -> "", 2L -> "qty_range", 3L -> "flag_known"))
    val batch = graft.operators.QualityChecks.expectations(df, rules)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(batch == Map("qty_range" -> 1L, "flag_known" -> 1L))
  }

  test("stream decay: state equals batch recomputation, late data folds in") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamDecay
    val hl = 1000000L // 1s half-life for test readability
    val in = MemoryStream[(String, Long, Long)] // (type, t_us, cents)
    val q = StreamDecay.decayedCounters(
        in.toDS().map(t => StreamDecay.Ev(t._1, t._2, t._3)), hl)
      .writeStream.outputMode("update").format("memory")
      .queryName("decay_out").start()
    val rows = Seq(
      ("click", 0L, 100L), ("click", 2500000L, 200L),
      ("view", 500000L, 400L),
      ("click", 1200000L, 300L)) // arrives LATE, after anchor advanced
    try {
      in.addData(rows(0), rows(1), rows(2))
      q.processAllAvailable()
      in.addData(rows(3))
      q.processAllAvailable()
      val got = spark.table("decay_out")
        .groupBy(col("event_type"))
        .agg(org.apache.spark.sql.functions.max(
          struct(col("anchor_period"), col("decayed_sum"), col("n_events")))
          .as("m"))
        .collect().map(r => r.getString(0) -> r.getStruct(1)).toMap
      val expect = StreamDecay.batchReference(
        rows.map(t => StreamDecay.Ev(t._1, t._2, t._3)), hl)
      expect.foreach { case (k, e) =>
        val g = got(k)
        assert(g.getLong(0) == e.anchor_period, s"$k anchor")
        assert(math.abs(g.getDouble(1) - e.decayed_sum) < 1e-9, s"$k sum")
        assert(g.getLong(2) == e.n_events, s"$k n")
      }
      // hand value: clicks at p=0 (100c), p=2 (anchor, 200c), late
      // p=1 (300c) -> 200 + 300/2 + 100/4 = 375c = 3.75
      assert(math.abs(got("click").getDouble(1) - 3.75) < 1e-9)
    } finally q.stop()
  }

  test("stream attribution: credits last touch, lookback, equal-ts order") {
    initLog()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamAttribution
    import graft.streaming.StreamAttribution.Ev
    val lb = 1000000L // 1s lookback
    val in = MemoryStream[Ev]
    val q = StreamAttribution.attribute(in.toDS(), lb)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").start()
    try {
      in.addData(
        Ev(1L, 100L, 1L, "click", 0.0),
        Ev(1L, 200L, 2L, "purchase", 10.0),   // -> click
        Ev(1L, 300L, 3L, "view", 0.0),
        Ev(1L, 300L, 4L, "purchase", 20.0),   // equal ts: view first -> view
        Ev(2L, 500L, 5L, "purchase", 5.0))    // no touch ever -> (none)
      q.processAllAvailable()
      // state persists across batches; a purchase far beyond lookback
      // of the stored touch -> (none)
      in.addData(Ev(1L, 5000000L, 6L, "purchase", 7.0))
      q.processAllAvailable()
      val got = spark.table("attr_out").collect()
        .map(r => r.getAs[Long]("purchase_id") ->
          r.getAs[String]("touch_type")).toMap
      assert(got == Map(2L -> "click", 4L -> "view",
        5L -> "(none)", 6L -> "(none)"))
    } finally q.stop()
  }
}
