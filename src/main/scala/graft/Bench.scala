package graft
object Bench {

  /** Structured-Streaming throughput of the reference pipeline's twin:
    * rate source → editDeltas filter/project → 5-min event-time window
    * agg (update mode) → DocStoreSink chunked/retried writes against
    * DirDocStore. The rate source over-provisions (3 M rows/s) so
    * micro-batches backlog and the measured figure is PIPELINE
    * capacity, not source cadence. Returns rows/sec from the
    * per-trigger progress (first trigger dropped — it absorbs stream
    * start + state-store init).
    */
  private def streamBench(spark: org.apache.spark.sql.SparkSession,
      seconds: Int = 12): Double = {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-bench")
    val edits = spark.readStream.format("rate")
      .option("rowsPerSecond", 3000000L).option("numPartitions", 8).load()
      .select(col("timestamp").as("ts"),
        when(pmod(col("value"), lit(10)) < 8, "human")
          .otherwise("bot").as("user_type"),
        when(pmod(col("value"), lit(5)) < 4, "Main Namespace")
          .otherwise("Talk").as("namespace"),
        concat(lit("d"), pmod(col("value"), lit(100))).as("domain"),
        (pmod(col("value"), lit(1000)) * 7).as("new_length"),
        (pmod(col("value"), lit(900)) * 5).as("old_length"))
    val out = graft.streaming.WikiEditPipeline.windowedEditSize(edits)
    val q = graft.streaming.DocStoreSink.start(out,
      graft.streaming.DocStoreSink.DirDocStore(tmp.resolve("docs").toString),
      tmp.resolve("ckpt").toString, flushInterval = "1 second",
      outputMode = "update")
    try {
      Thread.sleep(seconds * 1000L)
      val p = q.recentProgress.drop(1)
      val rows = p.map(_.numInputRows).sum
      // a progress entry may lack triggerExecution — don't NPE into
      // the caller's blanket catch (which would read as stream failure)
      val ms = p.map(pr => Option(pr.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)).sum
      if (ms <= 0) 0.0 else rows * 1000.0 / ms
    } finally {
      try q.stop() catch { case _: Throwable => () }
      deleteRecursively(tmp.toFile)
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    try f.delete() catch { case _: Throwable => () }
  }

  /** The driver captures only the LAST ~2000 chars of sbt stdout; the
    * full per-query map at 80+ queries overflows that and truncates
    * the JSON head (r3-r5 artifacts arrived unparseable). So stdout
    * carries a bounded HEADLINE subset — every LLM-pipeline family
    * plus representative batch queries — while the complete 4-decimal
    * map goes to bench_full.json (committed per round, the
    * round-over-round comparison artifact).
    */
  private val headlinePrefixes = Seq("ann_", "dedup_", "curate_",
    "decontaminate", "embed_", "mm_", "sample_", "text_", "seq_",
    "profile_", "idx_", "graph_", "dq_")
  private val headlineBatch = Set("q_edit_window", "q_filter_project",
    "q1_pricing_agg", "q_multijoin", "q_topn_join", "q_exists_sql",
    "q_snapshot_diff", "q_asof_join", "q_range_join", "q_window_running")
  private def isHeadline(name: String): Boolean =
    headlineBatch(name) || headlinePrefixes.exists(name.startsWith)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus, "graft-bench")
    // ERROR, not WARN: the driver parses the LAST stdout line as JSON,
    // and benign per-task WARNs (e.g. WindowExec on the bins-bounded
    // skyline window) flooded the r7 tail into `parsed: null`. Real
    // failures still surface — the bench itself prints FAILED lines
    // and carries the penalty term.
    spark.sparkContext.setLogLevel("ERROR")
    // loadavg at bench START, recorded in the header: in-suite times on
    // a contended host run 10-40x the isolated cost (SURVEY §4.5), so
    // round-over-round diffs need the contention context to be readable
    // without manual adjudication. > ~2 on this box means "suspect".
    val loadavg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Force FULL computation of every output column. A bare count()
    // lets Catalyst prune unused branches — e.g. a report's left join
    // against a per-key-unique aggregate is ELIMINATED wholesale when
    // only the row count is observed (contamination_report benched
    // 0.43 s flat from sf0.1 to 100× while its real cost was ~9 s at
    // 100×). The noop sink consumes every column of every row without
    // writing — the standard benchmarking sink.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Warm up JIT/codegen + file-listing so the first timed query
    // doesn't absorb session startup; fixed name order for run-to-run
    // comparability.
    spark.range(2000000L).selectExpr("sum(id * 2)").collect()
    SparkEntry.queries.get("q_filter_project")
      .foreach(fn => try run(fn(spark, sfDir)) catch { case _: Throwable => () })
    // min of 2 runs per query: the shared host shows multi-second
    // scheduling noise; the minimum is the reproducible cost.
    // A failed query must NOT masquerade as a fast success: record it
    // as -1 and list it in "failed" (the total also carries a large
    // penalty per failure so breakage can't improve the headline).
    // Optional comma-separated filter for single-query iteration.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (k, _) => names(k) })
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { run(fn(spark, sfDir)) }
        catch { case t: Throwable =>
          failed = true
          System.err.println(s"[bench] FAILED $name: ${t.getClass.getName}: ${t.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, if (failed) -1.0 else times.min)
    }
    def fmt(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    def queriesJson(rs: Seq[(String, Double)], dec: Int): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v, dec) }
        .mkString("{", ",", "}")
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = results.collect { case (_, v) if v >= 0 => v }.sum +
      failed.size * 1000.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // one streaming throughput figure next to the batch seconds — the
    // reference's actual modality is an unbounded stream; skipped in
    // single-query dev loops
    val streamRps =
      if (only.isDefined) 0.0
      else try streamBench(spark) catch { case _: Throwable => -1.0 }
    def line(qs: String) =
      s"""{"metric":"total","value":${fmt(total, 4)},"unit":"sec","nq":${results.size},"queries":$qs,"failed":$failedJson,"stream_rows_per_sec":${fmt(streamRps, 0)},"loadavg":${fmt(loadavg, 2)},"full":"bench_full.json","sf":"$sfDir"}"""
    // Full map (4-decimal) to the file artifact; headline map
    // (3-decimal) to stdout, with a hard 1600-char guard: should
    // the headline set ever outgrow the tail budget, drop precision
    // rather than ship another unparseable round.
    val fullLine = line(queriesJson(results, 4))
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val headline = results.filter(r => isHeadline(r._1))
    // last resort shrinks the SUBSET until the line fits (n=0 is a
    // guaranteed-tiny "{}" floor) — the fallback itself must honor the
    // budget or it reproduces the unparseable-artifact failure
    val stdoutLine = Seq(3, 2, 1).map(d => line(queriesJson(headline, d)))
      .find(_.length <= 1600)
      .getOrElse((40 to 0 by -5).iterator
        .map(n => line(queriesJson(headline.take(n), 1)))
        .find(_.length <= 1600).get)
    println(stdoutLine)
    spark.stop()
  }
}
