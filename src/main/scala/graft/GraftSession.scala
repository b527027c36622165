package graft

import org.apache.spark.sql.SparkSession

/** Turnkey SparkSession wiring for graft — every config the library's
  * correctness or performance depends on, in one place:
  *
  *  - `legacy.parquet.nanosAsLong`: the events feed is parquet
  *    TIMESTAMP(NANOS), which Spark otherwise refuses to read
  *    (`Tables.events` then normalizes the raw long to µs);
  *  - `parquet.inferTimestampNTZ.enabled=false`: keep timestamps LTZ
  *    so `unix_micros` callers work on every table;
  *  - session timezone UTC: window/oracle determinism;
  *  - AQE on: runtime coalescing + skew-join splitting is part of the
  *    documented 100 TB design;
  *  - [[GraftExtensions]]: native functions in SQL + the as-of join
  *    planner strategy.
  *
  * `local(n)` sizes `shuffle.partitions` to the core count (the 200
  * default just fragments a single-JVM run); cluster deploys should
  * size it ≈ 2-3× total cores and let AQE coalesce — `builder()`
  * leaves it untouched for that reason.
  *
  * NOTE `getOrCreate` ignores `withExtensions` when a session already
  * exists — create the graft session first (or use
  * `GraftExtensions.register(spark)` on a pre-existing session).
  */
object GraftSession {

  /** Master-agnostic pre-configured builder (cluster deploys: set
    * master/resources downstream, or rely on spark-submit).
    */
  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .withExtensions(new GraftExtensions)

  /** Local session for tests/tools: `cores` threads, shuffle
    * partitions = cores (override with SPARK_GRAFT_SHUFFLE_PARTITIONS;
    * prefer [[localFor]] when the input directory is known — it sizes
    * partitions to DATA), no UI.
    */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Local session whose shuffle partitions are sized to the DATA
    * about to be processed, not just the core count — the §5 scale
    * rule ("partitions ≈ 2-3× cores AND bounded per-partition bytes")
    * as default behavior instead of a hand-turned env knob. The r9
    * 300× study measured why: with partitions fixed at 32, each task
    * carries 300× the rows — graph_jaccard went superlinear
    * (213.7 s) and graph_pagerank OOM'd on per-task hash-agg state;
    * re-sized to data (128 partitions) both return to the linear
    * envelope (185.0 s / completes at the default heap). AQE coalesces
    * the extra partitions away on the stages that don't need them, so
    * over-provisioning costs little; under-provisioning costs spills
    * and OOMs. SPARK_GRAFT_SHUFFLE_PARTITIONS still overrides for
    * experiments.
    */
  def localFor(cores: Int, dataDir: String,
      appName: String = "graft"): SparkSession =
    builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          dataSizedPartitions(dataDir, cores).toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** max(cores, ceil(input bytes / bytesPerPartition)): at small
    * inputs parallelism floors at the core count (the 200 default
    * just fragments a single-JVM run); as data grows, partition count
    * grows linearly so PER-TASK shuffle state stays bounded —
    * compressed parquet expands ~5-10× into row form, so 32 MiB of
    * input per partition keeps in-flight task state in the low
    * hundreds of MiB even for fan-out-heavy operators (graph edges,
    * pair joins). Unreadable/missing dirs fall back to cores (the
    * pre-r10 behavior). Local-fs walk — a cluster deploy would ask
    * the Hadoop FileSystem for `getContentSummary` instead.
    */
  def dataSizedPartitions(dataDir: String, cores: Int,
      bytesPerPartition: Long = 32L << 20): Int = {
    // the scheme guard's failure must PROPAGATE — an hdfs://-sized-to-
    // cores session is exactly the silent misconfiguration it exists
    // to prevent; only walk errors (missing/unreadable LOCAL dirs)
    // keep the pre-r10 cores fallback
    val total = try localInputBytes(dataDir) catch {
      case e: IllegalArgumentException => throw e
      case _: Throwable => 0L
    }
    math.max(cores, math.ceil(total.toDouble / bytesPerPartition).toInt)
  }

  /** Total bytes under a LOCAL directory tree — the sandbox stand-in
    * for the Hadoop FileSystem's `getContentSummary`. Fails LOUD on a
    * non-local URI scheme (`hdfs://`, `s3a://`, …): a `java.io.File`
    * walk over a remote URI silently returns 0 bytes, and every
    * caller here turns 0 into a wrong-but-plausible default (cores
    * for [[dataSizedPartitions]], 1 output file for `Layout.compact`)
    * — the misconfiguration must be an error, not a slow job.
    * `parquetOnly` restricts the sum to `*.parquet` data files
    * (sidecars — `_SUCCESS`, `.crc` — excluded), the form file-count
    * derivation wants.
    */
  def localInputBytes(path: String, parquetOnly: Boolean = false): Long = {
    val uri = try Option(new java.net.URI(path)) catch {
      case _: Exception => None // not a parseable URI — a plain local path
    }
    val scheme = uri.flatMap(u => Option(u.getScheme))
    require(scheme.forall(_ == "file"),
      s"localInputBytes: non-local scheme '${scheme.getOrElse("")}' in " +
        s"'$path' — the local-fs walk cannot size remote data; on a " +
        "cluster ask the Hadoop FileSystem (FileSystem.get(uri, conf)" +
        ".getContentSummary) instead")
    // An authority-form URI (`file://host/path`) passes the scheme
    // guard but a TEXTUAL `stripPrefix("file:")` walk would start at
    // `//host/path` — the silent-0-bytes hole the guard exists to
    // close. Resolve through java.net.URI instead, and refuse a
    // non-empty authority outright (java.io.File cannot reach a
    // remote host either way).
    val root = uri.filter(_ => scheme.isDefined) match {
      case Some(u) =>
        require(Option(u.getAuthority).forall(_.isEmpty),
          s"localInputBytes: file URI with authority '${u.getAuthority}' " +
            s"in '$path' — a remote-host file URI cannot be walked locally")
        new java.io.File(new java.net.URI("file", null, u.getPath, null))
      case None => new java.io.File(path)
    }
    def bytes(f: java.io.File): Long =
      if (f.isFile) {
        if (!parquetOnly || f.getName.endsWith(".parquet")) f.length() else 0L
      } else Option(f.listFiles).map(_.map(bytes).sum).getOrElse(0L)
    bytes(root)
  }
}
