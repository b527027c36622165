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
    * partitions = cores (override with SPARK_GRAFT_SHUFFLE_PARTITIONS
    * for scale experiments — at 100×+ data a fixed 32 means each
    * partition carries 100× the rows, and wedge-/agg-heavy shuffles
    * start spilling or OOM-ing per task; raising partitions trades
    * extra waves for bounded per-task state, exactly what a cluster
    * deploy does by sizing partitions to data, not cores), no UI.
    */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
