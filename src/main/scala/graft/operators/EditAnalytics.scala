package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The reference pipeline, re-expressed declaratively, plus its window
  * family (tumbling / sliding / session).
  *
  * Reference semantics (DataStreamJob.java:68-108): filter events
  * (human + main namespace), project to (key, lengths), key by domain,
  * 5-minute tumbling window, emit per-(key, window) summed
  * |new_length - old_length| with window bounds.
  *
  * The test `events` table stands in for the edit stream: `event_type`
  * is the grouping domain, `value` the length delta, `ts` event time.
  * The same transforms run unchanged over `readStream` inputs (see
  * graft.streaming.WikiEditPipeline) — Structured Streaming gives the
  * incremental execution; the batch twin below is the oracle-checkable
  * form.
  *
  * Scale: window assignment happens map-side before the single shuffle
  * on (window, key); partial aggregation combines per-task. At 100 TB
  * the cardinality of (5-min window × key) stays tiny relative to
  * input, so the shuffle carries only partial aggregates.
  */
object EditAnalytics {

  /** Reference filter analog (DataStreamJob.java:68-77): declarative,
    * case-insensitive, pushed to the parquet scan.
    */
  def humanMainFilter(df: DataFrame): DataFrame =
    df.filter(lower(col("event_type")) =!= "error")

  /** FLAGSHIP — batch twin of the full reference pipeline:
    * filter → project → 5-min tumbling window per key → sum |delta|.
    */
  def editSizeByWindow(spark: SparkSession, dir: String): DataFrame =
    editSizeByWindow(Tables.events(spark, dir))

  def editSizeByWindow(events: DataFrame): DataFrame = {
    val e = humanMainFilter(events)
      .select(col("event_type"), col("ts"), col("value"))
    e.groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        round(sum(abs(col("value"))), 2).as("edit_size"),
        count(lit(1)).as("n_edits"))
      .select(
        col("event_type"),
        unix_micros(col("window.start")).as("win_start"),
        unix_micros(col("window.end")).as("win_end"),
        col("edit_size"),
        col("n_edits"))
  }

  /** Filter + projection with expression arithmetic; both predicate and
    * column pruning reach the scan (PushedFilters / ReadSchema).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_discount") > 0.05 &&
        col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_partkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("net_price"),
        col("l_shipdate").cast("date").as("ship_date"))

  /** Sliding (hopping) windows: 10-minute windows every 5 minutes; each
    * event lands in exactly two windows, assigned map-side.
    */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    slidingWindow(Tables.events(spark, dir))

  def slidingWindow(events: DataFrame): DataFrame =
    humanMainFilter(events)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(round(sum(abs(col("value"))), 2).as("edit_size"),
        count(lit(1)).as("n_edits"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("win_start"),
        col("edit_size"), col("n_edits"))

  /** Session windows (30-minute inactivity gap) per user, batch form:
    * gap-flag + running sum assigns session ids in two analytic passes —
    * one shuffle on user_id, no self-join. The streaming twin uses
    * `session_window` (see streaming package).
    */
  def sessionWindow(spark: SparkSession, dir: String): DataFrame =
    sessionWindow(Tables.events(spark, dir))

  def sessionWindow(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val e = events
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("t_us"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("t_us") - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid",
        sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    e.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("t_us")).as("session_start"),
        max(col("t_us")).as("session_end"),
        round(sum(col("value")), 2).as("session_value"))
  }
}
