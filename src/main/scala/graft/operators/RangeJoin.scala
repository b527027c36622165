package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Interval (range) join — another operator Spark lacks natively: rows
  * of a probe side matched to every interval of the same key that
  * contains their timestamp.
  *
  * The naive form is an equi-join on key plus a range residual, which
  * Spark executes fine — UNLESS keys are few/skewed, and either way
  * every probe row meets every interval of its key before the range
  * filter. The scalable form here adds TIME BINNING as a second
  * equi-join key: intervals are replicated to each fixed-width bin
  * they overlap, probes land in exactly one bin, and the join becomes
  * a plain shuffle equi-join on (key, bin) whose per-task work is
  * bounded by bin occupancy, not per-key row counts. With binWidth ≥
  * the max interval length, replication is ≤ 2× — the standard
  * bin/bucket range-join design (cf. interval joins in Flink and
  * range-join hints in other engines), and AQE still handles residual
  * bin skew.
  */
object RangeJoin {

  /** Generic binned interval join. `probe` needs (`key`, `t`); any
    * other columns ride along. `intervals` needs (`key`, `start`,
    * `end`) — all LongType (micros convention), `end` EXCLUSIVE.
    * Column names across the two sides must not collide (pre-rename).
    * binWidth must be ≥ the maximum interval length for the ≤2×
    * replication bound to hold (correct regardless — longer intervals
    * just replicate to more bins).
    */
  def binnedIntervalJoin(probe: DataFrame, intervals: DataFrame,
      probeKey: String, intervalKey: String,
      timeCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    // exact integer floor-division (negative-safe): subtracting the
    // positive mod lands on the floor multiple, then `div` (Spark's
    // IntegralDivide) divides in LONG arithmetic — `/` on longs goes
    // through double and is only exact below 2^53, not over the full
    // LongType domain this API accepts
    def floorDiv(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floorDiv(col(startCol)),
        floorDiv(col(endCol) - 1))))
    val pr = probe.withColumn("__bin", floorDiv(col(timeCol)))
    pr.join(iv,
        pr(probeKey) === iv(intervalKey) && pr("__bin") === iv("__bin") &&
          pr(timeCol) >= iv(startCol) && pr(timeCol) < iv(endCol))
      .drop("__bin")
  }

  /** Driver query: for every error event, the count and value-sum of
    * the same user's non-error events within ±10 minutes — the
    * "activity around incidents" query. Inner join: errors with a
    * silent neighborhood don't appear (deterministic output).
    */
  def errorNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("value"))
    val tenMinUs = 600000000L
    val errors = ev.filter(lower(col("event_type")) === "error")
      .select(col("user_id").as("err_user"), col("event_id").as("err_id"),
        (col("t") - tenMinUs).as("w_start"), (col("t") + tenMinUs).as("w_end"))
    val probe = ev.filter(lower(col("event_type")) =!= "error")
      .select(col("user_id"), col("t"), col("value"))
    binnedIntervalJoin(probe, errors, "user_id", "err_user",
        "t", "w_start", "w_end", binWidth = 2 * tenMinUs)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_nearby"),
        round(sum(col("value")), 2).as("sum_value"))
  }
}
