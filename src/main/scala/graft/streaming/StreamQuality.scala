package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming data-quality gate — the ingest twin of batch
  * [[graft.operators.QualityChecks.expectations]]: evaluate the same
  * declarative rule suite on every ARRIVING row, route violations to
  * a quarantine lane instead of dropping them silently, and surface
  * per-batch violation counts through `observe()` metrics (collected
  * by the driver's StreamingQueryListener — no extra aggregation
  * stage, no second pass over the stream).
  *
  * Scale shape: rules compile to codegen'd when() columns — the gate
  * is pure map-side, zero shuffle, zero state; observe() metrics are
  * algebraic accumulators merged task-side. A 100 TB/day firehose
  * pays only the predicate evaluation it would pay anyway.
  */
object StreamQuality {

  /** Rows annotated with `dq_ok` (all rules pass) and `dq_failed`
    * (comma-joined names of violated rules — NULL predicates violate,
    * the batch convention). Works on a static frame too (the parity
    * the spec proves).
    */
  def annotated(stream: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val failed = array(rules.map { case (name, pred) =>
      when(pred, lit(null).cast("string")).otherwise(lit(name))
    }: _*)
    stream
      .withColumn("dq_failed", array_join(array_compact(failed), ","))
      .withColumn("dq_ok", col("dq_failed") === "")
  }

  /** The gate: clean rows only, with per-batch violation metrics
    * registered under `metricName` (one `<rule>_violations` counter
    * per rule plus `rows_total`). Read them from
    * `StreamingQueryProgress.observedMetrics` — or, on a batch frame,
    * via `Observation`.
    */
  def gate(stream: DataFrame, rules: Seq[(String, Column)],
      metricName: String = "dq"): DataFrame = {
    val metrics = count(lit(1)).as("rows_total") +:
      rules.map { case (name, pred) =>
        sum(when(pred, 0L).otherwise(1L)).as(s"${name}_violations")
      }
    annotated(stream, rules)
      .observe(metricName, metrics.head, metrics.tail: _*)
      .filter(col("dq_ok"))
      .drop("dq_ok", "dq_failed")
  }
}
