package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join patterns for streaming pipelines.
  *
  *  - stream ⋈ static dimension: the broadcast lookup every enrich
  *    stage needs (user profile, page metadata); the static side is
  *    re-broadcast per micro-batch, no state.
  *  - stream ⋈ stream: both sides watermarked, join condition bounds
  *    event-time skew so Spark can expire state — unbounded
  *    stream-stream joins never GC and die at scale.
  */
object StreamJoins {

  /** Enrich a stream of edit events with a static dimension keyed by
    * `user_name` (broadcast — no shuffle of the stream side).
    */
  def enrichWithStatic(edits: DataFrame, userDim: DataFrame): DataFrame =
    edits.join(broadcast(userDim), Seq("user_name"), "left_outer")

  /** Correlate two event streams on a key within a bounded event-time
    * window (here: right events at most `maxLagSeconds` AFTER the
    * left event). Both sides carry watermarks so join state expires.
    */
  def streamStreamWithin(left: DataFrame, right: DataFrame,
      key: String, maxLagSeconds: Int,
      leftWatermark: String = "1 minute",
      rightWatermark: String = "1 minute"): DataFrame = {
    val l = left.withWatermark("ts", leftWatermark)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("value").as("r_value"))
      .withWatermark("r_ts", rightWatermark)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("ts") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $maxLagSeconds SECONDS"))
  }
}
