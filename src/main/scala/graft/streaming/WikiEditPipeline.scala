package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The reference job end-to-end, Structured-Streaming-first.
  *
  * Reference (DataStreamJob.java:49-91): Kafka JSON → filter human +
  * main namespace → (domain, new_length, old_length) → keyBy(domain)
  * → 5-min tumbling window → sum |new-old| → JSON docs → Mongo.
  *
  * Here each stage is a pure DataFrame → DataFrame function, shared
  * verbatim between batch and streaming (the same plan runs under
  * `read` or `readStream`) — incrementalization is Spark's job, not
  * hand-written operator code. Event-time windows + watermark replace
  * the reference's processing-time windows (strictly stronger:
  * reproducible on replay).
  */
object WikiEditPipeline {

  /** Filter: human edits in the main namespace, case-insensitive
    * (DataStreamJob.java:68-77).
    */
  def humanMainEdits(edits: DataFrame): DataFrame =
    edits.filter(lower(col("user_type")) === "human" &&
      lower(col("namespace")) === "main namespace")

  /** Projection to the windowing inputs (DataStreamJob.java:78-83
    * mapped to Tuple3; the length delta is computed map-side here so
    * the shuffle carries one long, not two).
    */
  def editDeltas(edits: DataFrame): DataFrame =
    humanMainEdits(edits).select(col("domain"), col("ts"),
      abs(col("new_length") - col("old_length")).as("delta"))

  /** keyBy(domain) + 5-min tumbling window + summed edit size
    * (DataStreamJob.java:84-108), with bounded out-of-orderness via
    * watermark (DataStreamJob.java:63). Output schema mirrors the
    * reference's Mongo document: {domain, edit_size, start, end}.
    *
    * `processingTime = false` (default) windows on EVENT time — the
    * defensible re-expression (reproducible on replay, oracle-
    * checkable; the reference configures event-time watermarks it
    * never uses — r7 adjudication). `processingTime = true` is the
    * LITERAL twin of the reference's
    * `TumblingProcessingTimeWindows.of(Time.minutes(5))`
    * (DataStreamJob.java:85): each row is assigned to the wall-clock
    * window of the micro-batch that ingests it (`current_timestamp()`
    * is the batch's timestamp — constant within a trigger, monotone
    * across triggers, so the zero-delay watermark is exact and state
    * for closed wall-clock windows expires). Values are wall-clock-
    * dependent by definition — the spec checks schema, single-window
    * collapse within one batch, and total-mass conservation, not
    * window placements.
    */
  def windowedEditSize(edits: DataFrame,
      watermarkDelay: String = "1 second",
      processingTime: Boolean = false): DataFrame = {
    val deltas =
      if (!processingTime) editDeltas(edits)
      else humanMainEdits(edits).select(col("domain"),
        current_timestamp().as("ts"),
        abs(col("new_length") - col("old_length")).as("delta"))
    val delay = if (processingTime) "0 seconds" else watermarkDelay
    deltas
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "5 minutes"), col("domain"))
      .agg(sum(col("delta")).as("edit_size"), count(lit(1)).as("n_edits"))
      .select(col("domain"), col("edit_size"),
        col("window.start").as("start"), col("window.end").as("end"),
        col("n_edits"))
  }

  /** Streaming session aggregation via Spark's native session_window
    * (the streaming twin of EditAnalytics.sessionWindow's batch
    * lag+cumsum form): per-user sessions closed after 30 minutes of
    * event-time inactivity.
    */
  def sessionizedValue(events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"), col("session_value"))

  /** Streaming top-k materialized view: per micro-batch, rank the
    * windowed aggregate and keep the k busiest domains per window.
    * Rank-over-stream isn't expressible inside a streaming plan
    * (non-monotonic), so the standard shape is foreachBatch: the
    * windowed agg stays incremental (complete mode), the rank runs on
    * each batch's (small, aggregated) output, and `sink` receives the
    * refreshed view keyed by epoch. At scale the ranked input is
    * |windows × domains| aggregate rows, not raw events.
    */
  def startTopDomainsView(windowed: DataFrame, k: Int)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    windowed.writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val w = Window.partitionBy(col("start"))
          .orderBy(col("edit_size").desc, col("domain"))
        sink(batch.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= k).drop("rk"), epochId)
      }
      .start()
  }

  /** Full job: JSON-lines source dir → windowed edit sizes → JSON doc
    * sink (the reference's Kafka→Mongo wiring, re-pointed at
    * swappable endpoints).
    */
  def run(spark: SparkSession, inputPath: String, outputPath: String,
      checkpoint: String): StreamingQuery =
    JsonDocSink.startFileSink(
      windowedEditSize(EditStream.readJsonFiles(spark, inputPath)),
      outputPath, checkpoint)
}
