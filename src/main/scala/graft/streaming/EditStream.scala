package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.EditEvents

/** Streaming sources for the edit-event feed.
  *
  * Reference: a KafkaSource of JSON values with a bounded-out-of-
  * orderness watermark (DataStreamJob.java:61-66, 114-120). Spark-first
  * form: any `readStream` producing a `value` column (Kafka connector,
  * file, socket, rate, MemoryStream) goes through the same declarative
  * `from_json` decode — the transform pipeline is source-agnostic, so
  * swapping file-test input for a production Kafka topic changes ONE
  * line, not the job.
  */
object EditStream {

  /** JSON-lines files appearing under `path` (the file-backed stand-in
    * for a Kafka topic; new files = new messages).
    */
  def readJsonFiles(spark: SparkSession, path: String): DataFrame =
    EditEvents.fromJson(spark.readStream.text(path))

  /** Bounded-intake variant: `maxFilesPerTrigger` is the file-source
    * face of Kafka's `maxOffsetsPerTrigger` — the per-trigger
    * admission bound graft documents as Spark's analog of the
    * reference's watermark ALIGNMENT (DataStreamJob.java:63-64:
    * `withWatermarkAlignment`, which pauses a source that runs ahead
    * of the group). Spark cannot pause one source relative to
    * another's watermark, but when every source's intake is capped,
    * no source's event-time high-water can run ahead of a co-equal
    * source by more than one admission quantum per trigger — the
    * bound the alignment spec measures and enforces
    * (StreamingSpec "watermark-alignment analog").
    */
  def readJsonFiles(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int): DataFrame =
    EditEvents.fromJson(spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .text(path))

  /** Kafka-shaped frames: any streaming DataFrame with a binary/string
    * `value` column (e.g. `spark.readStream.format("kafka")...`).
    */
  def fromKafkaShaped(frames: DataFrame): DataFrame =
    EditEvents.fromJson(frames)

  /** Live TCP JSON-lines feed through Spark's built-in `socket`
    * source — the jar-less half of the reference's "Kafka/socket"
    * ingestion (the baseline names both; Kafka needs the external
    * connector jar, socket runs anywhere). Same one-line decode as
    * every other source: the socket format emits a string `value`
    * column per line. Dev/demo tool by contract: the socket source
    * is neither replayable nor fault-tolerant (no offsets — a
    * restarted query loses in-flight lines); production traffic goes
    * through [[fromKafkaShaped]].
    */
  def readSocket(spark: SparkSession, host: String, port: Int): DataFrame =
    EditEvents.fromJson(spark.readStream.format("socket")
      .option("host", host).option("port", port.toString).load())

  /** Deterministic synthetic edit stream from the rate source (dev /
    * load-test tool; ~rowsPerSecond events/s).
    */
  def synthetic(spark: SparkSession, rowsPerSecond: Int = 100): DataFrame = {
    val raw = spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()
    raw.select(
      col("value").cast("string").as("id"),
      concat(lit("site"), pmod(col("value"), lit(5L)), lit(".example.org"))
        .as("domain"),
      when(pmod(col("value"), lit(10L)) < 8, lit("main namespace"))
        .otherwise(lit("talk")).as("namespace"),
      concat(lit("Page_"), pmod(col("value"), lit(1000L))).as("title"),
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .as("timestamp"),
      concat(lit("user"), pmod(col("value"), lit(97L))).as("user_name"),
      when(pmod(col("value"), lit(7L)) === 0, lit("bot"))
        .otherwise(lit("human")).as("user_type"),
      (pmod(col("value"), lit(9000L)) + 1000L).as("old_length"),
      (pmod(xxhash64(col("value")), lit(9000L)) + 1000L).as("new_length"),
      col("timestamp").as("ts"))
  }
}
