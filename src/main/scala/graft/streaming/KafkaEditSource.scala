package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Kafka integration surface for the edit-event feed — the literal
  * source of the reference job (DataStreamJob.java:114-120:
  * KafkaSource.builder with bootstrap servers, topic
  * `wikipedia-events`, group id, `OffsetsInitializer.latest()`, JSON
  * value-only deserialization).
  *
  * Spark-first mapping, one knob at a time:
  *  - setBootstrapServers  → `kafka.bootstrap.servers`
  *  - setTopics            → `subscribe`
  *  - setGroupId           → `kafka.group.id` (Spark manages its own
  *    consumer groups; pinning one is supported for ACL'd clusters)
  *  - setStartingOffsets   → `startingOffsets` (latest/earliest/JSON)
  *  - (no Flink analog)    → `maxOffsetsPerTrigger`: per-trigger
  *    backpressure — ALSO the closest Spark analog to the reference's
  *    watermark *alignment* (DataStreamJob.java:64): Spark cannot pause
  *    one source's consumption relative to another's watermark, but
  *    bounding per-trigger intake keeps sources from running ahead.
  *  - value deserialization → NOT an option: the connector emits
  *    binary `value`; decode is the same declarative
  *    [[graft.sources.EditEvents.fromJson]] used by every other source
  *    (swap file test input for Kafka without touching the pipeline).
  *
  * The `spark-sql-kafka` connector jar is provisioned on the cluster,
  * not in this build — so `options`/`decode` are plain functions
  * (fully unit-testable offline) and only `load()` touches the
  * connector, failing fast with a clear message when the jar is
  * absent ([[isAvailable]] preflights without throwing).
  */
final case class KafkaEditSource(
    brokers: String,
    topic: String = "wikipedia-events",
    groupId: Option[String] = None,
    startingOffsets: String = "latest",
    maxOffsetsPerTrigger: Option[Long] = None,
    failOnDataLoss: Boolean = true,
    extra: Map[String, String] = Map.empty) {

  /** The exact option map handed to `readStream.format("kafka")`. */
  def options: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      groupId.map("kafka.group.id" -> _) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      extra

  /** Raw Kafka frames (key, value, topic, partition, offset, ...).
    * Requires the spark-sql-kafka connector on the classpath.
    */
  def load(spark: SparkSession): DataFrame = {
    require(KafkaEditSource.isAvailable,
      "spark-sql-kafka connector not on the classpath; add the " +
        "spark-sql-kafka-0-10 jar (cluster deploys ship it) or feed " +
        "Kafka-shaped frames to decode() from another source")
    spark.readStream.format("kafka").options(options).load()
  }

  /** Typed edit events from this source: load + declarative JSON
    * decode (JsonNodeDeserializationSchema.java:24-37 analog).
    */
  def loadEvents(spark: SparkSession): DataFrame = decode(load(spark))

  /** The deserialization step alone, usable with any Kafka-shaped
    * frames (binary/string `value` column) — this is what specs drive
    * offline.
    */
  def decode(frames: DataFrame): DataFrame = EditStream.fromKafkaShaped(frames)
}

object KafkaEditSource {

  /** True when the Kafka streaming provider class is loadable. */
  lazy val isAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }
}
