package org.apache.spark.sql.kafka010

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TEST-CLASSPATH stand-in for the real spark-sql-kafka-0-10 provider
  * at its EXACT lookup coordinates — the Kafka sibling of the MongoDB
  * fake-driver trick (src/test/java/com/mongodb/…): the production
  * code path is exercised verbatim offline, down to the two real
  * resolution mechanisms —
  *
  *  1. `KafkaEditSource.isAvailable` preflights
  *     `Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")`
  *     — THIS class satisfies it;
  *  2. `readStream.format("kafka")` resolves through the
  *     DataSourceRegister ServiceLoader by shortName — this class
  *     registers "kafka" (META-INF/services in test resources),
  *     exactly how the real connector is found on a cluster.
  *
  * Behavioral surface mirrored from the real provider (reference:
  * DataStreamJob.java:114-120 consumes the same topic semantics):
  * required-option validation (`kafka.bootstrap.servers` + a
  * subscription), the 7-column Kafka wire schema, `startingOffsets`
  * earliest/latest, and `maxOffsetsPerTrigger` per-trigger admission.
  * Frames come from [[FakeKafkaBroker]] — an in-process topic map that
  * supports APPEND WHILE A QUERY RUNS, so specs can drive multi-batch
  * live-feed scenarios (the ServerSocket spec shape, without sockets).
  *
  * DSv1 `StreamSourceProvider` (the FileStreamSource lineage): the
  * micro-batch planner drives getOffset/getBatch, which is all the
  * pipeline-parity specs need. Lives in o.a.s.sql.kafka010 so
  * `internalCreateDataFrame` (private[sql], what the real KafkaSource
  * calls to emit streaming batches) is accessible the same way.
  */
class KafkaSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "kafka"

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    KafkaSourceProvider.validate(parameters)
    ("kafka", KafkaSourceProvider.KafkaSchema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    KafkaSourceProvider.validate(parameters)
    new FakeKafkaSource(
      sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext],
      parameters("subscribe"),
      parameters.getOrElse("startingoffsets", "latest"),
      parameters.get("maxoffsetspertrigger").map(_.toLong))
  }
}

object KafkaSourceProvider {

  /** The real connector's wire schema, column-for-column. */
  val KafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The real provider's required-option contract (option keys reach
    * DSv1 lower-cased by Spark's CaseInsensitiveMap).
    */
  private[kafka010] def validate(parameters: Map[String, String]): Unit = {
    require(parameters.contains("kafka.bootstrap.servers"),
      "Option 'kafka.bootstrap.servers' must be specified for " +
        "configuring Kafka consumer")
    require(parameters.contains("subscribe"),
      "One of the following options must be specified for Kafka " +
        "source: subscribe, subscribepattern, assign")
  }
}

/** One message on the fake broker: (key, value, eventTimeMs). */
final case class FakeKafkaMsg(key: Array[Byte], value: Array[Byte],
    timestampMs: Long)

/** In-process "broker": topic → append-only message log. Thread-safe;
  * producers may `send` while a streaming query is consuming (each
  * micro-batch picks up the offsets that exist at trigger time —
  * live-feed semantics).
  */
object FakeKafkaBroker {
  private val topics =
    new ConcurrentHashMap[String, java.util.ArrayList[FakeKafkaMsg]]()

  private def log(topic: String): java.util.ArrayList[FakeKafkaMsg] =
    topics.computeIfAbsent(topic, _ => new java.util.ArrayList[FakeKafkaMsg]())

  def send(topic: String, value: String,
      timestampMs: Long = System.currentTimeMillis,
      key: String = null): Unit = {
    val l = log(topic)
    l.synchronized {
      l.add(FakeKafkaMsg(
        if (key == null) null else key.getBytes("UTF-8"),
        value.getBytes("UTF-8"), timestampMs))
    }
  }

  def size(topic: String): Long = {
    val l = log(topic)
    l.synchronized(l.size.toLong)
  }

  /** Messages in [from, until) with their offsets. */
  def slice(topic: String, from: Long,
      until: Long): Seq[(Long, FakeKafkaMsg)] = {
    val l = log(topic)
    l.synchronized {
      (from until math.min(until, l.size))
        .map(i => (i, l.get(i.toInt)))
    }
  }

  def deleteTopic(topic: String): Unit = topics.remove(topic)
}

/** DSv1 micro-batch source over [[FakeKafkaBroker]] — getOffset
  * reports the admitted high-water mark (bounded by
  * maxOffsetsPerTrigger per trigger, the real connector's admission
  * control), getBatch materializes the wire-schema rows.
  */
final class FakeKafkaSource(
    sqlContext: org.apache.spark.sql.classic.SQLContext,
    topic: String, startingOffsets: String,
    maxOffsetsPerTrigger: Option[Long]) extends Source {

  private val base: Long = startingOffsets.toLowerCase match {
    case "latest" => FakeKafkaBroker.size(topic)
    case "earliest" => 0L
    case other => throw new IllegalArgumentException(
      s"fake kafka: unsupported startingOffsets '$other'")
  }
  // last high-water mark this source ADMITTED (not yet necessarily
  // committed) — the per-trigger cap advances from here
  private var admitted: Long = base

  override def schema: StructType = KafkaSourceProvider.KafkaSchema

  override def getOffset: Option[Offset] = synchronized {
    val available = FakeKafkaBroker.size(topic)
    val next = maxOffsetsPerTrigger match {
      case Some(cap) => math.min(available, admitted + cap)
      case None => available
    }
    if (next > admitted) admitted = next
    if (admitted <= base) None else Some(LongOffset(admitted))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(o => LongOffset(o.json.toLong).offset)
      .getOrElse(base)
    val until = LongOffset(end.json.toLong).offset
    val rows = FakeKafkaBroker.slice(topic, from, until).map {
      case (off, m) =>
        InternalRow(
          m.key,
          m.value,
          UTF8String.fromString(topic),
          0,
          off,
          DateTimeUtils.millisToMicros(m.timestampMs),
          1)
    }
    val rdd = sqlContext.sparkContext.parallelize(rows, math.max(1,
      math.min(4, rows.size)))
    sqlContext.internalCreateDataFrame(rdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}
