package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet readers for the test star schema.
  *
  * Plain `spark.read.parquet` so Catalyst owns pushdown: every
  * downstream filter/projection reaches the scan (`PushedFilters`,
  * pruned `ReadSchema`). At 100 TB these would be partitioned tables
  * (e.g. lineitem by ship month); readers stay identical — partition
  * pruning is then free for date predicates.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` physical type varies by testdata generation:
    * TIMESTAMP(NANOS) (Spark only reads it via the nanosAsLong
    * legacy conf, as a raw long) or TIMESTAMP(MICROS) (which a
    * session with `parquet.inferTimestampNTZ` at its Spark-4 default
    * reads as TIMESTAMP_NTZ — breaking every `unix_micros`/window
    * consumer downstream). Normalize BOTH to a proper session-local
    * TimestampType here, so callers — including a bare driver
    * session with none of GraftSession's configs — always see one
    * type: nanos → exact integer division (`/` on longs would go
    * through double and lose precision above 2^53), NTZ → cast
    * (wall-clock reinterpreted in the session zone, UTC under
    * GraftSession — the same instant semantics the LTZ read gives).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
