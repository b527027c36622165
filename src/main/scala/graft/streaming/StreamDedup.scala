package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the ingest-side twin of the batch Dedup
  * operators: drop re-deliveries / re-crawls as they arrive instead of
  * paying for them downstream.
  *
  * `dropDuplicatesWithinWatermark` keys the state by `keys` and, with
  * the watermark bounding how late a duplicate can arrive, lets Spark
  * EXPIRE per-key state — unbounded `dropDuplicates` state is the
  * classic streaming-job slow death at scale.
  */
object StreamDedup {

  /** Exact-key dedup with bounded state. `df` must carry an event-time
    * column already watermarked by the caller, or pass `watermarkCol`/
    * `delay` to have it applied here.
    */
  def dropDupesWithin(df: DataFrame, keys: Seq[String],
      watermarkCol: String, delay: String): DataFrame =
    df.withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Content-hash dedup: dedup on a hash of the payload text rather
    * than an id — catches identical documents from different sources.
    */
  def dropContentDupesWithin(df: DataFrame, textCol: String,
      watermarkCol: String, delay: String): DataFrame =
    df.withColumn("__content_hash", md5(col(textCol)))
      .withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__content_hash"))
      .drop("__content_hash")
}
