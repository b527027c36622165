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

  /** SEGMENT-level streaming dedup — the ingest twin of batch
    * [[graft.operators.Segments.segmentDedup]]: map-side `sep`
    * segmentation (posexplode, no shuffle), then
    * `dropDuplicatesWithinWatermark` keyed on the segment md5. A
    * repeated paragraph survives only at its first ARRIVAL; state is
    * one 16-byte key per distinct segment inside the watermark, and
    * expires with it. Emits (watermarkCol, doc_id, seg_idx, seg) for
    * the kept segments — on an in-order stream the per-doc reassembly
    * md5-matches the batch operator (StreamingSpec proves it).
    */
  def dropSegmentDupesWithin(docs: DataFrame, watermarkCol: String,
      delay: String, sep: String = "\n"): DataFrame =
    docs
      .select(col(watermarkCol), col("doc_id"),
        posexplode(split(col("text"), java.util.regex.Pattern.quote(sep))))
      .select(col(watermarkCol), col("doc_id"),
        col("pos").cast("long").as("seg_idx"), col("col").as("seg"))
      .withColumn("__seg_md5", md5(col("seg")))
      .withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(Seq("__seg_md5"))
      .drop("__seg_md5")
}
