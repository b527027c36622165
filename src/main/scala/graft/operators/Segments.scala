package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sub-document (segment/paragraph) dedup operators — the CCNet/
  * RefinedWeb curation steps that act BELOW document granularity:
  * exact segment dedup (keep the first corpus-wide occurrence of
  * every repeated paragraph) and boilerplate scrubbing (drop segments
  * that recur across many documents — headers, footers, licence
  * blurbs). Reference corpora carry newline paragraph structure; the
  * synthetic test corpus has none, so segmentation here is
  * fixed-width token windows (the `window` parameter) — the operator
  * shape (segment → global resolve → in-order reassembly) is
  * identical either way, and [[segmented]] takes any precomputed
  * (doc_id, seg_idx, seg) frame for separator-based callers.
  *
  * Scale shape (both ops): segment generation is pure map-side
  * (sequence + explode, zero shuffle); the global resolve shuffles
  * once keyed on the segment's md5 (16-byte-class key, never the
  * text); reassembly is one groupBy(doc_id) whose state is bounded by
  * the document's own size. Reassembled text is emitted as md5 so the
  * oracle compare ships 32 bytes per doc.
  */
object Segments {

  /** Non-overlapping `window`-token segments with per-doc ordinal.
    * The final segment keeps the tail even when shorter.
    */
  def segmented(docs: DataFrame, window: Int): DataFrame = {
    require(window > 0)
    val toks = split(col("text"), " ")
    // ceil(n / window) in pure long arithmetic (IntegralDivide)
    val nSegs = call_function("div",
      size(toks).cast("long") + (window - 1), lit(window.toLong))
    Par.ensure(docs)
      .select(col("doc_id"), toks.as("t"), nSegs.as("n_segs"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0L), col("n_segs") - 1)).as("seg_idx"))
      .select(col("doc_id"), col("seg_idx"),
        array_join(slice(col("t"),
          (col("seg_idx") * window + 1).cast("int"), lit(window)), " ")
          .as("seg"))
  }

  /** Reassemble kept segments in document order; md5 of the joined
    * text (md5('') for docs whose every segment was dropped — the row
    * survives so the caller sees the doc went empty). `keep` marks
    * surviving segments. GetArrayStructFields (`.getField`) extracts
    * the text column from the sorted struct array without an
    * interpreted transform lambda; the array_sort struct comparator
    * is per-doc (≤ tokens/window elements), not corpus-wide.
    */
  private def reassemble(segs: DataFrame, keep: org.apache.spark.sql.Column,
      dropped: String, outMd5: String): DataFrame =
    segs
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(keep, 0L).otherwise(1L)).as(dropped),
        md5(array_join(
          array_sort(collect_list(when(keep,
            struct(col("seg_idx"), col("seg"))))).getField("seg"),
          " ")).as(outMd5))

  def segmentDedup(spark: SparkSession, dir: String): DataFrame =
    segmentDedup(Tables.documents(spark, dir))

  /** Exact segment-level dedup: every distinct segment text survives
    * only at its FIRST corpus occurrence — ordered by (doc_id,
    * seg_idx), so the winner is deterministic regardless of partition
    * layout. One row per input doc: total segments, kept count, md5
    * of the doc reassembled from surviving segments.
    */
  def segmentDedup(docs: DataFrame, window: Int = 10): DataFrame = {
    val w = Window.partitionBy(md5(col("seg")))
      .orderBy(col("doc_id"), col("seg_idx"))
    val ranked = segmented(docs, window)
      .withColumn("rn", row_number().over(w))
    reassemble(ranked, col("rn") === 1, "n_dropped", "dedup_md5")
      .withColumnRenamed("n_dropped", "n_dup")
      .select(col("doc_id"), col("n_segs"),
        (col("n_segs") - col("n_dup")).as("n_kept"), col("dedup_md5"))
  }

  def boilerplateScrub(spark: SparkSession, dir: String): DataFrame =
    boilerplateScrub(Tables.documents(spark, dir))

  /** Boilerplate removal: segments whose DOCUMENT frequency reaches
    * `dfThreshold` are dropped from EVERY document (unlike
    * [[segmentDedup]], no occurrence survives — a licence blurb in
    * 10k docs is noise in all of them). df counts distinct docs, so a
    * segment repeated inside one doc doesn't self-promote. The df
    * side is corpus-scale and joins back on the segment hash —
    * sort-merge at 100 TB, never broadcast.
    */
  def boilerplateScrub(docs: DataFrame, window: Int = 10,
      dfThreshold: Int = 2): DataFrame = {
    require(dfThreshold >= 2)
    val segs = segmented(docs, window)
    val dfs = segs
      .groupBy(md5(col("seg")).as("seg_md5"))
      .agg(countDistinct(col("doc_id")).as("seg_df"))
    val joined = segs.join(dfs, md5(col("seg")) === col("seg_md5"))
    reassemble(joined, col("seg_df") < dfThreshold, "n_boiler", "clean_md5")
  }
}
