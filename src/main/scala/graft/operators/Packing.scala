package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Sequence packing — the context-window prep step that concatenates
  * documents into fixed token budgets before training (each training
  * sequence is a contiguous slice of the packed stream). Packing a
  * single global stream is inherently sequential, so the operator
  * packs per SHARD: docs are routed by `doc_id % nShards`, each
  * shard's stream is packed independently in doc_id order, and a
  * doc's bin is the context window its first token lands in.
  *
  * Everything is integer algebra over a deterministic order —
  * output is identical across partitionings and engines.
  *
  * Scale shape: one shuffle (the per-shard window). Each shard is one
  * window partition, so `nShards` is the parallelism knob — size it
  * ≈ 2-3× cluster cores; per-task state is the running offset (O(1)).
  * At 100 TB the same layout holds: shards stay independent, and the
  * running sum never materializes more than a shard partition per
  * task.
  */
object Packing {

  def packDocs(spark: SparkSession, dir: String): DataFrame =
    packDocs(Tables.documents(spark, dir))

  /** Per doc: its shard, whitespace token count, start offset in the
    * shard's concatenated token stream, and the `budget`-token bin
    * (context window) containing that start offset.
    */
  def packDocs(docs: DataFrame, nShards: Int = 8,
      budget: Long = 256L): DataFrame = {
    require(nShards > 0 && budget > 0)
    Par.ensure(docs)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .transform(packCounts(nShards, budget))
  }

  /** The packing recurrence over an EXPLICIT per-doc token-count
    * table (doc_id, n_tokens) — the shard routing, running offset,
    * and bin assignment shared by [[packDocs]] (whitespace counts)
    * and [[packDocsBpe]] (tokenizer counts): a context window is a
    * TOKENIZER-token budget, so packing on whitespace counts
    * systematically over-fills real windows wherever the BPE/
    * whitespace ratio exceeds 1 (it does, 2-5× on web text).
    */
  def packCounts(nShards: Int = 8, budget: Long = 256L)(
      toks: DataFrame): DataFrame = {
    require(nShards > 0 && budget > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("n_tokens").cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin",
        call_function("div", col("start_off"), lit(budget)))
  }

  /** Driver query `seq_pack_bpe`: [[packDocs]] with the token mass
    * measured in BPE tokens (the merges trained on the same corpus,
    * via the shared [[Bpe.cachedMerges]] memo) instead of whitespace
    * tokens — the other half of the whitespace→tokenizer gap r12's
    * `mix_token_budget_bpe` closed for mixtures. Same shard routing
    * and recurrence; only the per-doc mass differs.
    */
  def packDocsBpe(spark: SparkSession, dir: String,
      nShards: Int = 8, budget: Long = 256L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Bpe.vocabTokenCounts(docs, Bpe.cachedMerges(spark, dir))
      .withColumnRenamed("n_tokens_bpe", "n_tokens")
      .transform(packCounts(nShards, budget))
  }
}
