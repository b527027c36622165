package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The end-to-end training-data curation pipeline — the flow this
  * engine exists for, composed from the §2.3 operators:
  *
  *   1. exact dedup          (hash-groupBy, keep min id)
  *   2. near-dup dedup       (MinHash-LSH pairs → connected
  *                            components → keep canonical ids)
  *   3. quality filter       (distinct-token ratio, length floor)
  *   4. train/val split      (deterministic content-hash split)
  *
  * Every stage is a bounded-shuffle distributed operator (see the
  * individual operators' scale notes); the composition is linear in
  * corpus size. Output is fully deterministic — the whole pipeline is
  * DuckDB-oracle-checked end to end (`curate_corpus`).
  */
object Curation {

  def curate(docs: DataFrame,
      nearDupTau: Double = 0.8,
      minUniqRatio: Double = 0.2,
      minTokens: Int = 20,
      trainSixteenths: Int = 14): DataFrame = {
    // 1. exact dedup
    val keepExact = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exactDocs = docs.join(keepExact, "doc_id")
    // 2. near-dup components among the exact survivors
    val pairs = Dedup.minhashLshPairs(exactDocs, tau = nearDupTau)
    val canon = Dedup.canonicalIds(exactDocs, pairs)
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    val unique = exactDocs.join(canon, "doc_id")
    // 3. quality floor
    val toks = split(col("text"), " ")
    val quality = unique
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("uniq_ratio",
        size(array_distinct(toks)).cast("double") / size(toks))
      .filter(col("uniq_ratio") >= minUniqRatio &&
        col("n_tokens") >= minTokens)
    // 4. deterministic split
    Sampling.trainValSplit(quality, "doc_id", trainSixteenths)
      .select(col("doc_id"), col("lang"), col("split"), col("n_tokens"))
  }

  def curateCorpus(spark: SparkSession, dir: String): DataFrame =
    curate(Tables.documents(spark, dir))

  /** v2: the full pipeline plus language rebalancing — after dedup +
    * quality, dominant languages are hash-downsampled per
    * [[Sampling.stratifiedSample]] before the split. Same bounded-
    * shuffle stages, still ONE composed DuckDB oracle
    * (`curate_corpus_v2`) hash-checking the whole five-stage flow.
    */
  def curateRebalanced(docs: DataFrame,
      rates: Map[String, Int] = Map("en" -> 8, "es" -> 12),
      nearDupTau: Double = 0.8,
      minUniqRatio: Double = 0.2,
      minTokens: Int = 20,
      trainSixteenths: Int = 14): DataFrame = {
    val curated = curate(docs, nearDupTau, minUniqRatio, minTokens,
      trainSixteenths)
    Sampling.stratifiedSample(curated, "doc_id", "lang", rates)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"))
  }

  def curateCorpusV2(spark: SparkSession, dir: String): DataFrame =
    curateRebalanced(Tables.documents(spark, dir))
}
