package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-mixture composition — the step between a curated corpus
  * and a training run: given TARGET domain proportions (the mixture
  * the model should see) and the OBSERVED corpus skew, derive a
  * deterministic per-domain sampling rate and apply it with the same
  * content-hash membership discipline as [[Sampling]] (membership is
  * a pure function of doc_id — re-runs, re-partitions, and corpus
  * growth never reshuffle which docs a domain keeps).
  *
  * Two passes by necessity (rates depend on observed counts): pass 1
  * is a count-only aggregate (at 100 TB: a column-pruned scan of one
  * string column, hash-partial combined, |domains| result rows);
  * pass 2 filters by the md5-nibble rank against the rate map, which
  * joins back as a broadcast of |domains| rows — the corpus never
  * shuffles at all.
  */
object Mixture {

  /** Per-domain keep-rate in sixteenths for a target mixture:
    * `rate_d = min(16, floor(16 * budget * w_d / n_d))` — the largest
    * nibble rate that keeps domain d's contribution at or under its
    * target share `w_d` of `budget` rows. Domains absent from
    * `weights` get weight 0 (dropped): a mixture is a whitelist.
    */
  def mixtureRates(docs: DataFrame, domainCol: String,
      weights: Map[String, Double], budgetShare: Double): DataFrame = {
    require(budgetShare > 0 && budgetShare <= 1.0)
    val wCase = weights.foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(col(domainCol) === k, lit(w)).otherwise(acc)
    }
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_obs"))
    val total = docs.agg(count(lit(1)).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col(domainCol), col("n_obs"),
        least(lit(16), floor(lit(16.0) * wCase
          * (col("n_total") * budgetShare) / col("n_obs")).cast("long"))
          .as("rate_sixteenths"))
  }

  /** 0-based hash-space rank of `id`'s first md5 hex nibble — the
    * same portable membership function as [[Sampling.inHashSample]]
    * (engine-agnostic: any md5 reproduces it).
    */
  private def nibbleRank(id: Column): Column = {
    val c = ascii(substring(md5(id.cast("string")), 1, 1))
    when(c >= ascii(lit("a")), c - ascii(lit("a")) + 10)
      .otherwise(c - ascii(lit("0")))
  }

  /** Apply a rate table from [[mixtureRates]]: keep a doc iff its
    * nibble rank falls under its domain's rate. The rate side is
    * |domains| rows — explicitly broadcast, so this is a map-only
    * stage over the corpus.
    */
  def applyMixture(docs: DataFrame, rates: DataFrame, idCol: String,
      domainCol: String): DataFrame =
    docs.join(broadcast(rates), Seq(domainCol))
      .filter(nibbleRank(col(idCol)) < col("rate_sixteenths"))
      .drop("n_obs", "rate_sixteenths")

  /** Driver query: rebalance the documents corpus toward a uniform
    * five-language mixture at half-corpus budget; report per-language
    * observed count, derived rate, and kept count.
    */
  def composeMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val weights = Map("en" -> 0.2, "de" -> 0.2, "es" -> 0.2,
      "fr" -> 0.2, "zh" -> 0.2)
    val rates = mixtureRates(docs, "lang", weights, budgetShare = 0.5)
    docs.join(broadcast(rates), Seq("lang"))
      .groupBy(col("lang"), col("n_obs"), col("rate_sixteenths"))
      .agg(sum(when(nibbleRank(col("doc_id")) < col("rate_sixteenths"), 1L)
        .otherwise(0L)).as("n_kept"))
  }
}
