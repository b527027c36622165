package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every raw
  * document by the log-likelihood ratio of its tokens under a TARGET
  * distribution vs the raw/base distribution, then keep the top
  * scorers — the cheap feature-based proxy for "train on data that
  * looks like the target domain" that selected The Pile subsets for
  * GPT-class pretraining. Two feature spaces: unigram (the exactness
  * reference — weight table is VOCABULARY-sized) and hashed buckets
  * ([[dsirWeightsHashed]] — the paper's fixed-bucket form and the
  * scale DEFAULT, because its weight table is bounded by the bucket
  * count no matter how large the corpus vocabulary grows).
  *
  * Scale shape (the reason DSIR beats classifier-based selection at
  * 100 TB): both distributions are ONE bounded aggregate; the weight
  * table is BROADCAST onto the corpus-scale token stream, which
  * shuffles once on (doc_id) for the per-doc sum — the corpus itself
  * is read once and never joined against itself. Selection is a
  * top-k (TakeOrdered — no full sort) or a threshold filter
  * (map-side) depending on the caller. The unigram table grows with
  * vocabulary (10⁸-10⁹ distinct tokens on raw web text — broadcast
  * death); use the hashed form beyond curated corpora.
  *
  * FP discipline (see [[Relevance]]): the ratio inside the log is a
  * quotient of EXACT integer products — (t_cnt+1)·(b_tot+V) and
  * (b_cnt+1)·(t_tot+V) are < 2^53 for any corpus whose token count
  * fits a journal page — so the double entering `ln` is bit-identical
  * on every IEEE engine; `ln` itself may differ in the last ulp
  * between libm and java.lang.Math, which the ROUND(·,4) on the
  * per-doc sum absorbs (the q1_pricing_agg convention).
  */
object Importance {

  /** The shared whitespace token stream — one definition for every
    * lane, see [[Par.tokens]].
    */
  private def toks(docs: DataFrame): DataFrame = Par.tokens(docs)

  /** Per-token log importance weight over the UNION vocabulary:
    *
    *   w(t) = ln( p̂_target(t) / p̂_base(t) )
    *        = ln( (t_cnt+1)·(b_tot+V) / ((b_cnt+1)·(t_tot+V)) )
    *
    * with add-one smoothing on both sides (V = |vocab|), so a token
    * seen only in the base corpus still gets a finite negative weight.
    * Output is vocabulary-sized: (tok, w) — broadcast it downstream.
    * Totals are computed FROM the vocab table (sum of its count
    * columns), not by re-scanning either corpus.
    */
  def dsirWeights(target: DataFrame, base: DataFrame): DataFrame = {
    val bc = toks(base).groupBy(col("tok")).agg(count(lit(1)).as("b_cnt"))
    val tc = toks(target).groupBy(col("tok")).agg(count(lit(1)).as("t_cnt"))
    val vocab = bc.join(tc, Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("b_cnt"), lit(0L)).as("b_cnt"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"))
    val tot = vocab.agg(sum(col("b_cnt")).as("b_tot"),
      sum(col("t_cnt")).as("t_tot"), count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(tot))
      .select(col("tok"),
        log(((col("t_cnt") + lit(1L)) * (col("b_tot") + col("v")))
          .cast("double") /
          ((col("b_cnt") + lit(1L)) * (col("t_tot") + col("v")))
            .cast("double")).as("w"))
  }

  /** Per-doc DSIR score: the sum of its tokens' log importance
    * weights (with multiplicity — a doc that repeats a target-loved
    * token scores higher, as the likelihood ratio dictates). Tokens
    * absent from the weight table contribute 0 (callers scoring the
    * corpus the weights were fit on never hit this; a held-out doc's
    * unseen tokens are out-of-vocabulary for BOTH distributions and
    * carry no evidence either way). The weight table is broadcast —
    * the token stream shuffles once, on (doc_id).
    */
  def dsirScores(docs: DataFrame, weights: DataFrame): DataFrame =
    toks(docs).join(broadcast(weights), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 4).as("dsir_score"))

  /** HASHED-feature DSIR weights — the paper's own scale form (Xie et
    * al. 2023 use hashed n-grams bucketed to a FIXED 10k count) and
    * the 100 TB default here: the unigram table above is VOCABULARY-
    * sized, and on raw web text distinct whitespace tokens run to
    * 10⁸-10⁹ — a broadcast that grows with the corpus and eventually
    * kills the driver. Hashing every token into one of `numBuckets`
    * buckets bounds the weight table at `numBuckets` rows FOREVER:
    * the broadcast is a fixed-size artifact no matter what corpus the
    * weights were fit on. The trade is the usual hashing-trick one —
    * colliding tokens share a weight (their likelihood evidence is
    * pooled), which the paper reports as near-neutral for selection
    * because importance mass concentrates on frequent features.
    *
    * The bucket hash is [[Dedup.md5Hash60]]'s little sibling — the
    * integer value of the first 3 hex chars of md5(token), 4096
    * buckets — so the lane is CROSS-ENGINE oracle-checkable end to
    * end (DuckDB extracts the identical hex digits; the driver's
    * mix_token_budget u16 convention at 12 bits). Smoothing and FP
    * discipline are exactly [[dsirWeights]]': add-one on both sides
    * with V = observed buckets, integer products inside ln, ROUND(4)
    * on the per-doc sum.
    */
  def bucketOf(tok: Column, numBuckets: Int): Column = {
    // the bucket is the integer value of the first log16(n) hex chars
    // of md5(token) — any engine reproduces it by extracting the same
    // digits, so the knob is honored for every power of 16 (a
    // non-power would need modulo arithmetic the oracle twins don't
    // share; refuse loudly rather than silently rehash)
    val p = (math.log(numBuckets.toDouble) / math.log(16.0)).round.toInt
    require(p >= 1 && p <= 8 &&
        BigInt(16).pow(p) == BigInt(numBuckets),
      s"bucketOf: numBuckets must be a power of 16 in [16, 16^8] " +
        s"(the hex-prefix cross-engine contract; got $numBuckets)")
    conv(substring(md5(tok), 1, p), 16, 10).cast("long")
  }

  def dsirWeightsHashed(target: DataFrame, base: DataFrame,
      numBuckets: Int = 4096): DataFrame = {
    val bc = toks(base)
      .select(bucketOf(col("tok"), numBuckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("b_cnt"))
    val tc = toks(target)
      .select(bucketOf(col("tok"), numBuckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("t_cnt"))
    val vocab = bc.join(tc, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("b_cnt"), lit(0L)).as("b_cnt"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"))
    val tot = vocab.agg(sum(col("b_cnt")).as("b_tot"),
      sum(col("t_cnt")).as("t_tot"), count(lit(1)).as("v"))
    vocab.crossJoin(broadcast(tot))
      .select(col("bucket"),
        log(((col("t_cnt") + lit(1L)) * (col("b_tot") + col("v")))
          .cast("double") /
          ((col("b_cnt") + lit(1L)) * (col("t_tot") + col("v")))
            .cast("double")).as("w"))
  }

  /** Per-doc score over hashed features: bucket each token, join the
    * BOUNDED (≤ numBuckets rows) broadcast table, sum. Same shape as
    * [[dsirScores]] with the one structural difference that matters
    * at 100 TB: the broadcast size is a constant of the OPERATOR, not
    * a function of the corpus.
    */
  def dsirScoresHashed(docs: DataFrame, weights: DataFrame,
      numBuckets: Int = 4096): DataFrame =
    toks(docs)
      .select(col("doc_id"), bucketOf(col("tok"), numBuckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 4).as("dsir_score"))

  /** Driver query `curate_dsir_hashed`: [[dsirSelect]] on the hashed
    * feature space — the selection path a 100 TB deployment runs
    * (bounded weight broadcast), full oracle via the md5-bucket
    * cross-engine hash. The unigram `curate_dsir` stays as the
    * reference lane; at driver scale the two select overlapping but
    * not identical top-100 sets (collisions pool evidence — the
    * documented trade).
    */
  def dsirSelectHashed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val weights = dsirWeightsHashed(docs.filter(col("lang") === "en"), docs)
    val top = dsirScoresHashed(docs, weights)
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(100)
    broadcast(top).join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
  }

  /** Driver query `curate_dsir`: fit weights with the English slice
    * as the target and the whole corpus as base, score every doc,
    * return the top 100 with language — the "select raw docs that
    * look like the target domain" step of a pretraining pipeline,
    * end-to-end. Deterministic: score ROUNDS before ranking and ties
    * break on doc_id.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val weights = dsirWeights(docs.filter(col("lang") === "en"), docs)
    // top-k BEFORE the metadata join: TakeOrdered bounds the rank to
    // k rows, and the 100-row winner set broadcasts back onto docs —
    // the corpus is never sorted and never joined at full width
    val top = dsirScores(docs, weights)
      .orderBy(col("dsir_score").desc, col("doc_id"))
      .limit(100)
    broadcast(top).join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id"))
  }
}
