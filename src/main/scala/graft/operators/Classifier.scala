package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Model-based quality/domain classification — the multinomial Naive
  * Bayes form of the "train a cheap linear classifier, keep docs it
  * likes" curation step every modern pretraining pipeline runs:
  * CCNet's fastText language/quality filter (Wenzek et al. 2020),
  * GPT-3's WebText-vs-CommonCrawl logistic filter (Brown et al. 2020
  * §A), FineWeb-Edu's educational-value classifier. NB is the
  * deterministic member of that family — its "training" is two
  * bounded aggregations (per-(label, feature) counts and per-label
  * totals), so the whole train+score+predict flow is reproducible
  * bit-for-bit and DuckDB-oracle-checkable, unlike SGD-trained
  * weights.
  *
  * Scale shape (same skeleton as [[Importance]], which is the
  * two-class importance-ratio special case of this): the model is ONE
  * aggregate over the labeled seed; scoring BROADCASTS the weight
  * table onto the corpus token stream, which shuffles once on
  * (doc_id, label) then once on (doc_id) for the argmax — the corpus
  * is read once and never self-joined. The unigram weight table is
  * (vocabulary × labels)-sized — fine for curated seeds, broadcast
  * death on raw-web vocabularies (10⁸⁻⁹ distinct tokens) — so the
  * 100 TB default is the HASHED feature space ([[nbWeightsHashed]]):
  * md5-hex-prefix buckets bound the table at numBuckets·|labels| rows
  * forever, the hashing-trick trade the fastText paper itself ships
  * (Joulin et al. 2016 use hashed bigrams for exactly this reason).
  *
  * FP discipline (the [[Importance]] doctrine): every weight is
  * ln((cnt+1)/(tot+V)) — an exact-integer ratio through one
  * correctly-rounded division, so the double entering `ln` is
  * bit-identical on every IEEE engine; per-doc sums are bounded by
  * doc token count, ROUND(·,4) absorbs the ≤ terms·ulp divergence;
  * the ARGMAX runs on the already-rounded score with a label
  * tie-break, so the prediction is deterministic cross-engine too.
  *
  * Reference scope: flink-wikipedia has no classifier (its filter is
  * a literal bot/namespace predicate, DataStreamJob.java:60-66); this
  * generalizes that "keep the good docs" step to a learned filter.
  */
object Classifier {

  /** The shared whitespace token stream — one definition for every
    * lane, see [[Par.tokens]].
    */
  private def toks(docs: DataFrame, extra: Column*): DataFrame =
    Par.tokens(docs, extra: _*)

  /** Identity feature (the unigram reference lane). */
  private val unigram: Column => Column = identity

  /** Hashed feature: the first `p` hex chars of md5(tok) — 16^p
    * buckets as a STRING key, the [[Importance.bucketOf]] convention
    * minus the base conversion (the bucket id never leaves the join
    * key, so the hex prefix itself is the cleanest cross-engine
    * form: `substr(md5(tok), 1, p)` is identical in DuckDB).
    */
  def hexBucket(tok: Column, hexChars: Int): Column = {
    require(hexChars >= 1 && hexChars <= 8,
      s"hexBucket: hexChars must be in [1,8] (got $hexChars)")
    substring(md5(tok), 1, hexChars)
  }

  /** Train: dense (label, feat, w, lp) weight grid from a labeled
    * seed.
    *
    *   w(l,t)  = ln( (cnt(l,t)+1) / (tot(l)+V) )   add-one smoothing
    *   lp(l)   = ln( n_docs(l) / N )               log prior
    *
    * The grid is DENSE over (observed vocabulary × labels) — a
    * feature a label never saw still gets its smoothed floor weight,
    * which is what makes scoring a single broadcast-join (no per-pair
    * existence checks downstream). V = |observed vocabulary|, shared
    * across labels. Output is |vocab|·|labels| rows for the unigram
    * form — bounded at numBuckets·|labels| for the hashed form, which
    * is why that one is the scale default.
    */
  def nbWeights(train: DataFrame, labelCol: String,
      feature: Column => Column = unigram): DataFrame = {
    val tk = toks(train, col(labelCol).as("label"))
      .select(col("label"), feature(col("tok")).as("feat"))
    val cnt = tk.groupBy(col("label"), col("feat"))
      .agg(count(lit(1)).as("c"))
    val labels = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val tots = cnt.groupBy(col("label")).agg(sum(col("c")).as("tot"))
    val vocab = cnt.select(col("feat")).distinct()
    val consts = vocab.agg(count(lit(1)).as("v"))
      .crossJoin(labels.agg(sum(col("n_docs")).as("n")))
    // dense grid: labels × vocab (labels side is tiny — broadcast it
    // so the grid build is a map-side expansion of the vocab scan)
    vocab.crossJoin(broadcast(labels.join(tots, Seq("label"))))
      .join(cnt.hint("shuffle_hash"), Seq("label", "feat"), "left")
      .crossJoin(broadcast(consts))
      .select(col("label"), col("feat"),
        log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double") /
          (col("tot") + col("v")).cast("double")).as("w"),
        log(col("n_docs").cast("double") / col("n")).as("lp"))
  }

  /** Hashed-feature train — the bounded-table 100 TB default.
    * 16^hexChars buckets (default 3 → 4096, the mix_token_budget
    * 12-bit convention); colliding tokens pool their evidence, the
    * documented hashing-trick trade.
    */
  def nbWeightsHashed(train: DataFrame, labelCol: String,
      hexChars: Int = 3): DataFrame =
    nbWeights(train, labelCol, hexBucket(_, hexChars))

  /** Score + predict: per-doc argmax over labels.
    *
    * Plan: token stream → broadcast-join the weight grid on feat
    * (each token fans out to |labels| weighted rows — the constant-
    * factor expansion every NB scorer pays) → one shuffle on
    * (doc_id, label) for the score sums → one shuffle on (doc_id)
    * for the argmax window. Tokens outside the training vocabulary
    * drop (inner join): they are OOV for every label and carry no
    * ranking evidence — the [[Importance.dsirScores]] convention.
    *
    * Output: (doc_id, pred, score, margin) — pred is the argmax label
    * on the ROUNDED score (ties break to the lexicographically larger
    * label, deterministically cross-engine), margin = score gap to
    * the runner-up (NULL when only one label exists), the number a
    * quality-filtering caller thresholds on.
    *
    * Docs with NO in-vocabulary token (empty text, or every token
    * OOV) get NO output row at all — the classifier has no evidence
    * and declines to predict, rather than emitting a priors-only
    * argmax that would mislabel every empty doc with the majority
    * class. [[nbFilter]] therefore DROPS such docs (spec'd); a caller
    * who wants them kept should anti-join `docs` against the
    * predictions and route the remainder by policy.
    */
  def nbPredict(docs: DataFrame, weights: DataFrame,
      feature: Column => Column = unigram): DataFrame = {
    val sc = toks(docs)
      .select(col("doc_id"), feature(col("tok")).as("feat"))
      .join(broadcast(weights), Seq("feat"))
      .groupBy(col("doc_id"), col("label"))
      .agg(round(sum(col("w")) + max(col("lp")), 4).as("score"))
    val byScore = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("label").desc)
    sc.withColumn("rn", row_number().over(byScore))
      .withColumn("s2", lead(col("score"), 1).over(byScore))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("score"),
        round(col("score") - col("s2"), 4).as("margin"))
  }

  /** The curation step itself: keep docs the classifier assigns
    * `keepLabel` with at least `minMargin` of score separation — the
    * "documents the WebText classifier scores high" filter of Brown
    * et al. 2020, deterministic edition. Margin-null docs (single-
    * label model) pass on label alone; no-evidence docs (no
    * in-vocabulary token) have no prediction row and are dropped —
    * see [[nbPredict]].
    */
  def nbFilter(docs: DataFrame, weights: DataFrame, keepLabel: String,
      minMargin: Double = 0.0,
      feature: Column => Column = unigram): DataFrame = {
    val keep = nbPredict(docs, weights, feature)
      .filter(col("pred") === keepLabel &&
        (col("margin").isNull || col("margin") >= minMargin))
      .select(col("doc_id"))
    docs.join(keep, Seq("doc_id"))
  }

  /** Driver query `curate_classifier`: train on the corpus with
    * `source` as the label (the "which pipeline produced this doc"
    * signal a mixture auditor classifies on), predict every doc
    * in-sample, emit (doc_id, pred_source, score, margin). Unigram
    * features — the exactness reference; full DuckDB oracle.
    */
  def classifierSelect(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    nbPredict(docs, nbWeights(docs, "source"))
      .select(col("doc_id"), col("pred").as("pred_source"),
        col("score"), col("margin"))
    // no trailing sort (r17): presentation-only, and its sampling
    // pass re-ran the train+score chain a second time per run
  }

  /** Driver query `curate_classifier_hashed`: the same flow on 4096
    * md5-hex-prefix buckets — the bounded-weight-table path a 100 TB
    * deployment runs, still a full cross-engine oracle because DuckDB
    * extracts the identical hex digits.
    */
  def classifierSelectHashed(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // ONE width for train and score: a mismatch would make the feat
    // join match nothing and the lane silently emit zero rows
    val hexChars = 3
    nbPredict(docs, nbWeightsHashed(docs, "source", hexChars),
      hexBucket(_, hexChars))
      .select(col("doc_id"), col("pred").as("pred_source"),
        col("score"), col("margin"))
    // no trailing sort (r17): see classifierSelect
  }
}
