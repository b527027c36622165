package graft

import org.apache.spark.sql.functions._
import graft.operators.Classifier

class ClassifierSpec extends GraftSpecBase {
  import spark.implicits._

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  // two labels with distinctive vocabularies sharing one common token
  private val seed = Seq(
    (0L, "good", "alpha alpha bridge"),
    (1L, "good", "alpha alpha alpha"),
    (2L, "spam", "zeta zeta bridge"),
    (3L, "spam", "zeta zeta zeta")
  ).toDF("doc_id", "label", "text")

  test("nbWeights matches the add-one closed form on a dense grid") {
    initLog()
    val w = Classifier.nbWeights(seed, "label").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // vocab = {alpha, bridge, zeta} (V=3); each label: tot=6 tokens,
    // n_docs=2 of N=4
    assert(w.keySet ==
      (for (l <- Set("good", "spam"); f <- Set("alpha", "bridge", "zeta"))
        yield (l, f)))
    def exp(c: Long): Double = math.log((c + 1).toDouble / 9.0)
    assert(w(("good", "alpha"))._1 == exp(5))
    assert(w(("good", "bridge"))._1 == exp(1))
    assert(w(("good", "zeta"))._1 == exp(0)) // dense: never-seen floor
    assert(w(("spam", "zeta"))._1 == exp(5))
    val lp = math.log(2.0 / 4.0)
    assert(w.values.forall(_._2 == lp))
  }

  test("nbPredict: distinctive docs classify to their label with margin") {
    initLog()
    val weights = Classifier.nbWeights(seed, "label")
    val got = Classifier.nbPredict(seed.drop("label"), weights).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got(0L)._1 == "good" && got(1L)._1 == "good")
    assert(got(2L)._1 == "spam" && got(3L)._1 == "spam")
    assert(got.values.forall(_._3 > 0), s"margins: $got")
    // closed-form score for doc 1 (alpha ×3) under "good":
    // 3·ln(6/9) + ln(2/4), rounded like the operator
    val expScore = r4(3 * math.log(6.0 / 9.0) + math.log(0.5))
    assert(got(1L)._2 == expScore, s"${got(1L)._2} vs $expScore")
    // and its margin vs "spam": 3·(ln(6/9) − ln(1/9)) after per-label
    // rounding
    val spamScore = r4(3 * math.log(1.0 / 9.0) + math.log(0.5))
    assert(got(1L)._3 == r4(expScore - spamScore))
  }

  test("nbPredict ties break to the lexicographically larger label") {
    initLog()
    val sym = Seq((0L, "x", "tok"), (1L, "y", "tok"))
      .toDF("doc_id", "label", "text")
    val got = Classifier.nbPredict(sym.drop("label"),
      Classifier.nbWeights(sym, "label")).collect()
    assert(got.forall(_.getString(1) == "y"))
    assert(got.forall(_.getDouble(3) == 0.0)) // exact score tie
  }

  test("out-of-vocabulary tokens carry no ranking evidence") {
    initLog()
    val weights = Classifier.nbWeights(seed, "label")
    val plain = Seq((10L, "alpha bridge")).toDF("doc_id", "text")
    val noisy = Seq((10L, "alpha bridge qqqq zzzz")).toDF("doc_id", "text")
    val a = Classifier.nbPredict(plain, weights).collect().head
    val b = Classifier.nbPredict(noisy, weights).collect().head
    assert(a.getString(1) == b.getString(1))
    assert(a.getDouble(2) == b.getDouble(2)) // identical score
  }

  test("nbFilter keeps only the target label above the margin floor") {
    initLog()
    val weights = Classifier.nbWeights(seed, "label")
    val docs = Seq(
      (20L, "alpha alpha alpha"), // clearly good
      (21L, "zeta zeta"),         // clearly spam
      (22L, "bridge")             // shared token only: score tie
    ).toDF("doc_id", "text")
    val kept = Classifier.nbFilter(docs, weights, "good", minMargin = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(20L))
    // margin floor 0 still drops the tie doc (pred resolves to "spam",
    // the larger label)
    val kept0 = Classifier.nbFilter(docs, weights, "good", minMargin = 0.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept0 == Set(20L))
  }

  test("hashed features classify the fixture identically at 4096 buckets") {
    initLog()
    val weights = Classifier.nbWeightsHashed(seed, "label")
    assert(weights.select("feat").distinct().count() == 3) // no collisions
    val got = Classifier.nbPredict(seed.drop("label"), weights,
      Classifier.hexBucket(_, 3)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "good", 1L -> "good",
      2L -> "spam", 3L -> "spam"))
  }

  test("no-evidence docs (all-OOV or empty) get no prediction row " +
      "and nbFilter drops them") {
    initLog()
    val weights = Classifier.nbWeights(seed, "label")
    val docs = Seq(
      (30L, "alpha"),     // in-vocab: predicted
      (31L, "qqqq zzzz"), // every token OOV: no evidence
      (32L, " ")          // no tokens at all
    ).toDF("doc_id", "text")
    val preds = Classifier.nbPredict(docs, weights)
      .select("doc_id").as[Long].collect().toSet
    assert(preds == Set(30L), "only the evidenced doc predicts")
    val kept = Classifier.nbFilter(docs, weights, "good")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(30L))
  }

  test("scoring join broadcasts the weight table (no corpus-side SMJ)") {
    initLog()
    val weights = Classifier.nbWeights(seed, "label")
    val plan = Classifier.nbPredict(seed.drop("label"), weights)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
