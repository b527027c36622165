package graft

import org.apache.spark.sql.functions._
import graft.operators.Importance

class ImportanceSpec extends GraftSpecBase {
  import spark.implicits._

  // target loves "alpha", base is mostly "beta"; "gamma" only in base
  private val base = Seq(
    (0L, "alpha beta beta"), (1L, "beta beta gamma"),
    (2L, "beta gamma gamma"), (3L, "alpha alpha beta")
  ).toDF("doc_id", "text")
  private val target = Seq(
    (0L, "alpha beta beta"), (3L, "alpha alpha beta")
  ).toDF("doc_id", "text")

  test("dsirWeights: target-enriched token positive, target-absent negative") {
    initLog()
    val w = Importance.dsirWeights(target, base).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set("alpha", "beta", "gamma"))
    // alpha: 3/12 of base mass but 3/6 of target mass -> positive
    assert(w("alpha") > 0, s"alpha weight ${w("alpha")}")
    // gamma: never in target -> smoothed but negative
    assert(w("gamma") < 0, s"gamma weight ${w("gamma")}")
  }

  test("dsirWeights matches the closed form with add-one smoothing") {
    initLog()
    val w = Importance.dsirWeights(target, base).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // b_tot=12, t_tot=6, V=3: w(t) = ln((t_cnt+1)(12+3)/((b_cnt+1)(6+3)))
    def exp(tCnt: Long, bCnt: Long): Double =
      math.log(((tCnt + 1) * 15).toDouble / ((bCnt + 1) * 9).toDouble)
    assert(w("alpha") === exp(3, 3))
    assert(w("beta") === exp(3, 6))
    assert(w("gamma") === exp(0, 3))
  }

  test("dsirScores ranks target-like docs above base-like docs") {
    initLog()
    val w = Importance.dsirWeights(target, base)
    val scores = Importance.dsirScores(base, w).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 (alpha alpha beta) is the most target-like; doc 2
    // (beta gamma gamma) the least
    assert(scores(3L) > scores(0L))
    assert(scores(0L) > scores(2L))
    assert(scores(3L) > 0 && scores(2L) < 0)
  }

  test("scores are deterministic across re-partitionings") {
    initLog()
    val w = Importance.dsirWeights(target, base)
    val a = Importance.dsirScores(base, w).collect().sortBy(_.getLong(0))
    val b = Importance.dsirScores(base.repartition(7), w)
      .collect().sortBy(_.getLong(0))
    assert(a.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("bucketOf matches a JVM md5 reference and stays in [0, 4096)") {
    initLog()
    def ref(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 3), 16)
    }
    val toks = Seq("alpha", "beta", "gamma", "the", "z", "école")
    val got = toks.toDF("tok")
      .select(Importance.bucketOf(col("tok"), 4096).as("b"))
      .as[Long].collect().toSeq
    assert(got == toks.map(ref))
    assert(got.forall(b => b >= 0 && b < 4096))
    // any power of 16 honors the hex-prefix contract; anything else
    // is refused (it would need modulo arithmetic the oracle twins
    // don't share)
    val got256 = toks.toDF("tok")
      .select(Importance.bucketOf(col("tok"), 256).as("b"))
      .as[Long].collect().toSeq
    assert(got256 == got.map(_ >> 4), "16^2 prefix = 16^3 prefix >> 4")
    assertThrows[IllegalArgumentException](Importance.bucketOf(col("x"), 10000))
    assertThrows[IllegalArgumentException](Importance.bucketOf(col("x"), 4095))
  }

  test("hashed weight table is bounded by the bucket count, not the vocab") {
    initLog()
    // 10k distinct tokens — a vocab-sized table would be 10k rows; the
    // hashed table can never exceed 4096 (the r10 VERDICT scale trap)
    val big = (0 until 100).map { i =>
      (i.toLong, (0 until 100).map(j => s"tok_${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val w = Importance.dsirWeightsHashed(big.limit(20), big)
    assert(w.count() <= 4096L)
    // and scoring still ranks a target-heavy doc first on the tiny corpus
    val wh = Importance.dsirWeightsHashed(target, base)
    assert(wh.count() <= 4096L)
    val scores = Importance.dsirScoresHashed(base, wh).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(3L) > scores(2L),
      s"target-like doc must outrank base-like: $scores")
  }

  test("driver lane: top-100 English-target selection, scores ordered") {
    initLog()
    val out = Importance.dsirSelect(spark, sf).collect()
    assert(out.length == 100)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
    // the en-targeted selection should skew en vs the corpus base rate
    val nEn = out.count(_.getString(1) == "en")
    assert(nEn > 0)
  }
}
