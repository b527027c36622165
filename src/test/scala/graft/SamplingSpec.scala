package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.sources.Tables

class SamplingSpec extends GraftSpecBase {
  import spark.implicits._

  test("hash sample is a stable subset: membership survives corpus growth") {
    initLog()
    val docs = Tables.documents(spark, sf)
    val half = docs.filter(col("doc_id") < 250)
    val sampledHalf = Sampling.hashSample(half, "doc_id", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sampledFull = Sampling.hashSample(docs, "doc_id", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every id sampled from the half-corpus is still sampled from the
    // full corpus — holdouts never churn as data arrives
    assert(sampledHalf.subsetOf(sampledFull))
    assert(sampledHalf == sampledFull.filter(_ < 250))
  }

  test("stratified sample: per-stratum rates, stable membership, default rate") {
    initLog()
    val docs = Tables.documents(spark, sf)
    val rates = Map("en" -> 4, "zh" -> 16, "es" -> 8)
    val s = Sampling.stratifiedSample(docs, "doc_id", "lang", rates)
    val kept = s.select("doc_id").collect().map(_.getLong(0)).toSet
    // rate-16 stratum keeps everything
    val zhAll = docs.filter(col("lang") === "zh")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(zhAll.subsetOf(kept))
    // per-stratum membership == plain hashSample at that stratum's rate
    val enHash = Sampling.hashSample(
        docs.filter(col("lang") === "en"), "doc_id", 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val enKept = s.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(enKept == enHash)
    // strata not in the map keep the default (16 = all)
    val frAll = docs.filter(!col("lang").isin("en", "zh", "es"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(frAll.subsetOf(kept))
  }

  test("fluency score ranks planted gibberish below natural docs") {
    initLog()
    val natural = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val gibberish = Seq((100L, "qxzj wvkq zzxq jqxv kzwq xqzj vqkx zjqw"))
    val docs = (natural ++ gibberish).toDF("doc_id", "text")
    val scores = graft.operators.TextAnalysis.fluencyScores(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naturalMin = natural.map(n => scores(n._1)).min
    assert(scores(100L) < naturalMin,
      s"gibberish ${scores(100L)} not below natural min $naturalMin")
  }

  test("fluencyMargin: planted gibberish sits >= 3 bits below real text") {
    initLog()
    // the rows-checked summary signal for the fluency lane: the floor
    // is the per-round hard signal, in micro-bits (10^6 = one bit of
    // mean bigram code length) — planted docs bottom out at the
    // bitlen(T)+8 out-of-profile floor, real text reuses cheap
    // in-profile bigrams
    val row = graft.operators.TextAnalysis.fluencyMargin(spark, sf)
      .collect()(0)
    assert(row.getAs[Double]("margin") >= 3e6,
      s"margin = ${row.getAs[Double]("margin")}")
    assert(row.getAs[Long]("n_planted") == 50L)
    assert(row.getAs[Long]("n_real") ==
      Tables.documents(spark, sf).count())
  }

  test("train/val split partitions every row, rates roughly honored") {
    initLog()
    val split = Sampling.trainValSplit(Tables.documents(spark, sf), "doc_id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == Tables.documents(spark, sf).count())
    val trainFrac = counts.getOrElse("train", 0L).toDouble / total
    assert(trainFrac > 0.75 && trainFrac < 0.98, s"train frac $trainFrac")
  }

  test("sixteenths=0 and 16 are empty/full") {
    initLog()
    val d = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    assert(Sampling.hashSample(d, "doc_id", 0).count() == 0)
    assert(Sampling.hashSample(d, "doc_id", 16).count() == 2)
  }

  test("weighted sample: boundary weights, monotonicity, rate tracks weight") {
    initLog()
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    assert(Sampling.weightedSample(docs, "doc_id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0)).count() == n)
    assert(Sampling.weightedSample(docs, "doc_id", lit(7.5)).count() == n,
      "weights clamp to [0,1]")
    // raising the weight only ever ADDS rows (u16 is fixed per id)
    val at3 = Sampling.weightedSample(docs, "doc_id", lit(0.3))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at7 = Sampling.weightedSample(docs, "doc_id", lit(0.7))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(at3.subsetOf(at7))
    // constant weight w keeps ~w of the corpus
    val frac = at3.size.toDouble / n
    assert(frac > 0.22 && frac < 0.38, s"keep rate $frac at w=0.3")
  }

  test("fixedSample: exactly k, hash-ranked, partition-invariant") {
    initLog()
    val ids = (0L until 200L).toDF("doc_id")
    val expect = (0L until 200L)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .take(7).toSet
    for (parts <- Seq(1, 7)) {
      val got = graft.operators.Sampling
        .fixedSample(ids.repartition(parts), "doc_id", 7)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"at $parts partitions")
    }
  }
}
