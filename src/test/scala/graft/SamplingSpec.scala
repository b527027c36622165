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
}
