package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}
import graft.sources.Tables

class CurationSpec extends GraftSpecBase {

  test("curated corpus has no exact or near duplicates left") {
    initLog()
    val docs = Tables.documents(spark, sf)
    val curated = Curation.curate(docs).cache()
    val kept = docs.join(curated.select(col("doc_id")), "doc_id").cache()
    // no two kept docs share a text
    assert(kept.groupBy(col("text")).count().filter(col("count") > 1).count() == 0)
    // no near-dup pair survives among kept docs
    assert(Dedup.ngramJaccardPairs(kept, n = 4, tau = 0.8).count() == 0)
  }

  test("split labels partition the curated set deterministically") {
    initLog()
    val c1 = Curation.curate(Tables.documents(spark, sf)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val c2 = Curation.curate(Tables.documents(spark, sf)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(c1 == c2, "pipeline must be rerun-deterministic")
    assert(c1.values.toSet.subsetOf(Set("train", "val")))
    assert(c1.values.count(_ == "train") > c1.values.count(_ == "val"))
  }
}
