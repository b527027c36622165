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

  test("qualityBuckets equals the literal per-domain ntile window — " +
      "ties, non-divisible sizes, and n < tiles included") {
    initLog()
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // heavy score ties (9 distinct values over 200 rows) exercise the
    // within-(domain, score) id tiebreak; the two-row domain hits the
    // n < k branch
    val rows = (0 until 200).map(i =>
      (i.toLong, s"d${rnd.nextInt(4)}", Some(rnd.nextInt(9).toLong))) ++
      Seq((900L, "tiny", Some(5L)), (901L, "tiny", Some(3L)),
        // null scores must be KEPT and ordered nulls-first, exactly
        // like the literal window (an equi-join would drop them)
        (902L, "d0", Option.empty[Long]), (903L, "d1", Option.empty[Long]))
    val df = rows.toDF("id", "dom", "score")
    val got = Curation.qualityBuckets(df, "dom", "score", "id", tiles = 3)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("dom")).orderBy(col("score"), col("id"))
    val exp = df.withColumn("nt", ntile(3).over(w)).collect()
      .map(r => (r.getLong(0), r.getInt(3).toLong)).toMap
    assert(got == exp)
    assert(got.contains(902L) && got.contains(903L))
    // n=2 < k=3: standard ntile puts one row in each of tiles 1, 2
    assert(got(901L) == 1L && got(900L) == 2L)
    // continuous scores are the broadcast trap — must refuse loudly
    val dbl = df.withColumn("score", col("score").cast("double"))
    val e = intercept[IllegalArgumentException](
      Curation.qualityBuckets(dbl, "dom", "score", "id", tiles = 3))
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("qualityBuckets refuses an integral-but-unbounded score " +
      "(ids/timestamps) above the broadcast group ceiling") {
    initLog()
    import spark.implicits._
    // an id-valued "score": every row its own (domain, score) group —
    // integral passes the type gate, but the offsets table would be
    // corpus-sized. The distinct-group ceiling must fire instead of
    // shipping the broadcast (small ceiling here; the default is 10^6).
    val df = (0 until 100).map(i => (i.toLong, "d0", i.toLong))
      .toDF("id", "dom", "score")
    val e = intercept[IllegalArgumentException](
      Curation.qualityBuckets(df, "dom", "score", "id", tiles = 3,
        maxGroups = 50L))
    assert(e.getMessage.contains("broadcast ceiling"), e.getMessage)
    // and under the ceiling the same call is fine
    assert(Curation.qualityBuckets(df, "dom", "score", "id", tiles = 3,
      maxGroups = 200L).count() == 100L)
  }
}
