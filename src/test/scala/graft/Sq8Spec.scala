package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** SQ8 scalar-quantization family: quantization exactness, recall
  * floors (unfiltered + filtered), persisted-index probe parity,
  * append + clamp drift behavior.
  */
class Sq8Spec extends GraftSpecBase {
  import spark.implicits._

  private def synth(ids: Range, dims: Int = 16) = {
    val rows = ids.map { i =>
      val v = Array.tabulate(dims)(d =>
        (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("sq8Encode: per-component error bounded by half a step, " +
      "clamp binds only out of range, round-trip via dequantize") {
    initLog()
    val e = synth(0 until 50)
    val scale = Similarity.sq8Scale(e)
    val codes = Similarity.sq8Encode(e, scale, 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val raw = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble)).toMap
    raw.foreach { case (id, v) =>
      v.zip(codes(id)).foreach { case (x, c) =>
        assert(c >= -127 && c <= 127)
        assert(math.abs(c / scale - x) <= 0.5 / scale + 1e-12,
          s"vec $id: $x quantized to $c at scale $scale")
      }
    }
    // clamp: encoding a frame against a DELIBERATELY small scale
    // (calibrated elsewhere) saturates at ±127 instead of overflowing
    val wild = Seq((999L, Seq(1000.0f, -1000.0f) ++
      Seq.fill(14)(0.0f))).toDF("vec_id", "embedding")
    val c = Similarity.sq8Encode(wild, scale, 16).collect()(0).getSeq[Int](1)
    assert(c(0) == 127 && c(1) == -127, c)
  }

  test("annSq8Search: refined recall at the exact bar on the " +
      "embeddings table; filtered variant returns only passing " +
      "neighbors and holds the floor; unfiltered is the lit(true) " +
      "instance") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val r = Similarity.annRecallSummary(
        Similarity.annSq8Search(e, nQueries = 10, k = 10, rerank = 50,
          dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
      .collect()(0).getAs[Double]("recall")
    // int8 on 64-dim real-valued embeddings is near-lossless, and the
    // exact-refine stage ranks survivors exactly — the floor sits at
    // the family bar with wide margin
    assert(r >= 0.9, s"sq8 refined recall@10 = $r")
    val pred = pmod(col("vec_id"), lit(2L)) === 0
    val filtered = Similarity.annSq8SearchFiltered(e, pred,
      nQueries = 10, k = 10, rerank = 50, dims0 = 64).collect()
    assert(filtered.forall(_.getLong(1) % 2 == 0),
      "filtered sq8 returned a non-passing neighbor")
    val rf = Similarity.annRecallSummary(
        Similarity.annSq8SearchFiltered(e, pred, nQueries = 10, k = 10,
          rerank = 50, dims0 = 64),
        Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
        k = 10).collect()(0).getAs[Double]("recall")
    assert(rf >= 0.9, s"filtered sq8 recall@10 = $rf")
    // bit-parity: unfiltered == lit(true) filtered
    val a = Similarity.annSq8Search(e, dims0 = 64)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.annSq8SearchFiltered(e, lit(true), dims0 = 64)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("persisted sq8 index: probe parity with the in-memory lane, " +
      "append encodes with the stored scale, out-of-range appends " +
      "clamp but stay findable under exact refine") {
    initLog()
    val e = synth(0 until 120)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-sq8").toString
    Similarity.writeSq8Index(e, tmp, dims0 = 16)
    // probe (with refine) equals the in-memory refined search for a
    // corpus query
    val inMem = Similarity.annSq8Search(e, nQueries = 3, k = 5,
        rerank = 20, dims0 = 16)
      .filter(col("query_id") === 1L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getDouble(3)))
    val qv = e.filter(col("vec_id") === 1L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val probe = Similarity.sq8IndexProbe(spark, tmp, qv, k = 5,
        rerank = 20, refineFrom = Some(e), excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(probe.toSeq == inMem.toSeq,
      s"probe ${probe.toSeq} != in-memory ${inMem.toSeq}")
    // codes-only probe (no refine) is deterministic and ranked
    val p1 = Similarity.sq8IndexProbe(spark, tmp, qv, k = 5,
      excludeId = Some(1L)).collect().map(_.toSeq).toSeq
    val p2 = Similarity.sq8IndexProbe(spark, tmp, qv, k = 5,
      excludeId = Some(1L)).collect().map(_.toSeq).toSeq
    assert(p1 == p2 && p1.length == 5)
    // append a twin of vec 1: identical codes, refined probe returns
    // it at rank 1 cos 1.0
    val twin = Seq((9001L, qv.map(_.toFloat))).toDF("vec_id", "embedding")
    Similarity.appendToSq8Index(twin, tmp)
    val raw = e.unionByName(twin)
    val after = Similarity.sq8IndexProbe(spark, tmp, qv, k = 3,
        rerank = 20, refineFrom = Some(raw), excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(after.head == ((9001L, 1.0)), after.toSeq)
    // out-of-range append clamps (codes saturate) yet the DIRECTION
    // survives: a scaled-up twin still surfaces in the shortlist and
    // exact refine scores it correctly
    val big = Seq((9002L, qv.map(x => (x * 50).toFloat)))
      .toDF("vec_id", "embedding")
    Similarity.appendToSq8Index(big, tmp)
    val codes9002 = spark.read.parquet(s"$tmp/codes")
      .filter(col("vec_id") === 9002L).collect()(0).getSeq[Int](1)
    assert(codes9002.exists(c => c == 127 || c == -127),
      s"expected clamped components: $codes9002")
    val raw2 = raw.unionByName(big)
    val after2 = Similarity.sq8IndexProbe(spark, tmp, qv, k = 3,
        rerank = 20, refineFrom = Some(raw2), excludeId = Some(1L))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(after2.map(_._1).contains(9002L),
      s"clamped append not findable: ${after2.toSeq}")
  }
}
