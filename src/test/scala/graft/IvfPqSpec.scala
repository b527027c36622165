package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** IVF-PQ composite index (the FAISS IndexIVFPQ layout): coarse
  * nprobe pruning + residual-code compression in one index. Floors
  * follow the family convention (recall@10 vs brute force); the
  * persisted form is spec'd down to the stored reconstruction norm —
  * the one number the probe-side cosine trusts blindly.
  */
class IvfPqSpec extends GraftSpecBase {
  import spark.implicits._

  private val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0

  test("IVF-PQ recall@10 >= 0.8 on the embeddings table at the " +
      "shipped operating point") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val r = Similarity.annRecallSummary(
        Similarity.annIvfPqSearch(e, nQueries = 10, k = 10, dims0 = 64),
        Similarity.annBruteForce(e, nQueries = 10, k = 10), k = 10)
      .collect()(0).getAs[Double]("recall")
    assert(r >= 0.8, s"IVF-PQ recall@10 = $r below the 0.8 floor")
  }

  test("filtered IVF-PQ: only pred-passing neighbors, floor vs the " +
      "filtered brute force, vacuous predicate bit-equal to unfiltered") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val got = Similarity.annIvfPqSearchFiltered(e, pred,
      nQueries = 10, k = 10, dims0 = 64)
    val passing = e.where(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(r => passing(r.getLong(1))))
    val recall = Similarity.annRecallSummary(got,
      Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
      k = 10).head().getDouble(3)
    assert(recall >= 0.8, s"filtered IVF-PQ recall=$recall")
    // vacuous predicate ⟹ the same impl instance as the unfiltered
    // lane — bit-equal (same deterministic seeding, same plan)
    val vac = Similarity.annIvfPqSearchFiltered(e, lit(true),
      nQueries = 5, k = 5, dims0 = 64).collect().map(_.toSeq).toSeq
    val unf = Similarity.annIvfPqSearch(e, nQueries = 5, k = 5,
      dims0 = 64).collect().map(_.toSeq).toSeq
    assert(vac == unf)
  }

  test("persisted IVF-PQ: stored rnorm IS the reconstruction norm, " +
      "probe deterministic, refine exact, twin at cos 1.0") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq")
      .toString
    Similarity.writeIvfPqIndex(e, dir, nlist = 8, m = 16, ksub = 32,
      dims0 = 64)
    // every stored rnorm equals ‖c_list + r̂‖ recomputed from the
    // persisted centroids + codebooks directly (the decomposition
    // ‖c‖² + 2·c·r̂ + ‖r̂‖² against the assembled-vector ground truth)
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val books = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toArray))
      .toMap
    val m = books.keys.map(_._1).max + 1
    val codes = spark.read.parquet(s"$dir/codes").collect()
    assert(codes.length == e.count())
    codes.foreach { row =>
      val list = row.getAs[Int]("list")
      val cs = row.getSeq[Int](row.fieldIndex("codes"))
      val c = cents(list)
      val recon = c.clone()
      var off = 0
      (0 until m).foreach { s =>
        val sub = books((s, cs(s)))
        sub.indices.foreach(d => recon(off + d) += sub(d))
        off += sub.length
      }
      val direct = math.sqrt(recon.map(x => x * x).sum)
      val stored = row.getAs[Double]("rnorm")
      assert(math.abs(direct - stored) <= 1e-8 * math.max(1.0, direct),
        s"rnorm mismatch for vec ${row.getAs[Long]("vec_id")}: " +
          s"stored $stored vs direct $direct")
    }
    val v0 = e.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val probe = Similarity.ivfPqIndexProbe(spark, dir, v0, k = 10,
      nprobe = 4, excludeId = Some(0L)).collect()
    val probe2 = Similarity.ivfPqIndexProbe(spark, dir, v0, k = 10,
      nprobe = 4, excludeId = Some(0L)).collect()
    assert(probe.length == 10)
    assert(probe.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      probe2.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    // refined: exact cosines, descending, top of a 50-wide shortlist
    // ties-or-beats pure ADC's top pick under the TRUE metric
    val refined = Similarity.ivfPqIndexProbe(spark, dir, v0, k = 5,
      nprobe = 4, rerank = 50, refineFrom = Some(e),
      excludeId = Some(0L)).collect()
    assert(refined.length == 5)
    val cos = refined.map(_.getDouble(1)).toSeq
    assert(cos == cos.sorted.reverse)
    // append a twin of vec 0: identical vector ⟹ identical (list,
    // codes), so the refined probe returns it at rank 1, cos 1.0
    val twin = Seq((90001L, v0.toSeq)).toDF("vec_id", "embedding")
    Similarity.appendToIvfPqIndex(twin, dir, dims0 = 64)
    val raw = e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      .unionByName(twin)
    val after = Similarity.ivfPqIndexProbe(spark, dir, v0, k = 3,
      nprobe = 4, rerank = 50, refineFrom = Some(raw),
      excludeId = Some(0L)).collect()
    assert(after.head.getLong(0) == 90001L &&
      after.head.getDouble(1) == 1.0,
      s"appended twin not found at cos 1.0: ${after.toSeq}")
  }

  test("synthetic fixture: recall floor holds off the shipped corpus " +
      "(dims=16, m=8 — a different geometry than the driver tables)") {
    initLog()
    val rows = (0 until 160).map { i =>
      val v = Array.tabulate(16)(d =>
        (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat)
      (i.toLong, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
    val r = Similarity.annRecallSummary(
        Similarity.annIvfPqSearch(e, nQueries = 5, k = 10, nlist = 8,
          nprobe = 5, m = 8, ksub = 16, rerank = 30, dims0 = 16),
        Similarity.annBruteForce(e, nQueries = 5, k = 10), k = 10)
      .collect()(0).getAs[Double]("recall")
    assert(r >= 0.8, s"synthetic IVF-PQ recall@10 = $r")
  }
}
