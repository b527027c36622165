package graft

import org.apache.spark.sql.functions._
import graft.operators.{Hnsw, Similarity}

/** Filtered ANN search (r13 stretch item 9): a predicate applied
  * DURING retrieval — IVF pushes it into the list scan before top-k,
  * HNSW navigates unfiltered with a selectivity-widened beam and
  * filters the final beam. Floors under a 50 %-selectivity predicate
  * sit at the unfiltered bar.
  */
class FilteredAnnSpec extends GraftSpecBase {
  import spark.implicits._

  private val pred = pmod(xxhash64(col("vec_id")), lit(2L)) === 0

  private def synth(n: Int, dims: Int = 16) = {
    val rows = (0 until n).map { i =>
      val v = Array.tabulate(dims)(d =>
        (math.sin(i * 131 + d * 31) + math.cos(i * 17 - d * 7)).toFloat)
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("filtered brute force returns only pred-passing neighbors and " +
      "is the unfiltered top-k when the predicate is vacuous") {
    initLog()
    val e = synth(120)
    val got = Similarity.annBruteForceFiltered(e, pred,
      nQueries = 5, k = 10).collect()
    assert(got.length == 50)
    // every returned neighbor passes the predicate
    val passing = e.where(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.forall(r => passing(r.getLong(1))))
    // vacuous predicate ⟹ bit-equal to the unfiltered brute force
    val vac = Similarity.annBruteForceFiltered(e, lit(true),
      nQueries = 5, k = 10).collect().map(_.toSeq).toSeq
    val unf = Similarity.annBruteForce(e, nQueries = 5, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(vac == unf)
  }

  test("filtered IVF: only pred-passing neighbors, recall floor >= " +
      "0.8 at the measured operating point on the embeddings table") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val got = Similarity.annIvfSearchFiltered(e, pred,
      nQueries = 10, k = 10, dims0 = 64)
    val passing = e.where(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(r => passing(r.getLong(1))))
    val recall = Similarity.annRecallSummary(got,
      Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
      k = 10).head().getDouble(3)
    assert(recall >= 0.8, s"filtered IVF recall=$recall")
  }

  test("filtered HNSW: only pred-passing neighbors, recall floor >= " +
      "0.8 on synthetic corpus and the embeddings table") {
    initLog()
    for (e <- Seq(synth(400),
        graft.sources.Tables.embeddings(spark, sf)
          .select(col("vec_id"), col("embedding")))) {
      val dims = e.select(size(col("embedding"))).head().getInt(0)
      val got = Hnsw.annHnswSearchFiltered(e, pred,
        nQueries = 5, k = 10, dims0 = dims)
      val passing = e.where(pred).select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val rows = got.collect()
      assert(rows.nonEmpty && rows.forall(r => passing(r.getLong(1))))
      val recall = Similarity.annRecallSummary(got,
        Similarity.annBruteForceFiltered(e, pred, nQueries = 5, k = 10),
        k = 10).head().getDouble(3)
      assert(recall >= 0.8, s"filtered HNSW recall=$recall dims=$dims")
    }
  }

  test("unfiltered lanes are untouched by the refactor: annIvfSearch " +
      "== annIvfSearchFiltered(lit(true)) bit-for-bit") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val a = Similarity.annIvfSearch(e, nQueries = 5, k = 5, dims0 = 64)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.annIvfSearchFiltered(e, lit(true),
      nQueries = 5, k = 5, dims0 = 64).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("filtered LSH: only pred-passing neighbors, recall floor >= " +
      "0.8 at Hamming-2 probes on the embeddings table") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val got = Similarity.annLshSearchFiltered(e, pred,
      nQueries = 10, k = 10, dims0 = 64)
    val passing = e.where(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(r => passing(r.getLong(1))))
    val recall = Similarity.annRecallSummary(got,
      Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
      k = 10).head().getDouble(3)
    assert(recall >= 0.8, s"filtered LSH recall=$recall")
  }

  test("filtered PQ: only pred-passing neighbors, recall floor >= " +
      "0.8 (exhaustive ADC + refine, no widening) on the embeddings " +
      "table") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val got = Similarity.annPqSearchFiltered(e, pred,
      nQueries = 10, k = 10, dims0 = 64)
    val passing = e.where(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(r => passing(r.getLong(1))))
    val recall = Similarity.annRecallSummary(got,
      Similarity.annBruteForceFiltered(e, pred, nQueries = 10, k = 10),
      k = 10).head().getDouble(3)
    assert(recall >= 0.8, s"filtered PQ recall=$recall")
  }

  test("persisted probes take the predicate: only passing neighbors " +
      "come back, the vacuous predicate is bit-equal, and the IVF " +
      "probe at nprobe=nlist matches the exact filtered top-k") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val p2 = pmod(col("vec_id"), lit(2L)) === 0
    val qv = e.filter(col("vec_id") === 1L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val base = java.nio.file.Files
      .createTempDirectory("graft-probe-filter").toString
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq

    Similarity.writeIvfIndex(e, s"$base/ivf", nlist = 8)
    val ivf = Similarity.ivfIndexProbe(spark, s"$base/ivf", qv, k = 5,
      nprobe = 8, pred = p2)
    assert(rows(ivf).forall(r => r.head.asInstanceOf[Long] % 2 == 0))
    // nprobe = nlist scans every list ⟹ exact top-k among passing
    val expected = spark.read.parquet(s"$base/ivf/corpus").where(p2)
      .select(col("vec_id").as("neighbor_id"),
        round(graft.functions.Vectors.cosine(col("embedding"),
          typedLit(qv)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("neighbor_id")).limit(5)
    assert(rows(ivf) == rows(expected))
    assert(rows(Similarity.ivfIndexProbe(spark, s"$base/ivf", qv,
        k = 5, nprobe = 4)) ==
      rows(Similarity.ivfIndexProbe(spark, s"$base/ivf", qv, k = 5,
        nprobe = 4, pred = lit(true))))

    Similarity.writeLshIndex(e, s"$base/lsh", planes = 5, tables = 3,
      dims0 = 64)
    val lsh = Similarity.lshIndexProbe(spark, s"$base/lsh", qv, k = 5,
      planes = 5, tables = 3, pred = p2)
    assert(rows(lsh).nonEmpty &&
      rows(lsh).forall(r => r.head.asInstanceOf[Long] % 2 == 0))
    assert(rows(Similarity.lshIndexProbe(spark, s"$base/lsh", qv,
        k = 5, planes = 5, tables = 3)) ==
      rows(Similarity.lshIndexProbe(spark, s"$base/lsh", qv, k = 5,
        planes = 5, tables = 3, pred = lit(true))))

    Similarity.writePqIndex(e, s"$base/pq", m = 16, ksub = 32)
    val pq = Similarity.pqIndexProbe(spark, s"$base/pq", qv, k = 5,
      pred = p2)
    assert(rows(pq).nonEmpty &&
      rows(pq).forall(r => r.head.asInstanceOf[Long] % 2 == 0))
    assert(rows(Similarity.pqIndexProbe(spark, s"$base/pq", qv, k = 5)) ==
      rows(Similarity.pqIndexProbe(spark, s"$base/pq", qv, k = 5,
        pred = lit(true))))
  }

  test("unfiltered LSH/PQ lanes untouched by the refactor: vacuous " +
      "predicate at the unfiltered probe radius is bit-equal") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val lshA = Similarity.annLshSearch(e, nQueries = 5, k = 5, dims0 = 64)
      .collect().map(_.toSeq).toSeq
    val lshB = Similarity.annLshSearchFiltered(e, lit(true),
        nQueries = 5, k = 5, dims0 = 64, probeRadius = 1)
      .collect().map(_.toSeq).toSeq
    assert(lshA == lshB)
    val pqA = Similarity.annPqSearch(e, nQueries = 5, k = 5, dims0 = 64)
      .collect().map(_.toSeq).toSeq
    val pqB = Similarity.annPqSearchFiltered(e, lit(true),
        nQueries = 5, k = 5, dims0 = 64).collect().map(_.toSeq).toSeq
    assert(pqA == pqB)
  }
}
