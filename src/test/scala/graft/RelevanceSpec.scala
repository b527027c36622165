package graft

import org.apache.spark.sql.functions._
import graft.operators.Relevance

class RelevanceSpec extends GraftSpecBase {
  import spark.implicits._

  // 4 docs, hand-computable counts: "x" appears in 1 doc (rare),
  // "common" in all 4.
  private val docs = Seq(
    (0L, "common x x common"),
    (1L, "common other other"),
    (2L, "common other"),
    (3L, "common")).toDF("doc_id", "text")

  private def idf(n: Long, df: Long): Double =
    (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)

  test("tfidf ranks a doc's rare term above the ubiquitous one") {
    initLog()
    val rows = Relevance.tfidfKeywords(docs, k = 2)
      .filter(col("doc_id") === 0L)
      .orderBy(col("rk"))
      .select(col("tok"), col("tf"), col("df"), col("tfidf"))
      .collect()
    // doc 0: x tf=2 df=1 -> 2 * (4-1+.5)/1.5 = 14/3; common tf=2 df=4
    assert(rows.map(_.getString(0)).toSeq == Seq("x", "common"))
    assert(rows(0).getLong(1) == 2L && rows(0).getLong(2) == 1L)
    assert(math.abs(rows(0).getDouble(3) - 2.0 * idf(4, 1)) < 1e-6)
  }

  test("tfidf emits exactly min(k, |doc vocabulary|) rows per doc") {
    initLog()
    val counts = Relevance.tfidfKeywords(docs, k = 2)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("bm25 favors the doc where the query term is dense, ties by id") {
    initLog()
    // "x" query: only doc 0 contains it; score must be positive and
    // the result exactly one row.
    val hit = Relevance.bm25Search(docs, Seq("x"), k = 10).collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 0L)
    assert(hit(0).getDouble(1) > 0.0)
    // "common" hits every doc; shorter docs rank higher (bm25 length
    // normalization) — doc 3 (dl=1) must beat doc 0 (dl=4, tf=2 but
    // saturated by k1 and penalized by dl).
    val all = Relevance.bm25Search(docs, Seq("common"), k = 10)
      .select(col("doc_id")).as[Long].collect()
    assert(all.length == 4)
    assert(all.head == 3L, s"expected shortest doc first, got ${all.toSeq}")
  }

  test("bm25 hand-check: single-term score matches the closed form") {
    initLog()
    val r = Relevance.bm25Search(docs, Seq("x"), k = 1).collect()(0)
    val (k1, b) = (1.5, 0.75)
    val (tf, dl, n, df) = (2.0, 4.0, 4L, 1L)
    val avgdl = (4 + 3 + 2 + 1).toDouble / 4.0
    val expected = idf(n, df) * (tf * (k1 + 1.0)) /
      (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    assert(math.abs(r.getDouble(1) - expected) < 1e-6)
  }

  test("postings head is doc-id ascending and capped at sampleK") {
    initLog()
    val idx = Relevance.postings(docs, sampleK = 3)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(idx("common") == ((4L, 5L, "0,1,2")))
    assert(idx("x") == ((1L, 2L, "0")))
    assert(idx("other") == ((2L, 3L, "1,2")))
    // cap: a term in >3 docs lists exactly the 3 smallest ids
    val wide = (0L until 6L).map(i => (i, "t")).toDF("doc_id", "text")
    val head = Relevance.postings(wide, sampleK = 3)
      .select(col("postings_head")).as[String].collect()(0)
    assert(head == "0,1,2")
  }

  test("postings head survives lexicographic-vs-numeric doc id ordering") {
    initLog()
    // ids 2 and 10: numeric order is 2,10; a string sort would flip it
    val d = Seq((10L, "t"), (2L, "t")).toDF("doc_id", "text")
    val head = Relevance.postings(d, sampleK = 5)
      .select(col("postings_head")).as[String].collect()(0)
    assert(head == "2,10")
  }

  test("empty tokens are dropped, empty docs don't emit keyword rows") {
    initLog()
    val d = Seq((0L, "a  b"), (1L, "")).toDF("doc_id", "text")
    val ks = Relevance.tfidfKeywords(d, k = 5)
    assert(ks.filter(col("doc_id") === 1L).count() == 0)
    assert(ks.filter(col("doc_id") === 0L).count() == 2)
  }

  test("rerank: coverage beats frequency, span breaks coverage ties, " +
      "single-term docs carry the sentinel and sink") {
    initLog()
    // doc 10: both terms adjacent (span 1); doc 11: both terms 3
    // apart; doc 12: one term many times (BM25 loves it, coverage
    // does not); doc 13: both terms, min span 2 via the SECOND
    // occurrence of 'window'
    val d = Seq(
      (10L, "spark window pad pad pad"),
      (11L, "spark pad pad window pad"),
      (12L, "spark spark spark spark spark"),
      (13L, "window pad pad spark pad window")).toDF("doc_id", "text")
    val got = Relevance.rerankProximity(d, Seq("spark", "window"),
        kPool = 4, k = 4)
      .orderBy(col("rerank")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // coverage-2 docs first by ascending span (1, 2, 3), then the
    // single-term doc with the no-pair sentinel
    assert(got.map(_._1).toSeq == Seq(10L, 13L, 11L, 12L), got.toSeq)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 999999L), got.toSeq)
    assert(got.map(_._2).toSeq == Seq(2L, 2L, 2L, 1L), got.toSeq)
  }

  test("mmr: pure-relevance lambda reproduces the cosine top-k order, " +
      "runs are bit-equal, picks are distinct") {
    initLog()
    val e = graft.sources.Tables.embeddings(spark, sf)
    val got = Relevance.mmrDiversify(e, lambdaBp = 10000L)
      .orderBy(col("pick_order")).collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(1)).distinct.length == 10)
    // λ = 1: the objective is rel_c alone, so pick order IS the
    // (rel_c desc, doc_id asc) candidate ranking
    val rels = got.map(r => (r.getLong(2), r.getLong(1)))
    assert(rels.sortBy { case (rc, id) => (-rc, id) }.toSeq == rels.toSeq)
    val again = Relevance.mmrDiversify(e, lambdaBp = 10000L)
      .orderBy(col("pick_order")).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("searchPipeline: stage wiring — picks come from the rerank " +
      "survivors of the fused pool, carried evidence columns match a " +
      "driver-side recomputation, MMR head pick is the max-relevance " +
      "survivor, runs are bit-equal") {
    initLog()
    // id space shared between docs and embeddings; doc 0 is the query
    // vector. Docs 1-4: both query terms (varying span); 5-6: one
    // term; 7-9: semantic-only (no terms, embeddings near the query)
    val texts = Seq(
      (0L, "filler filler filler"),
      (1L, "spark window close pair here"),
      (2L, "spark mid window with one gap"),
      (3L, "spark far far far far window"),
      (4L, "window then spark adjacent too"),
      (5L, "spark alone in this doc"),
      (6L, "window alone in this doc"),
      (7L, "nothing relevant lexically"),
      (8L, "also nothing relevant here"),
      (9L, "semantic only content"))
    val docs = texts.toDF("doc_id", "text")
    def v(i: Int): Seq[Double] = {
      val a = Array(1.0, 0.0, 0.0, 0.0)
      a(1) += 0.01 * i; a.toSeq
    }
    val emb = (0 to 9).map(i => (i.toLong, v(i)))
      .toDF("vec_id", "embedding")
    val terms = Seq("spark", "window")
    val got = Relevance.searchPipeline(docs, emb, terms,
        queryVecId = 0L, kEach = 10, kFused = 8, kRerank = 6, kFinal = 4)
      .orderBy(col("pick_order")).collect()
    assert(got.length == 4)
    assert(got.map(_.getLong(1)).distinct.length == 4)
    // stage composition: every pick sits in the fused pool AND within
    // the rerank budget
    val fusedIds = Relevance.hybridSearchRrf(docs, emb, terms,
        queryVecId = 0L, kEach = 10, k = 8)
      .collect().map(_.getLong(0)).toSet
    got.foreach { r =>
      assert(fusedIds(r.getLong(1)), s"pick ${r.getLong(1)} not fused")
      assert(r.getAs[Long]("rerank") <= 6L)
    }
    // carried evidence columns match a driver-side recomputation of
    // coverage and min-span over the picked docs' texts — the seam
    // the composed lane exists to catch
    val textOf = texts.toMap
    got.foreach { r =>
      val toks = textOf(r.getLong(1)).split(" ")
      val pos = toks.zipWithIndex.filter(t => terms.contains(t._1))
      val cov = pos.map(_._1).distinct.length.toLong
      val span =
        if (pos.map(_._1).distinct.length < 2) 999999L
        else (for (a <- pos; b <- pos if a._1 != b._1)
          yield math.abs(a._2 - b._2).toLong).min
      assert(r.getAs[Long]("coverage") == cov,
        s"doc ${r.getLong(1)} coverage ${r.getAs[Long]("coverage")} != $cov")
      assert(r.getAs[Long]("prox_span") == span,
        s"doc ${r.getLong(1)} span ${r.getAs[Long]("prox_span")} != $span")
    }
    // MMR head pick: the max-rel survivor (ties to lower id) — with
    // doc 0 (the query itself, rel 10^6) in the pool it must be first
    // whenever it survives the rerank cut; otherwise the top surviving
    // cosine wins. Either way pick 1 has max_sim_c = 0.
    assert(got(0).getAs[Long]("max_sim_c") == 0L)
    val rels = got.map(r => (r.getLong(1), r.getAs[Long]("rel_c")))
    assert(rels.map(_._2).max == got(0).getAs[Long]("rel_c"))
    // determinism
    val again = Relevance.searchPipeline(docs, emb, terms,
        queryVecId = 0L, kEach = 10, kFused = 8, kRerank = 6, kFinal = 4)
      .orderBy(col("pick_order")).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("bm25IndexProbe: bit-parity with bm25Search over the corpus " +
      "(two-term, single-term, and absent-term queries)") {
    initLog()
    val d = graft.sources.Tables.documents(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_postings").toString
    Relevance.writePostingsIndex(d, tmp, nBuckets = 16)
    for (terms <- Seq(Seq("spark", "window"), Seq("spark"),
        Seq("spark", "zzz_absent_term"))) {
      val exact = Relevance.bm25Search(d, terms, k = 20)
        .collect().map(_.toSeq).toSeq
      val probe = Relevance.bm25IndexProbe(spark, tmp, terms, k = 20)
        .collect().map(_.toSeq).toSeq
      assert(probe == exact, s"terms=$terms:\nprobe $probe\nexact $exact")
    }
  }

  test("searchPipelineIndexed: probe-backed arms hold the family " +
      "floor against the exact-arm pipeline, and the shared picks " +
      "carry identical stage-2 evidence (stages beyond the arms are " +
      "the same code)") {
    initLog()
    val exact = Relevance.searchPipeline(spark, sf).collect()
    val probe = Relevance.searchPipelineIndexedLane(spark, sf).collect()
    assert(probe.length == exact.length,
      s"${probe.length} picks vs exact ${exact.length}")
    val eIds = exact.map(_.getLong(1)).toSet
    val pIds = probe.map(_.getLong(1)).toSet
    val floor = math.ceil(eIds.size * 0.8).toInt
    assert((eIds & pIds).size >= floor,
      s"final-pick overlap ${(eIds & pIds).size}/${eIds.size} " +
        s"< floor $floor (exact $eIds, probe $pIds)")
    // the arms are where the two pipelines may differ; coverage and
    // span are recomputed per pool from the same docs, so any pick
    // both pipelines surface must carry identical evidence
    val eBy = exact.map(r => r.getLong(1) ->
      ((r.getAs[Long]("coverage"), r.getAs[Long]("prox_span")))).toMap
    probe.filter(r => eBy.contains(r.getLong(1))).foreach { r =>
      val got = (r.getAs[Long]("coverage"), r.getAs[Long]("prox_span"))
      assert(eBy(r.getLong(1)) == got,
        s"pick ${r.getLong(1)}: evidence $got != exact ${eBy(r.getLong(1))}")
    }
    // determinism of the indexed lane (memoized indexes, same result)
    val again = Relevance.searchPipelineIndexedLane(spark, sf).collect()
    assert(probe.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("searchPipelineArms with an HNSW sem arm: the other index " +
      "family slots into the same arm contract and holds the floor") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val base = java.nio.file.Files
      .createTempDirectory("graft_pipe_hnsw").toString
    graft.operators.Hnsw.writeHnswIndex(emb, s"$base/hnsw", dims0 = 64)
    Relevance.writePostingsIndex(docs, s"$base/postings")
    val qv = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    val probe = Relevance.searchPipelineArms(docs,
      graft.sources.Tables.embeddings(spark, sf),
      k => Relevance.bm25IndexProbe(spark, s"$base/postings",
        Seq("spark", "window"), k),
      k => graft.operators.Hnsw.hnswIndexProbe(spark, s"$base/hnsw",
          qv, k = k)
        .select(col("neighbor_id").as("doc_id"),
          round(col("cos_sim"), 6).as("cos")),
      Seq("spark", "window"), 0L, 20, 12, 8, 5, 7000L).collect()
    val exact = Relevance.searchPipeline(spark, sf).collect()
    assert(probe.length == exact.length)
    val overlap = (probe.map(_.getLong(1)).toSet &
      exact.map(_.getLong(1)).toSet).size
    assert(overlap >= math.ceil(exact.length * 0.8).toInt,
      s"HNSW-armed overlap $overlap/${exact.length}")
  }

  test("mmr: redundancy penalty pulls in the second cluster that " +
      "pure relevance ignores") {
    initLog()
    // query ≈ cluster A (6 near-copies); cluster B sits at ~45° —
    // pure relevance's top-4 is all A, MMR at λ=0.5 must not be
    def v(base: Array[Double], jig: Int): Seq[Double] = {
      val a = base.clone(); a(3) += 0.001 * jig; a.toSeq
    }
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(math.sqrt(0.5), math.sqrt(0.5), 0.0, 0.0)
    val rows = (0 to 5).map(i => (i.toLong, v(a, i))) ++
      (6 to 8).map(i => (i.toLong, v(b, i - 6)))
    val e = rows.toDF("vec_id", "embedding")
    val pure = Relevance.mmrDiversify(e, queryVecId = 0L, candK = 8,
      k = 4, lambdaBp = 10000L).collect().map(_.getLong(1)).toSet
    assert(pure.forall(_ <= 5L), s"pure-relevance picks $pure")
    val div = Relevance.mmrDiversify(e, queryVecId = 0L, candK = 8,
      k = 4, lambdaBp = 5000L).collect().map(_.getLong(1)).toSet
    assert(div.exists(_ >= 6L), s"diversified picks $div stayed in A")
  }
}
