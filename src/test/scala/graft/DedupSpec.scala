package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends GraftSpecBase {
  import spark.implicits._

  private val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november oscar papa"
  private val nearDup = base.replace("oscar", "quebec")   // 1-word change
  private val distinct = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen"

  private def docs = Seq(
    (0L, base, "en", "s", base.length.toLong),
    (1L, base, "en", "s", base.length.toLong),        // exact dup of 0
    (2L, nearDup, "en", "s", nearDup.length.toLong),  // near dup of 0
    (3L, distinct, "en", "s", distinct.length.toLong))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup keeps min id and counts copies") {
    initLog()
    val out = Dedup.exact(docs).collect()
    assert(out.length == 3)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 0L)
  }

  test("ngram jaccard finds the near-dup pair, not the distinct doc") {
    initLog()
    val pairs = Dedup.ngramJaccardPairs(docs, n = 4, tau = 0.5).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)))   // exact dup: J = 1.0
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("null and empty text survive the whole dedup family") {
    initLog()
    val weird = Seq(
      (0L, base, "en", "s", base.length.toLong),
      (1L, null.asInstanceOf[String], "en", "s", 0L),
      (2L, "", "en", "s", 0L),
      (3L, base, "en", "s", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // exact: null and empty are each their own group; (0,3) collapse
    val ex = Dedup.exact(weird).collect()
    assert(ex.map(_.getAs[Long]("n_copies")).sum == 4L)
    // pairwise ops: no crash, only the planted (0,3) pair appears
    val ng = Dedup.ngramJaccardPairs(weird, n = 4, tau = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ng == Set((0L, 3L)))
    val mh = Dedup.minhashLshPairs(weird, tau = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == Set((0L, 3L)))
    assert(Dedup.simhashPairs(weird).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 3L)))
  }

  test("reliable-checkpoint components equal the localCheckpoint form") {
    initLog()
    val ckDir = java.nio.file.Files.createTempDirectory("graft_ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = Seq(0L, 1L, 2L, 3L, 5L, 6L).toDF("doc_id")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = toMap(Dedup.canonicalIds(nodes, pairs))
    val durable = toMap(Dedup.canonicalIds(nodes, pairs, reliable = true))
    assert(local == durable)
    assert(durable == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L,
      5L -> 5L, 6L -> 5L))
  }

  test("minhash bucket cap: no-op above cluster sizes, drops a planted mega-cluster") {
    initLog()
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // generous cap: identical result on the real corpus
    val uncapped = pairSet(Dedup.minhashLshPairs(docs))
    assert(pairSet(Dedup.minhashLshPairs(docs, maxBucket = 64)) == uncapped)
    // planted mega-cluster: 50 exact copies + one honest near-dup pair
    val mega = (0 until 50).map(i =>
      (1000L + i, "spam spam wonderful spam lovely spam egg and spam " +
        "bacon sausage and spam spam spam spam"))
    // 20 tokens, one tail token changed: J = 16/18 ≈ 0.889 >= 0.8
    val stem = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra"
    val honest = Seq((1L, s"$stem tango"), (2L, s"$stem uniform"))
    val d = (mega ++ honest).toDF("doc_id", "text")
    val capped = pairSet(Dedup.minhashLshPairs(d, maxBucket = 10))
    assert(capped.contains((1L, 2L)), "honest pair must survive the cap")
    assert(!capped.exists(p => p._1 >= 1000L && p._2 >= 1000L),
      "mega-cluster pairs must be dropped by the cap")
    val full = pairSet(Dedup.minhashLshPairs(d))
    assert(full.count(p => p._1 >= 1000L) > 1000, "uncapped sees the blow-up")
  }

  test("native shingle hashes: window count, per-doc distinct parity, lane independence") {
    initLog()
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.functions.ShingleHashes
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 4).limit(200)
    val toks = split(col("text"), " ")
    val r = docs.select(
      (size(toks) - 3).as("expect_windows"),
      column(ShingleHashes(expression(toks), 4, 0)).as("l0"),
      column(ShingleHashes(expression(toks), 4, 1)).as("l1"),
      size(array_distinct(Dedup.shingles(col("text"), 4))).as("distinct_strings"),
      size(array_distinct(arrays_zip(
        column(ShingleHashes(expression(toks), 4, 0)).as("h1"),
        column(ShingleHashes(expression(toks), 4, 1)).as("h2"))))
        .as("distinct_pairs")).collect()
    r.foreach { row =>
      assert(row.getAs[Int]("expect_windows") == row.getSeq[Long](1).size)
      assert(row.getSeq[Long](1) != row.getSeq[Long](2), "lanes must differ")
      // 128-bit pair-distinct equals string-distinct on real docs
      assert(row.getAs[Int]("distinct_strings") == row.getAs[Int]("distinct_pairs"))
    }
  }

  test("recursive-CTE canonical ids equal the iterative components") {
    initLog()
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rec = toMap(Dedup.recursiveCanonicalIds(spark, sf))
    val iter = toMap(Dedup.nearDupComponents(spark, sf))
    assert(rec == iter)
    assert(rec.exists { case (d, c) => d != c }, "corpus has planted near-dups")
  }

  test("minhash LSH pairs == exact jaccard pairs on the test corpus") {
    initLog()
    val d = graft.sources.Tables.documents(spark, sf)
    val lsh = Dedup.minhashLshPairs(d, tau = 0.8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    val exact = Dedup.ngramJaccardPairs(d, n = 4, tau = 0.8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(lsh == exact)
  }

  test("shingles: texts with fewer than n tokens yield an empty set, not bogus slices") {
    initLog()
    val out = Seq("only three tokens", "two tokens", "one", "")
      .toDF("text")
      .select(Dedup.shingles(col("text"), 4).as("sh"), size(col("sh")).as("n"))
      .collect()
    assert(out.forall(_.getAs[Int]("n") == 0))
    // and boundary: exactly n tokens -> one shingle
    val one = Seq("a b c d").toDF("text")
      .select(Dedup.shingles(col("text"), 4).as("sh")).head().getSeq[String](0)
    assert(one == Seq("a b c d"))
  }

  test("ngram jaccard: df cap is a no-op below the cap, prunes everything at df<=1") {
    initLog()
    val d = graft.sources.Tables.documents(spark, sf)
    val uncapped = Dedup.ngramJaccardPairs(d, n = 4, tau = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // corpus max shingle-df is tiny at sf0.001; a generous cap is exact
    val capped = Dedup.ngramJaccardPairs(d, n = 4, tau = 0.5, maxDf = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == uncapped)
    // maxDf = 1 contradicts the df > 1 shared-shingle floor: no pairs
    assert(Dedup.ngramJaccardPairs(d, n = 4, tau = 0.5, maxDf = 1).isEmpty)
  }

  test("simhash64 HOF twin equals the explode+aggregate signatures") {
    initLog()
    val viaHof = docs.select(col("doc_id"),
      Dedup.simhash64(split(col("text"), " ")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = Dedup.simhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaHof == viaAgg)
  }

  test("simhash: exact dup pair at hamming 0") {
    initLog()
    val out = Dedup.simhashPairs(docs).collect()
    val h01 = out.find(r => r.getAs[Long]("id_a") == 0L &&
      r.getAs[Long]("id_b") == 1L)
    assert(h01.isDefined && h01.get.getAs[Long]("hamming") == 0L)
    // block-LSH guarantee: near-dup (1 flipped word) must also surface
    assert(out.forall(r => r.getAs[Long]("hamming") <= 3L))
  }

  test("md5-60 simhash lane: block LSH equals brute force on the corpus") {
    initLog()
    // the pigeonhole exhaustiveness claim behind the DuckDB oracle:
    // 4 blocks of 15 bits find EVERY pair at hamming <= 3
    val corpus = graft.sources.Tables.documents(spark, sf)
    val lsh = Dedup.simhashPairs(corpus, maxDist = 3,
        tokenHash = Dedup.md5Hash60, nBits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Dedup.simhashSignatures(corpus,
        tokenHash = Dedup.md5Hash60, nBits = 60)
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long").as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lsh == brute)
    // and the 60-bit sigs really fit 60 bits (conv/cast overflow-free)
    val bad = sigs.filter(col("sig") < 0L || col("sig") >= (1L << 60)).count()
    assert(bad == 0L)
  }

  test("substringDupSpans recovers a shared 10-token span exactly") {
    initLog()
    // docs 1 and 2 share S1..S10 verbatim inside otherwise-unique
    // text; doc 3 repeats an 8-window INTERNALLY only (df=1 -> no
    // cross-doc duplication). n=8 windows of the 10-token span sit at
    // offsets {0,1,2}; merged, they recover the span: 10 tokens.
    val docs = Seq(
      (1L, "a1 a2 a3 a4 a5 S1 S2 S3 S4 S5 S6 S7 S8 S9 S10 b1 b2 b3 b4 b5"),
      (2L, "c1 c2 c3 S1 S2 S3 S4 S5 S6 S7 S8 S9 S10 d1 d2 d3 d4 d5 d6 d7"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8 y1 y2 y3 y4")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) == ((20L, 1L, 10L, 0.5)))
    assert(out(2L) == ((20L, 1L, 10L, 0.5)))
    assert(out(3L) == ((20L, 0L, 0L, 0.0)))
  }

  test("substringDupSpans: disjoint shared spans stay separate islands") {
    initLog()
    // S and T spans shared, separated by unique gaps wider than n in
    // both docs -> two spans of 10 tokens each per doc
    val docs = Seq(
      (4L, "S1 S2 S3 S4 S5 S6 S7 S8 S9 S10 e1 e2 e3 e4 e5 e6 e7 e8 e9 " +
        "T1 T2 T3 T4 T5 T6 T7 T8 T9 T10"),
      (5L, "S1 S2 S3 S4 S5 S6 S7 S8 S9 S10 f1 f2 f3 f4 f5 f6 f7 f8 f9 " +
        "T1 T2 T3 T4 T5 T6 T7 T8 T9 T10")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // NOTE both docs also share the boundary windows? No: the 9-token
    // unique gaps differ between the docs, so only the pure-S and
    // pure-T windows are cross-doc; spans = exactly the two plants.
    assert(out(4L) == ((2L, 20L)))
    assert(out(5L) == ((2L, 20L)))
  }

  test("substringScrub drops exactly the marked spans and reassembles " +
      "in order") {
    initLog()
    // the disjoint-spans fixture: scrubbing must remove S1..S10 and
    // T1..T10 from both docs, keeping each doc's unique 9-token gap
    val docs = Seq(
      (4L, "S1 S2 S3 S4 S5 S6 S7 S8 S9 S10 e1 e2 e3 e4 e5 e6 e7 e8 e9 " +
        "T1 T2 T3 T4 T5 T6 T7 T8 T9 T10"),
      (5L, "S1 S2 S3 S4 S5 S6 S7 S8 S9 S10 f1 f2 f3 f4 f5 f6 f7 f8 f9 " +
        "T1 T2 T3 T4 T5 T6 T7 T8 T9 T10"),
      (6L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")   // untouched
    ).toDF("doc_id", "text")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val out = Dedup.substringScrub(docs, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
    assert(out(4L) == ((29L, 9L,
      md5hex("e1 e2 e3 e4 e5 e6 e7 e8 e9"))))
    assert(out(5L) == ((29L, 9L,
      md5hex("f1 f2 f3 f4 f5 f6 f7 f8 f9"))))
    assert(out(6L) == ((12L, 12L,
      md5hex("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12"))))
  }

  test("substringScrub: whole-doc copy scrubs to empty (Lee et al.'s case)") {
    initLog()
    // verbatim copies: every window is cross-doc, the span covers the
    // whole doc, the scrubbed text is '' — the row survives (md5(''))
    val docs = Seq(
      (7L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (8L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (9L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12")
    ).toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, n = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(7L) == ((0L, emptyMd5)))
    assert(out(8L) == ((0L, emptyMd5)))
    assert(out(9L)._1 == 12L)
    assert(out(9L)._2 != emptyMd5)
  }

  test("containmentPairs: full quote scores 1.0 where Jaccard stays low") {
    initLog()
    // doc 11 (12 tokens) quoted whole inside doc 12 (32 tokens):
    // every 4-shingle of 11 appears in 12 -> containment 1.0, while
    // Jaccard = 9/29 ~ 0.31 (the asymmetric case the operator exists
    // for). doc 13 shares nothing.
    val quote = "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"
    val docs = Seq(
      (11L, quote),
      (12L, "h1 h2 h3 h4 h5 h6 h7 h8 h9 h10 " + quote +
        " t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (13L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, n = 4, tau = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((11L, 12L, 9L, 1.0)))
    // and the Jaccard lane rightly does NOT pair them at tau 0.5
    val jac = Dedup.ngramJaccardPairs(docs, n = 4, tau = 0.5).collect()
    assert(jac.isEmpty)
  }

  test("containmentPairs: partial overlap below tau is dropped") {
    initLog()
    // 4 of 9 shingles shared -> containment 4/9 < 0.9
    val docs = Seq(
      (21L, "s1 s2 s3 s4 s5 s6 s7 a1 a2 a3 a4 a5"),
      (22L, "s1 s2 s3 s4 s5 s6 s7 b1 b2 b3 b4 b5")
    ).toDF("doc_id", "text")
    assert(Dedup.containmentPairs(docs, n = 4, tau = 0.9).count() == 0L)
    val loose = Dedup.containmentPairs(docs, n = 4, tau = 0.4).collect()
    assert(loose.length == 1 && loose.head.getDouble(3) < 0.5)
  }

  test("containmentPairs: the shipped default maxDf drops the mega-shingle " +
      "O(d²) blow-up while honest pairs survive") {
    initLog()
    // the r10 VERDICT scale trap: one boilerplate shingle shared by
    // d > maxDf docs. Each boiler doc is EXACTLY the 4-token phrase
    // (one shingle, df = 1100 > ContainmentDefaultMaxDf = 1000), so
    // uncapped every boiler pair scores containment 1/1 = 1.0 —
    // 1100·1099/2 ≈ 604k pairs from pure boilerplate. The honest pair
    // (31 quoted whole in 32) overlaps on COLD shingles only.
    assert(Dedup.ContainmentDefaultMaxDf == 1000)
    val boiler = "all rights reserved worldwide"
    val quote = "q1 q2 q3 q4 q5 q6 q7 q8"
    val docs = (1000L until 2100L).map(i => (i, boiler)) ++ Seq(
      (31L, quote),
      (32L, "h1 h2 h3 h4 " + quote + " t1 t2 t3 t4"))
    val df = docs.toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(df, n = 4, tau = 0.9).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((31L, 32L)))
    // the explicit uncapped escape hatch still finds the blow-up —
    // proving the default's absence, not the operator's
    val uncapped = Dedup.containmentPairs(df, n = 4, tau = 0.9,
      maxDf = Int.MaxValue).count()
    assert(uncapped == 1100L * 1099L / 2L + 1L)
  }

  test("substringDupSpans: verbatim whole-doc copy has dup_ratio 1.0") {
    initLog()
    val docs = Seq(
      (6L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (7L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
      (8L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(6L) == 1.0 && out(7L) == 1.0 && out(8L) == 0.0)
  }
}
