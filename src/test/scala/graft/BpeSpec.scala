package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE tokenizer specs. The load-bearing oracle is an INDEPENDENT
  * in-test reference implementation (symbol vectors + left-to-right
  * single-pass merge — the textbook Sennrich 2016 loop) that shares
  * no code with the string-replace formulation under test.
  */
class BpeSpec extends GraftSpecBase {

  // ---- reference implementation (Vector[String] symbols) ----------

  /** One merge round applied to a symbol sequence: left-to-right,
    * non-overlapping, all occurrences — the semantics `replace` must
    * reproduce through the SEP-prefixed string form.
    */
  private def mergeOnce(syms: Vector[String],
      pair: (String, String)): Vector[String] = {
    val (l, r) = pair
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** Greedy BPE train over a word-count map: max total pair count,
    * ties by (l, r) ascending.
    */
  private def refTrain(words: Map[String, Long], rounds: Int)
      : (Seq[(String, String)], Map[String, Vector[String]]) = {
    var w: Map[String, (Vector[String], Long)] =
      words.map { case (s, c) => s -> (s.map(_.toString).toVector, c) }
    val out = collection.mutable.Buffer[(String, String)]()
    for (_ <- 1 to rounds) {
      val pc = collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((_, (syms, c)) <- w; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) += c
      val best = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
      out += best
      w = w.map { case (k, (syms, c)) => k -> (mergeOnce(syms, best), c) }
    }
    (out.toSeq, w.map { case (k, (syms, _)) => k -> syms })
  }

  private def docsDf(texts: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    texts.toDF("doc_id", "source", "text")
  }

  test("string-replace merge form is exact left-to-right greedy BPE: " +
      "run merging, overlap continuation, and symbol-suffix non-match") {
    initLog()
    import spark.implicits._
    // [a,a,a,a] under (a,a) must become [aa,aa] (the replace scan
    // resumes AFTER each replacement, like the reference mergeOnce),
    // never [aa,a,a]; [a,a,a] → [aa,a]
    val runs = Seq("aaaa", "aaa", "aa", "a").toDF("text")
    val got = runs.select(col("text"),
      Bpe.bpeCountExpr(col("text"), Seq(("a", "a"))).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("aaaa" -> 2L, "aaa" -> 2L, "aa" -> 1L, "a" -> 1L), got)
    // suffix must NOT match: "al" + "l" contains no (l, l) pair — the
    // SEP prefix keeps the pattern off symbol suffixes
    val sfx = Seq("all", "lal", "lla").toDF("text")
    val g2 = sfx.select(col("text"),
      Bpe.bpeCountExpr(col("text"), Seq(("l", "l"))).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2 == Map("all" -> 2L, "lal" -> 3L, "lla" -> 2L), g2)
    // merges never cross the word boundary (bare space breaks the
    // pattern): "a a" under (a,a) stays 2 tokens
    val wb = Seq("a a", "aa a").toDF("text")
    val g3 = wb.select(col("text"),
      Bpe.bpeCountExpr(col("text"), Seq(("a", "a"))).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g3 == Map("a a" -> 2L, "aa a" -> 2L), g3)
  }

  test("trainMerges matches the independent reference implementation " +
      "on the Sennrich-style fixture, including re-merges and ties") {
    initLog()
    // counts chosen so ties occur (low×2 vs new×2 prefixes) and
    // merged symbols re-merge (es+t, lo+w)
    val corpus = Seq.fill(5)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(2)("low") ++ Seq.fill(2)("lower")
    val docs = docsDf(Seq((1L, "src0", corpus.mkString(" "))))
    val wordCounts = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rounds = 10
    val (expMerges, expSyms) = refTrain(wordCounts, rounds)
    val gotMerges = Bpe.trainMerges(docs, rounds)
    assert(gotMerges == expMerges,
      s"got $gotMerges\nexp $expMerges")
    // and the per-word final token counts agree
    val counts = Bpe.vocabTokenCounts(docs, gotMerges).collect()
    assert(counts.length == 1)
    val expTotal = corpus.map(w => expSyms(w).length.toLong).sum
    assert(counts(0).getAs[Long]("n_tokens_bpe") == expTotal)
  }

  test("vocab-join and map-only expression paths agree on the corpus") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val merges = Bpe.trainMerges(docs, rounds = 8)
    val viaVocab = Bpe.vocabTokenCounts(docs, merges)
    val viaExpr = docs.select(col("doc_id"),
      Bpe.bpeCountExpr(col("text"), merges).as("n_expr"))
    val joined = viaVocab.join(viaExpr, Seq("doc_id"))
    assert(joined.filter(col("n_tokens_bpe") =!= col("n_expr")).count() == 0)
    assert(joined.count() == docs.count())
    // BPE token count is bounded by [whitespace words, characters]
    val bounds = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws"),
        (length(col("text")) - (size(split(col("text"), " ")) - 1))
          .cast("long").as("chars"))
      .join(viaVocab, Seq("doc_id"))
    assert(bounds.filter(col("n_tokens_bpe") < col("ws") ||
      col("n_tokens_bpe") > col("chars")).count() == 0)
  }

  test("whitespace-degenerate vocab: fully-merged words make BPE " +
      "counts equal whitespace counts, and the token-budget twin " +
      "returns the whitespace lane's rows bit-for-bit") {
    initLog()
    // 4 two-char words with disjoint letters: 4 merges merge every
    // word to a single symbol → 1 BPE token per word
    val docs = docsDf(Seq(
      (1L, "src0", "ab ab cd ab"), (2L, "src0", "cd cd"),
      (3L, "src1", "ab cd ef"), (4L, "src1", "ef ef ef"),
      (5L, "src2", "ef gh"), (6L, "src3", "gh gh gh gh")))
    val merges = Bpe.trainMerges(docs, rounds = 4)
    assert(merges.toSet == Set(("a", "b"), ("c", "d"), ("e", "f"),
      ("g", "h")), merges)
    val bpeToks = Bpe.vocabTokenCounts(docs, merges)
    val wsToks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens_bpe"))
    assert(bpeToks.join(wsToks.withColumnRenamed("n_tokens_bpe", "ws"),
      Seq("doc_id")).filter(col("n_tokens_bpe") =!= col("ws"))
      .count() == 0)
    // row-sorted compare: the lane dropped its presentation orderBy
    // in r17 (the driver's oracle compare is row-sorted anyway), so
    // the twin-parity assertion sorts both sides itself
    val viaBpe = Bpe.budgetFromCounts(docs, bpeToks)
      .orderBy(col("source")).collect()
    val viaWs = Bpe.budgetFromCounts(docs, wsToks)
      .orderBy(col("source")).collect()
    assert(viaBpe.toSeq == viaWs.toSeq,
      s"bpe=${viaBpe.toSeq}\nws =${viaWs.toSeq}")
    assert(viaBpe.nonEmpty)
  }

  test("trainMergesBatched equals the sequential greedy exactly — " +
      "real corpus and tie-heavy fixture, at every batch size") {
    initLog()
    // the real corpus at R=48 runs deep into the low-count tie plateau
    // where the tie guard is load-bearing; batch=2/8/64 exercise
    // conflict stops, budget stops, and list-exhausted rounds
    val docs = graft.sources.Tables.documents(spark, sf)
    val seqMerges = Bpe.trainMerges(docs, rounds = 48)
    for (b <- Seq(2, 8, 64)) {
      val got = Bpe.trainMergesBatched(docs, rounds = 48, batch = b)
      assert(got == seqMerges, s"batch=$b diverges from sequential at " +
        s"index ${got.zip(seqMerges).indexWhere(p => p._1 != p._2)}")
    }
    // Sennrich fixture: re-merges and exact ties
    val corpus = Seq.fill(5)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(2)("low") ++ Seq.fill(2)("lower")
    val fix = docsDf(Seq((1L, "src0", corpus.mkString(" "))))
    val seqFix = Bpe.trainMerges(fix, rounds = 10)
    for (b <- Seq(1, 3, 16))
      assert(Bpe.trainMergesBatched(fix, rounds = 10, batch = b) == seqFix,
        s"fixture batch=$b")
    // exhaustion errors match the sequential contract
    val tiny = docsDf(Seq((1L, "src0", "ab ab")))
    val e = intercept[IllegalArgumentException](
      Bpe.trainMergesBatched(tiny, rounds = 2, batch = 4))
    assert(e.getMessage.contains("exhausted"), e.getMessage)
    assert(Bpe.trainMergesBatched(tiny, rounds = 1, batch = 4) ==
      Seq(("a", "b")))
  }

  test("self-merge divergence fixture: a batch must not accept past a " +
      "self-merge (its new pairs are bounded only by its OWN count)") {
    initLog()
    // "ccc"×12 + "bd"×10: merging (c,c) creates (cc,c)=12 which
    // outranks (b,d)=10 — the r13 rule accepted (b,d) in the same
    // batch and diverged from the sequential greedy (found by a
    // brute-force replica over 10⁶ random corpora; the documented
    // progenitor bound fails exactly when the progenitor IS the
    // applied merge, i.e. l == r). The fixed rule applies (c,c) alone.
    val fix = docsDf(Seq(
      (1L, "src0", Seq.fill(12)("ccc").mkString(" ")),
      (2L, "src0", Seq.fill(10)("bd").mkString(" "))))
    val seqFix = Bpe.trainMerges(fix, rounds = 3)
    assert(seqFix == Seq(("c", "c"), ("cc", "c"), ("b", "d")), seqFix)
    for (b <- Seq(2, 3, 8))
      assert(Bpe.trainMergesBatched(fix, rounds = 3, batch = b) == seqFix,
        s"batch=$b")
    // richer corpus from the same search (head self-merge + mid-batch
    // competitors at several counts): full list equality at every size
    val fix2 = docsDf(Seq(
      (1L, "src0", Seq.fill(2)("abcc").mkString(" ")),
      (2L, "src0", "aa"),
      (3L, "src0", Seq.fill(12)("ccc").mkString(" ")),
      (4L, "src0", Seq.fill(10)("bd").mkString(" ")),
      (5L, "src0", Seq.fill(5)("aacb").mkString(" "))))
    val seqFix2 = Bpe.trainMerges(fix2, rounds = 8)
    for (b <- Seq(2, 3, 4, 16))
      assert(Bpe.trainMergesBatched(fix2, rounds = 8, batch = b) == seqFix2,
        s"batch=$b diverges: got " +
          Bpe.trainMergesBatched(fix2, rounds = 8, batch = b))
    // two-derivation attempt (the r13 ADVICE scenario): "abab" words
    // drive (a,b) then (ab,ab) — the produced string "abab" can never
    // ALSO exist via e.g. (aba,b) because exact-tiling sites of one
    // character string evolve identically (see the Bpe scaladoc
    // proof); the producedEver guard is defensive. Equality pins it.
    val fix3 = docsDf(Seq(
      (1L, "src0", Seq.fill(9)("abab").mkString(" ")),
      (2L, "src0", Seq.fill(7)("aba").mkString(" ")),
      (3L, "src0", Seq.fill(5)("bab").mkString(" "))))
    val seqFix3 = Bpe.trainMerges(fix3, rounds = 4)
    for (b <- Seq(2, 4, 8))
      assert(Bpe.trainMergesBatched(fix3, rounds = 4, batch = b) == seqFix3,
        s"batch=$b")
  }

  test("trainMergesIncremental equals the sequential greedy: corpus, " +
      "tie fixture, self-merge fixture, and a random-corpus sweep " +
      "against the independent reference") {
    initLog()
    // the real corpus at R=48 (the batched spec's depth — ties galore)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(Bpe.trainMergesIncremental(docs, rounds = 48) ==
      Bpe.trainMerges(docs, rounds = 48))
    // Sennrich fixture (re-merges + ties)
    val corpus = Seq.fill(5)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(2)("low") ++ Seq.fill(2)("lower")
    val fix = docsDf(Seq((1L, "src0", corpus.mkString(" "))))
    assert(Bpe.trainMergesIncremental(fix, rounds = 10) ==
      Bpe.trainMerges(fix, rounds = 10))
    // self-merge fixture (the batched trainer's r14 divergence class —
    // the incremental trainer has no batch rule, but the delta
    // bookkeeping around a self-merge's overlapping sites is its own
    // hazard: [c,c,c] under (c,c) must re-count (cc,c) exactly once)
    val fix2 = docsDf(Seq(
      (1L, "src0", Seq.fill(12)("ccc").mkString(" ")),
      (2L, "src0", Seq.fill(10)("bd").mkString(" "))))
    assert(Bpe.trainMergesIncremental(fix2, rounds = 3) ==
      Seq(("c", "c"), ("cc", "c"), ("b", "d")))
    // non-BMP fixture: initial symbols must be CODEPOINTS — a
    // surrogate-halved 😀 would learn merges over lone surrogates
    // that never match the distributed SEP repr or trainMerges
    val emoji = new String(Character.toChars(0x1F600)) // 😀 (non-BMP)
    val fixNb = docsDf(Seq(
      (1L, "src0", Seq.fill(6)(s"$emoji$emoji").mkString(" ")),
      (2L, "src0", Seq.fill(4)(s"a$emoji").mkString(" "))))
    val nbInc = Bpe.trainMergesIncremental(fixNb, rounds = 2)
    assert(nbInc == Bpe.trainMerges(fixNb, rounds = 2),
      "non-BMP corpus: incremental diverged from sequential greedy")
    assert(nbInc.head == ((emoji, emoji)),
      s"expected the emoji pair to win round 1, got ${nbInc.head}")
    // random-corpus sweep DRIVER-SIDE against the in-test reference:
    // the same fuzz harness that found the batched self-merge hole
    // (deterministic seed; vocab shapes tuned to collide pairs)
    val rnd = new scala.util.Random(151515L)
    for (trial <- 0 until 3000) {
      val nWords = 1 + rnd.nextInt(6)
      val alpha = "abcd"
      val words = (0 until nWords).map { _ =>
        val len = 1 + rnd.nextInt(5)
        (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val wc = words.groupBy(identity).map { case (w, ws) =>
        w -> (ws.size.toLong + rnd.nextInt(3)) }
      val rounds = 1 + rnd.nextInt(6)
      // refTrain has no exhaustion guard (minBy on an empty pair map
      // throws); when the corpus exhausts, both sides must notice
      val exp = scala.util.Try(refTrain(wc, rounds)._1)
      val got = scala.util.Try(Bpe.trainIncrementalFromVocab(
        wc.toArray, rounds))
      (exp, got) match {
        case (scala.util.Success(e2), scala.util.Success(g2)) =>
          assert(g2 == e2,
            s"trial=$trial wc=$wc rounds=$rounds\ngot $g2\nexp $e2")
        case (scala.util.Failure(_), scala.util.Failure(ge)) =>
          assert(ge.getMessage.contains("exhausted"),
            s"trial=$trial: $ge")
        case other =>
          fail(s"trial=$trial wc=$wc rounds=$rounds: one side " +
            s"exhausted, the other did not — $other")
      }
    }
    // exhaustion contract matches the family
    val tiny = docsDf(Seq((1L, "src0", "ab ab")))
    val e = intercept[IllegalArgumentException](
      Bpe.trainMergesIncremental(tiny, rounds = 2))
    assert(e.getMessage.contains("exhausted"), e.getMessage)
    assert(Bpe.trainMergesIncremental(tiny, rounds = 1) == Seq(("a", "b")))
  }

  test("incremental trainer vocab guard: refuses an over-ceiling " +
      "vocabulary loudly, naming the threshold and the distributed " +
      "remedy, before any driver collect") {
    initLog()
    val docs = docsDf(Seq((1L, "src0", "aa bb cc dd ee")))
    val e = intercept[IllegalArgumentException](
      Bpe.trainMergesIncremental(docs, rounds = 2, maxVocabRows = 3L))
    assert(e.getMessage.contains("maxVocabRows=3"), e.getMessage)
    assert(e.getMessage.contains("trainMergesBatched"), e.getMessage)
    // at/under the ceiling the same call trains normally
    assert(Bpe.trainMergesIncremental(docs, rounds = 2,
      maxVocabRows = 5L).length == 2)
  }

  test("trainMergesIncremental resume: continuing from a trained " +
      "prefix reproduces the full run exactly (vocabulary extension)") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val full = Bpe.trainMergesIncremental(docs, rounds = 32)
    val prefix = Bpe.trainMergesIncremental(docs, rounds = 12)
    assert(full.take(12) == prefix)
    assert(Bpe.trainMergesIncremental(docs, rounds = 32,
      resumeFrom = prefix) == full,
      "resume diverged from the uninterrupted run")
    // resume over a GROWN corpus: the prefix is preserved verbatim and
    // the continuation is deterministic (no equality claim vs a fresh
    // train — the grown corpus legitimately reorders later merges)
    val fix = docsDf(Seq((1L, "src0", "newest newest widest low lower")))
    val p2 = Bpe.trainMergesIncremental(fix, rounds = 3)
    val grown = docsDf(Seq(
      (1L, "src0", "newest newest widest low lower"),
      (2L, "src0", "lowest widest newest")))
    val cont = Bpe.trainMergesIncremental(grown, rounds = 6,
      resumeFrom = p2)
    assert(cont.take(3) == p2 && cont.length == 6)
    assert(cont == Bpe.trainMergesIncremental(grown, rounds = 6,
      resumeFrom = p2))
    // total rounds must exceed the prefix
    val e = intercept[IllegalArgumentException](
      Bpe.trainMergesIncremental(fix, rounds = 2, resumeFrom = p2))
    assert(e.getMessage.contains("resume"), e.getMessage)
  }

  test("whitespace-degenerate vocab: seq_pack on BPE counts returns " +
      "the whitespace packing bit-for-bit") {
    initLog()
    import graft.operators.Packing
    // same fully-merging fixture as the budget twin: 1 BPE token per
    // word ⟹ BPE counts equal whitespace counts ⟹ identical packing
    val docs = docsDf(Seq(
      (1L, "src0", "ab ab cd ab"), (2L, "src0", "cd cd"),
      (3L, "src1", "ab cd ef"), (4L, "src1", "ef ef ef"),
      (5L, "src2", "ef gh"), (6L, "src3", "gh gh gh gh")))
    val merges = Bpe.trainMerges(docs, rounds = 4)
    val viaBpe = Bpe.vocabTokenCounts(docs, merges)
      .withColumnRenamed("n_tokens_bpe", "n_tokens")
      .transform(Packing.packCounts(nShards = 3, budget = 4L))
      .collect().map(_.toSeq).toSet
    val viaWs = Packing.packDocs(docs, nShards = 3, budget = 4L)
      .collect().map(_.toSeq).toSet
    assert(viaBpe == viaWs, s"bpe=$viaBpe\nws =$viaWs")
    assert(viaBpe.nonEmpty)
  }

  test("chunkByBudget: hand-computed token-offset chunks, md5 of the " +
      "ordered words, whitespace degeneracy") {
    initLog()
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // merges (a,b),(c,d): "ab"→1 token, "cd"→1, "xy" stays 2 ("x","y"
    // never merge), "q" →1. Doc 1 = [ab(1) xy(2) cd(1) q(1)] with
    // budget 2: offsets 0,1,3,4 → chunks 0,0,1,2
    val docs = docsDf(Seq(
      (1L, "src0", "ab xy cd q"),
      (2L, "src0", "ab ab ab")))
    val merges = Seq(("a", "b"), ("c", "d"))
    val got = Bpe.chunkByBudget(docs, merges, budget = 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got == Map(
      (1L, 0L) -> (2L, 3L, md5hex("ab xy")),
      (1L, 1L) -> (1L, 1L, md5hex("cd")),
      (1L, 2L) -> (1L, 1L, md5hex("q")),
      (2L, 0L) -> (2L, 2L, md5hex("ab ab")),
      (2L, 1L) -> (1L, 1L, md5hex("ab"))), got)
    // whitespace degeneracy: fully-merged vocab ⟹ chunking equals
    // plain n-words-per-chunk windows
    val docs2 = docsDf(Seq((1L, "src0", "ab cd ef gh ab cd")))
    val m2 = Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"))
    val got2 = Bpe.chunkByBudget(docs2, m2, budget = 4L).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(4))).toSet
    assert(got2 == Set(
      (0L, 4L, md5hex("ab cd ef gh")),
      (1L, 2L, md5hex("ab cd"))), got2)
  }

  test("trainMerges fails loud when the corpus exhausts before the " +
      "requested rounds (a short merge table would desync the oracle)") {
    initLog()
    val docs = docsDf(Seq((1L, "src0", "ab ab")))
    // "ab" exhausts after 1 merge; round 2 must error, not truncate
    val e = intercept[IllegalArgumentException](
      Bpe.trainMerges(docs, rounds = 2))
    assert(e.getMessage.contains("exhausted"), e.getMessage)
    assert(Bpe.trainMerges(docs, rounds = 1) == Seq(("a", "b")))
  }

  test("tok_encode_bpe: ids decode back to the exact text, ids are " +
      "unique per symbol, and n_tokens equals the count lane") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 60)
    val merges = Bpe.trainMergesBatched(docs, rounds = 8)
    val ids = Bpe.symbolIds(docs, merges).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // unique in both directions; merges sit above the alphabet block
    assert(ids.map(_._1).distinct.length == ids.length)
    assert(ids.map(_._2).distinct.length == ids.length)
    val alphaSize = ids.length - merges.length
    assert(ids.filter(_._1.length > 1).map(_._2).forall(_ >= alphaSize))
    val id2sym = ids.map(_.swap).toMap
    val enc = Bpe.encodeDocs(docs, merges)
    // decode round-trip: concatenating the id sequence's symbols
    // reproduces the document text minus the (consumed) spaces
    val rows = enc.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("doc_id"), col("ids_csv"), col("n_tokens"), col("text"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val decoded = r.getString(1).split(",")
        .map(t => id2sym(t.toLong)).mkString
      assert(decoded == r.getString(3).replace(" ", ""),
        s"doc ${r.getLong(0)} decode mismatch")
    }
    // token-count parity with the vocab-join count lane
    val cnt = Bpe.vocabTokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => cnt(r.getLong(0)) == r.getLong(2)))
  }
}
