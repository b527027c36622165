package graft

import org.apache.spark.sql.functions._
import graft.operators.Unigram

class UnigramSpec extends GraftSpecBase {
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")

  test("unigramVocab: coverage — every corpus codepoint is a piece; " +
      "costs are Shannon bits of the exact count ratio; ids dense") {
    initLog()
    val docs = docsDf(Seq((1L, "abab abab cd"), (2L, "cd cd ef")))
    val v = Unigram.unigramVocab(docs, vocabSize = 4, maxPieceLen = 3)
      .collect()
    val pieces = v.map(_.getString(1)).toSet
    // single-codepoint coverage even past the top-N cut
    for (ch <- "abcdef") assert(pieces(ch.toString), s"missing '$ch'")
    // cost check on one hand-computed row: T = sum of selected pcnt;
    // cost(piece) = ceil(log2(ceil(T / cnt))) via bit length
    val t = v.map(_.getLong(2)).sum
    v.foreach { r =>
      val q = (t + r.getLong(2) - 1) / r.getLong(2)
      val exp = if (q <= 1) 0L
        else 64L - java.lang.Long.numberOfLeadingZeros(q - 1)
      assert(r.getLong(3) == exp,
        s"piece ${r.getString(1)}: cost ${r.getLong(3)} != $exp")
    }
    // ids are 1..n dense in (pcnt desc, piece) order
    assert(v.map(_.getLong(0)).sorted.toSeq == (1L to v.length).toSeq)
  }

  test("viterbi decode round-trip: every distinct corpus word's id " +
      "sequence maps back through the vocab to the exact word") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val vocab = Unigram.unigramVocab(docs).collect()
    val costOf = vocab.map(r =>
      r.getString(1) -> ((r.getLong(0), r.getLong(3)))).toMap
    val pieceOf = vocab.map(r => r.getLong(0) -> r.getString(1)).toMap
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val ids = Unigram.viterbiSegment(w, costOf,
        Unigram.DefaultMaxPieceLen)
      assert(ids.map(pieceOf).mkString == w,
        s"round-trip failed for '$w': ${ids.map(pieceOf)}")
    }
  }

  test("viterbi prefers the cheaper segmentation and breaks exact " +
      "ties by piece count then id sequence") {
    initLog()
    // vocab: a(1), b(2), ab(3) with costs — "ab" as one 2-bit piece
    // beats a(2)+b(2)=4 bits
    val costOf = Map(
      "a" -> ((1L, 2L)), "b" -> ((2L, 2L)), "ab" -> ((3L, 2L)))
    assert(Unigram.viterbiSegment("ab", costOf, 4) == Seq(3L))
    // tie on bits AND count: "ab"+"a" (2+2) vs "a"+"ba"? absent —
    // construct: pieces x(1),y(2),xy(3),yx(4) all cost 2; word "xyx":
    // xy+x = 4 bits 2 pieces, x+yx = 4 bits 2 pieces — id-csv
    // tie-break picks the lexicographically smaller padded id seq:
    // [3,1] ("xy","x") vs [1,4] ("x","yx") -> [1,4] wins
    val c2 = Map("x" -> ((1L, 2L)), "y" -> ((2L, 2L)),
      "xy" -> ((3L, 2L)), "yx" -> ((4L, 2L)))
    assert(Unigram.viterbiSegment("xyx", c2, 4) == Seq(1L, 4L))
    // coverage violation fails loudly
    val e = intercept[IllegalArgumentException](
      Unigram.viterbiSegment("az", costOf, 4))
    assert(e.getMessage.contains("coverage"), e.getMessage)
  }

  test("EM trainer: planted multi-codepoint pieces are recovered at " +
      "the top of the learned vocabulary") {
    initLog()
    // corpus words are concatenations of the planted pieces — the
    // unigram model should assign them high probability
    val planted = Seq("sub", "word", "tok")
    val rnd = new scala.util.Random(42)
    val words = (0 until 200).map { _ =>
      (0 until 1 + rnd.nextInt(2))
        .map(_ => planted(rnd.nextInt(planted.size))).mkString
    }
    val docs = docsDf(Seq((1L, words.mkString(" "))))
    val learned = Unigram.trainUnigramEm(docs, vocabSize = 24,
      maxPieceLen = 4, emRounds = 4, pruneRounds = 3)
    val multi = learned.filter(p =>
      p._1.codePointCount(0, p._1.length) > 1)
    val topMulti = multi.take(planted.size + 2).map(_._1).toSet
    planted.foreach(p => assert(topMulti(p),
      s"planted piece '$p' not in top multis $topMulti " +
        s"(learned: ${multi.take(10)})"))
  }

  test("EM monotonicity: each sweep's reported likelihood never " +
      "decreases across sweeps on a fixed vocabulary") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val wc = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // seed: per-occurrence substring counts, top 200 + singles
    val candCnt = collection.mutable.Map[String, Long]()
    wc.foreach { case (w, c) =>
      for (i <- 0 until w.length;
           l <- 1 to math.min(4, w.length - i))
        candCnt(w.substring(i, i + l)) =
          candCnt.getOrElse(w.substring(i, i + l), 0L) + c
    }
    val seed = (candCnt.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(200) ++ candCnt.toSeq.filter(_._1.length == 1)).distinct
    val z = seed.map(_._2.toDouble).sum
    var ps = seed.map { case (p, c) => p -> c / z }.toMap
    var lastLl = Double.NegativeInfinity
    for (sweep <- 1 to 5) {
      val (next, ll) = Unigram.emSweep(wc, ps, 4)
      // ll is the likelihood under the INPUT probs: sweep k's input
      // is sweep k-1's output, so the sequence must be non-decreasing
      assert(ll >= lastLl - 1e-9,
        s"sweep $sweep: likelihood fell $lastLl -> $ll")
      lastLl = ll
      ps = next
    }
  }

  test("tok_unigram_train lane: deterministic across runs, singles " +
      "never pruned, scores are finite negative micro-log-probs") {
    initLog()
    val a = Unigram.trainLane(spark, sf).collect().map(_.toSeq).toSeq
    val b = Unigram.trainLane(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b, "EM lane not deterministic across runs")
    val pieces = a.map(_.head.asInstanceOf[String])
    val corpusChars = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= " " && length(col("ch")) > 0)
      .distinct().collect().map(_.getString(0)).toSet
    corpusChars.foreach(ch => assert(pieces.contains(ch),
      s"single '$ch' missing from the EM vocab (pruned?)"))
    a.foreach { row =>
      val s = row(1).asInstanceOf[Long]
      assert(s < 0, s"score_micro $s not negative for ${row.head}")
    }
  }
}
