package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, BpeBytes}

/** Byte-level BPE specs: the GPT-2 remap against hand-pinned
  * invariants, the pre-tokenizer against fixture splits (pinned to the
  * cross-engine behavior verified against RE2), the relational remap
  * against the driver-side reference, char≡byte parity on the
  * granularity-degenerate corpus class, and a full independent-replica
  * encode check with decode-back.
  */
class BpeBytesSpec extends GraftSpecBase {
  import spark.implicits._

  private def docsDf(texts: Seq[(Long, String)]): DataFrame =
    texts.map { case (i, t) => (i, "src0", t) }
      .toDF("doc_id", "source", "text")

  test("bytes_to_unicode: 256 distinct printable symbols, printable " +
      "ascii identity, the GPT-2 landmarks, and decode round-trip") {
    initLog()
    val m = BpeBytes.BytesToUnicode
    assert(m.length == 256 && m.toSet.size == 256)
    // printable ascii maps to itself
    ('!' to '~').foreach(c => assert(m(c.toInt) == c))
    // the famous artifacts: space -> Ġ (U+0120), newline -> Ċ (U+010A)
    assert(m(' '.toInt) == 'Ġ')
    assert(m('\n'.toInt) == 'Ċ')
    // nothing maps to whitespace or the SEP char (the merge machinery
    // depends on both)
    assert(m.forall(c => !c.isWhitespace && c != Bpe.Sep.charAt(0)))
    // multi-byte round trip: é = 2 bytes, 🚀 = 4 bytes
    for (s <- Seq("café", "naïve", "a🚀b", "tab\there", "")) {
      assert(BpeBytes.byteEncode(s).length == s.getBytes("UTF-8").length)
      assert(BpeBytes.byteDecode(BpeBytes.byteEncode(s)) == s)
    }
  }

  test("pre-tokenizer: fixture splits pinned to the RE2-verified " +
      "behavior (contractions, attached spaces, punctuation runs, " +
      "whitespace runs)") {
    initLog()
    val fixtures = Seq(
      "hello world" -> Seq("hello", " world"),
      "it's  fine" -> Seq("it", "'s", "  ", "fine"),
      "a  b" -> Seq("a", "  ", "b"),
      "num 42x" -> Seq("num", " 42", "x"),
      "dots...end" -> Seq("dots", "...", "end"),
      "café ok" -> Seq("café", " ok"))
    val got = fixtures.map(_._1).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), regexp_extract_all(col("text"),
        lit(BpeBytes.PreTokenRegex), lit(0)).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq)
      .toMap
    fixtures.zipWithIndex.foreach { case ((t, exp), i) =>
      assert(got(i.toLong) == exp, s"'$t': ${got(i.toLong)} != $exp")
    }
    // the pre-tokens TILE the text (nothing dropped, nothing added) —
    // the property the decode-back spec leans on
    fixtures.foreach { case (t, exp) => assert(exp.mkString == t) }
  }

  test("relational byteVocab matches the driver-side reference remap " +
      "including multi-byte characters") {
    initLog()
    val docs = docsDf(Seq(
      (1L, "hello hello café"),
      (2L, "it's 42... café"),
      (3L, "a🚀b")))
    val got = BpeBytes.byteVocab(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    // independent expected: regex on the driver, byteEncode reference,
    // SEP before every symbol
    val p = java.util.regex.Pattern.compile(BpeBytes.PreTokenRegex)
    val exp = collection.mutable.Map[String, Long]()
    docs.collect().map(_.getString(2)).foreach { t =>
      val m = p.matcher(t)
      while (m.find()) exp(m.group()) = exp.getOrElse(m.group(), 0L) + 1
    }
    assert(got.keySet == exp.keySet)
    exp.foreach { case (w, c) =>
      val repr = BpeBytes.byteEncode(w)
        .map(ch => Bpe.Sep + ch).mkString
      assert(got(w) == ((c, repr)), s"word '$w': ${got(w)}")
    }
  }

  test("char/byte parity on single-ascii-word docs: identical merges, " +
      "identical encode frames (the granularity-degenerate class)") {
    initLog()
    // one word per doc, pure printable-ascii letters, no spaces: the
    // regex yields the word itself, the remap is the identity, so byte
    // granularity IS char granularity
    val docs = docsDf(Seq(
      (1L, "newest"), (2L, "newest"), (3L, "widest"), (4L, "lowest"),
      (5L, "low"), (6L, "lower"), (7L, "newest"), (8L, "wide")))
    val r = 8
    val charMerges = Bpe.trainMerges(docs, rounds = r)
    val byteMerges = BpeBytes.trainMergesBytes(docs, rounds = r)
    assert(byteMerges == charMerges)
    val charEnc = Bpe.encodeDocs(docs, charMerges).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).sortBy(_._1)
    val byteEnc = BpeBytes.encodeDocsBytes(docs, byteMerges).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).sortBy(_._1)
    assert(byteEnc.toSeq == charEnc.toSeq)
  }

  test("byte merges: the batched relational trainer and the " +
      "incremental driver trainer over the REMAPPED vocab agree on " +
      "non-ascii text (multi-byte chars = two symbols)") {
    initLog()
    val docs = docsDf(Seq(
      (1L, "café café crème café"),
      (2L, "the cat's café... naïve"),
      (3L, "crème crème naïve the the")))
    val r = 10
    val batched = BpeBytes.trainMergesBytes(docs, rounds = r)
    // driver replica of the cachedMergesBytes vocab derivation
    val p = java.util.regex.Pattern.compile(BpeBytes.PreTokenRegex)
    val wc = collection.mutable.Map[String, Long]()
    docs.collect().map(_.getString(2)).foreach { t =>
      val m = p.matcher(t)
      while (m.find()) wc(m.group()) = wc.getOrElse(m.group(), 0L) + 1
    }
    val inc = Bpe.trainIncrementalFromVocab(
      wc.toArray.map { case (w, c) => (BpeBytes.byteEncode(w), c) }, r)
    assert(inc == batched, s"inc $inc\nbat $batched")
    // and at least one merge involves a remapped multi-byte symbol
    // (the é bytes remap to chars above U+00FF), proving the byte
    // alphabet is actually in play
    assert(batched.exists { case (l, x) =>
      (l + x).exists(_ > 'ÿ') }, batched)
  }

  test("encodeDocsBytes: independent replica agrees on ids and the " +
      "decode-back recovers the exact text (spaces included)") {
    initLog()
    val docs = docsDf(Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat's hat... on the mat"),
      (3L, "numbers 42 and 442 and café"),
      (4L, "the the the")))
    val r = 12
    val merges = BpeBytes.trainMergesBytes(docs, rounds = r)
    val enc = BpeBytes.encodeDocsBytes(docs, merges).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getString(2)))).toMap
    // independent replica: regex pre-tokens, reference remap, the
    // BpeSpec mergeOnce chain per pre-token, ids from the sorted
    // alphabet + merge ranks
    def mergeOnce(syms: Vector[String], pair: (String, String)) = {
      val (l, rr) = pair
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
          b += (l + rr); i += 2
        } else { b += syms(i); i += 1 }
      }
      b.result()
    }
    val p = java.util.regex.Pattern.compile(BpeBytes.PreTokenRegex)
    def preToks(t: String): Seq[String] = {
      val m = p.matcher(t)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
    val texts = docs.collect().map(x => x.getLong(0) -> x.getString(2))
    val alphabet = texts.flatMap(t => preToks(t._2))
      .flatMap(w => BpeBytes.byteEncode(w).map(_.toString))
      .distinct.sorted
    val ids = alphabet.zipWithIndex.map { case (s, i) => s -> i.toLong }
      .toMap ++ merges.zipWithIndex.map { case ((l, rr), i) =>
        (l + rr) -> (alphabet.length + i.toLong) }
    val symCache = collection.mutable.Map[String, Vector[String]]()
    def symsOf(w: String): Vector[String] = symCache.getOrElseUpdate(w,
      merges.foldLeft(BpeBytes.byteEncode(w).map(_.toString).toVector)(
        mergeOnce))
    texts.foreach { case (id, t) =>
      val toks = preToks(t)
      if (toks.nonEmpty) {
        val expIds = toks.flatMap(w => symsOf(w).map(ids))
        assert(enc(id)._1 == expIds.length.toLong, s"doc $id count")
        assert(enc(id)._2 == expIds.mkString(","), s"doc $id ids")
        // decode-back: ids -> symbols -> concatenation -> byteDecode
        val idToSym = ids.map(_.swap)
        val decoded = BpeBytes.byteDecode(
          enc(id)._2.split(",").map(s => idToSym(s.toLong)).mkString)
        assert(decoded == t, s"doc $id decode: '$decoded'")
      }
    }
  }
}
