package graft

import org.apache.spark.sql.functions._
import graft.operators.Segments

class SegmentsSpec extends GraftSpecBase {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val corpus = Seq(
    (0L, "a b c d e f"),       // segs (w=3): "a b c", "d e f"
    (1L, "a b c x y z"),       // "a b c" repeats doc 0's first seg
    (2L, "a b c d e f"),       // exact duplicate of doc 0
    (3L, "m n o p"),           // tail seg shorter than window
    (5L, "p q r p q r"))       // within-doc repeated segment
    .toDF("doc_id", "text")

  test("segmentDedup keeps first corpus occurrence, reassembles in order") {
    initLog()
    val out = Segments.segmentDedup(corpus, window = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(0L) == ((2L, 2L, md5Hex("a b c d e f"))))
    // doc 1 loses its first segment to doc 0, keeps its own tail
    assert(out(1L) == ((2L, 1L, md5Hex("x y z"))))
    // exact duplicate: every segment already seen -> empty doc survives as a row
    assert(out(2L) == ((2L, 0L, md5Hex(""))))
    assert(out(3L) == ((2L, 2L, md5Hex("m n o p"))))
    // within-doc repeat: the SECOND occurrence is the duplicate
    assert(out(5L) == ((2L, 1L, md5Hex("p q r"))))
  }

  test("boilerplateScrub drops df>=threshold segments from every doc") {
    initLog()
    val out = Segments.boilerplateScrub(corpus, window = 3, dfThreshold = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // "a b c" (df=3) and "d e f" (df=2) are boilerplate; no occurrence survives
    assert(out(0L) == ((2L, 2L, md5Hex(""))))
    assert(out(1L) == ((2L, 1L, md5Hex("x y z"))))
    assert(out(2L) == ((2L, 2L, md5Hex(""))))
    assert(out(3L) == ((2L, 0L, md5Hex("m n o p"))))
    // df counts DISTINCT docs: a within-doc repeat is not boilerplate
    assert(out(5L) == ((2L, 0L, md5Hex("p q r p q r"))))
  }

  test("boilerplateScrub threshold above max df is a no-op") {
    initLog()
    val out = Segments.boilerplateScrub(corpus, window = 3, dfThreshold = 4)
    assert(out.agg(sum(col("n_boiler"))).head.getLong(0) == 0L)
    val m = out.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(m(0L) == md5Hex("a b c d e f"))
    assert(m(5L) == md5Hex("p q r p q r"))
  }

  test("planted viral segment: one hot key across many docs resolves first-win") {
    initLog()
    // the boilerplate-heavy shape segment dedup exists for: ONE segment
    // ("the viral one") planted in 50 docs, each doc otherwise unique.
    // The argmin resolve must keep exactly doc 0's copy and the per-doc
    // unique tails, whatever the partition layout.
    val viral = spark.range(50).selectExpr("id AS doc_id",
      "concat('v i r a l', ' u', id, ' w', id) AS text")
      .repartition(7)
    val out = Segments.segmentDedup(viral, window = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.size == 50)
    // doc 0 keeps both its segments ("v i r a l" + its unique tail)
    assert(out(0L) == ((2L, 2L, md5Hex("v i r a l u0 w0"))))
    // every other doc loses the viral segment, keeps its unique tail
    (1L to 49L).foreach { d =>
      assert(out(d) == ((2L, 1L, md5Hex(s"u$d w$d"))))
    }
  }

  test("segmentDedup is invariant under input partitioning") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = Segments.segmentDedup(docs, window = 10)
    val b = Segments.segmentDedup(docs.repartition(7), window = 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("newline-paragraph corpus flows through both ops via paragraphs()") {
    initLog()
    // structured corpus: licence blurb is boilerplate (df=3), doc 0's
    // body paragraph repeats verbatim in doc 2
    val blurb = "licensed under cc"
    val docs = Seq(
      (0L, s"$blurb\nalpha body\nshared para"),
      (1L, s"$blurb\nbeta body"),
      (2L, s"$blurb\nshared para"),
      (3L, "free text only"))
      .toDF("doc_id", "text")
    val segs = Segments.paragraphs(docs)

    val dd = Segments.segmentDedupFrames(segs, sep = "\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // doc 0 owns the first occurrence of every one of its paragraphs
    assert(dd(0L) == ((3L, 3L, md5Hex(s"$blurb\nalpha body\nshared para"))))
    assert(dd(1L) == ((2L, 1L, md5Hex("beta body"))))
    // doc 2 loses blurb AND the shared paragraph
    assert(dd(2L) == ((2L, 0L, md5Hex(""))))
    assert(dd(3L) == ((1L, 1L, md5Hex("free text only"))))

    val sc = Segments.boilerplateScrubFrames(segs, dfThreshold = 3, sep = "\n")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // only the blurb reaches df>=3; "shared para" (df=2) survives everywhere
    assert(sc(0L) == ((3L, 1L, md5Hex("alpha body\nshared para"))))
    assert(sc(1L) == ((2L, 1L, md5Hex("beta body"))))
    assert(sc(2L) == ((2L, 1L, md5Hex("shared para"))))
    assert(sc(3L) == ((1L, 0L, md5Hex("free text only"))))
  }

  test("dedup and scrub agree on untouched docs; counts reconcile") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val dd = Segments.segmentDedup(docs, window = 10)
    // every doc emits a row; kept <= segs; total drops match the
    // corpus-wide duplicate-segment count computed independently
    val n = docs.count()
    assert(dd.count() == n)
    assert(dd.filter(col("n_kept") > col("n_segs")).isEmpty)
    val dupSegs = Segments.segmented(docs, 10)
      .groupBy(col("seg")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - 1)).head.getLong(0)
    val dropped = dd.agg(sum(col("n_segs") - col("n_kept"))).head.getLong(0)
    assert(dropped == dupSegs)
  }
}
