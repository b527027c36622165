package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends GraftSpecBase {
  import spark.implicits._

  test("patchGrid emits the strided ViT patch grid with RGB888 offsets") {
    initLog()
    val docs = Seq((0L, "x"), (63L, "y")).toDF("doc_id", "text")
    val out = Multimodal.patchGrid(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    // doc 0: 8x8 image -> one 16px patch at (0,0), offset 0
    // doc 63: 512x128 -> nx=32, ny=8; stride 4 keeps px∈{0,4..28}, py∈{0,4}
    assert(out.keySet.count(_._1 == 0L) == 1)
    assert(out((0L, 0L, 0L)) == 0L)
    val d63 = out.keySet.filter(_._1 == 63L)
    assert(d63.map(_._2) == Set(0L, 4L, 8L, 12L, 16L, 20L, 24L, 28L))
    assert(d63.map(_._3) == Set(0L, 4L))
    // row-major RGB888: (py*16*width + px*16) * 3
    assert(out((63L, 4L, 4L)) == (4L * 16L * 512L + 4L * 16L) * 3L)
  }

  test("patchGrid at stride 1 covers the full grid a ViT consumes") {
    initLog()
    val docs = Seq((63L, "y")).toDF("doc_id", "text")
    val n = Multimodal.patchGrid(docs, patch = 16, stride = 1).count()
    assert(n == 32L * 8L)
  }

  test("phashDedup: payload twins collide at Hamming 0, a one-block " +
      "edit stays within the radius, unrelated payloads do not pair; " +
      "boundary arithmetic matches integer division") {
    initLog()
    import spark.implicits._
    // payloads >= 64 chars; 300/301 are byte-identical, 302 is mk(0)
    // with ONE mid-block character replaced, 303 is unrelated. A
    // mid-block edit perturbs exactly one block's md5 nibble, but an
    // arbitrary nibble flip can reach Hamming 4 — past the default
    // radius 3 — so the replacement character is SEARCHED so the
    // nibble XOR has bit-count 1..3 (deterministic: first match wins)
    val mk = (seed: Int) => (0 until 90).map(i =>
      ('a' + ((i * 31 + seed * 17) % 26)).toChar).mkString
    val base = mk(0)
    // 90 chars / 15 blocks = 6-char blocks at [6j, 6j+6); position 20
    // sits mid-block in block 3 (chars 18..23)
    def blockNibble(t: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.substring(18, 24).getBytes("UTF-8"))
      (d(0) >> 4) & 0xf
    }
    val origNib = blockNibble(base)
    val (edited, expectHamming) = ('a' to 'z').iterator
      .map(ch => base.updated(20, ch))
      .map(t => (t, Integer.bitCount(blockNibble(t) ^ origNib)))
      .find { case (t, h) => t != base && h >= 1 && h <= 3 }.get
    val docs = Seq((300L, base), (301L, base), (302L, edited),
      (303L, mk(7))).toDF("doc_id", "text")
    val pairs = graft.operators.Multimodal.phashDedup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSet == Set(
      (300L, 301L, 0L),
      (300L, 302L, expectHamming.toLong),
      (301L, 302L, expectHamming.toLong)), pairs.toSeq)
    assert(expectHamming >= 1 && expectHamming <= 3)
    // floor(j*n/15.0) == (j*n)//15 for every block index across a
    // sweep of lengths (the oracle's integer-division twin)
    (60 to 200).foreach { n =>
      (0 to 15).foreach { j =>
        assert(math.floor(j.toDouble * n / 15.0).toLong == (j.toLong * n) / 15,
          s"boundary mismatch at j=$j n=$n")
      }
    }
    // short payloads are excluded (constant empty-block nibbles would
    // make every tiny payload collide)
    val tiny = Seq((1L, "abc"), (2L, "abd")).toDF("doc_id", "text")
    assert(graft.operators.Multimodal.phashDedup(tiny).count() == 0)
  }
}
