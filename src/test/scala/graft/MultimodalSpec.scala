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
}
