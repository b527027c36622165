package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends GraftSpecBase {
  import spark.implicits._

  test("packDocs: exact offsets and bins on a planted shard stream") {
    initLog()
    // token counts: id 0 -> 3, 1 -> 2, 2 -> 4, 3 -> 6, 4 -> 1, 5 -> 2
    val docs = Seq(
      (0L, "t t t"), (1L, "t t"), (2L, "t t t t"),
      (3L, "t t t t t t"), (4L, "t"), (5L, "t t"))
      .toDF("doc_id", "text")
    val out = Packing.packDocs(docs, nShards = 2, budget = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // shard 0: ids 0,2,4 -> offsets 0, 3, 7 -> bins 0, 0, 1
    assert(out(0L) == ((0L, 3L, 0L, 0L)))
    assert(out(2L) == ((0L, 4L, 3L, 0L)))
    assert(out(4L) == ((0L, 1L, 7L, 1L)))
    // shard 1: ids 1,3,5 -> offsets 0, 2, 8 -> bins 0, 0, 1
    assert(out(1L) == ((1L, 2L, 0L, 0L)))
    assert(out(3L) == ((1L, 6L, 2L, 0L)))
    assert(out(5L) == ((1L, 2L, 8L, 1L)))
  }

  test("packDocs offsets are the exact per-shard running sum on the corpus") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val rows = Packing.packDocs(docs).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._2).foreach { case (_, _, nTok, off) =>
        assert(off == cum)
        cum += nTok
      }
    }
  }

  test("packDocs is invariant under input partitioning") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    val a = Packing.packDocs(docs)
    val b = Packing.packDocs(docs.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
