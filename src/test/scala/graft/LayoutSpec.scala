package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends GraftSpecBase {
  import spark.implicits._

  test("zvalue16 interleaves bits exactly (x even positions, y odd)") {
    initLog()
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L),
      (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zvalue16(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(out == Seq(0L, 1L, 2L, 3L, 14L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("z-cells bound both dimensions (the pruning-box property)") {
    initLog()
    // exhaustive 64x64 grid: every 64-wide z-cell must cover at most
    // a bounded box in (x, y) — the property file skipping relies on
    val grid = spark.range(0, 64L * 64L)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val boxes = grid
      .select(Layout.zvalue16(col("x"), col("y")).as("z"),
        col("x"), col("y"))
      .groupBy(floor(col("z") / 64).as("cell"))
      .agg(max(col("x")) - min(col("x")),
        max(col("y")) - min(col("y")), count(lit(1)))
      .collect()
    assert(boxes.length == 64)
    boxes.foreach { r =>
      assert(r.getLong(1) <= 7 && r.getLong(2) <= 7,
        s"cell ${r.getLong(0)} spans ${r.getLong(1)}x${r.getLong(2)}")
      assert(r.getLong(3) == 64L)
    }
  }

  test("clusterByZ is a range repartition + in-partition sort on zval") {
    initLog()
    val df = Layout.clusterByZ(
      graft.sources.Tables.lineitem(spark, sf)
        .select(col("l_partkey"), col("l_suppkey")),
      "l_partkey", "l_suppkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(zval"), plan.take(500))
    assert(plan.contains("Sort [zval"), plan.take(500))
  }
}
