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

  test("compact: fragmented dir rewrites to the byte-derived file count") {
    initLog()
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact-")
    val in = base.resolve("in").toString
    val out = base.resolve("out").toString
    try {
      // fragment: 40 partitions over 4000 rows -> 40 tiny files
      (0L until 4000L).toDF("id").repartition(40)
        .write.parquet(in)
      val inFiles = new java.io.File(in).listFiles
        .count(_.getName.endsWith(".parquet"))
      assert(inFiles == 40, s"fixture wrote $inFiles files")
      def dirBytes(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
      val total = dirBytes(new java.io.File(in))
      val target = total / 4 // expect ceil(total/(total/4)) ≈ 4-5 files
      val n = Layout.compact(spark, in, out, targetFileBytes = target)
      val outFiles = new java.io.File(out).listFiles
        .count(_.getName.endsWith(".parquet"))
      assert(outFiles == n, s"reported $n, wrote $outFiles")
      assert(n >= 4 && n <= 5, s"n = $n for total=$total target=$target")
      // row parity and content parity
      val a = spark.read.parquet(in).as[Long].collect().sorted
      val b = spark.read.parquet(out).as[Long].collect().sorted
      assert(a.toSeq == b.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
    }
  }

  test("compact refuses outPath == inPath and non-local schemes") {
    initLog()
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact3-")
    try {
      val in = base.resolve("in").toString
      (0L until 10L).toDF("id").write.parquet(in)
      // same dir (lazy read + overwrite would destroy the input)
      val e = intercept[IllegalArgumentException](
        Layout.compact(spark, in, in))
      assert(e.getMessage.contains("overlaps"), e.getMessage)
      // …including when the spelling differs but the canonical path matches
      assertThrows[IllegalArgumentException](
        Layout.compact(spark, in, "file:" + base.resolve("x")
          .resolveSibling("in").toString))
      // …and when outPath is an ANCESTOR of inPath (overwrite would
      // recursively delete the input) or nested INSIDE it (the write
      // would pollute every later scan of the input dir)
      assertThrows[IllegalArgumentException](
        Layout.compact(spark, in, base.toString))
      assertThrows[IllegalArgumentException](
        Layout.compact(spark, in, s"$in/sub"))
      // remote scheme: fail loud, not 1-file fallback (localInputBytes)
      assertThrows[IllegalArgumentException](
        Layout.compact(spark, "hdfs://nn/t", base.resolve("out2").toString))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
    }
  }

  test("compact floors at one file and rejects nonsense targets") {
    initLog()
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact2-")
    try {
      val in = base.resolve("in").toString
      val out = base.resolve("out").toString
      (0L until 10L).toDF("id").repartition(5).write.parquet(in)
      val n = Layout.compact(spark, in, out,
        targetFileBytes = Long.MaxValue)
      assert(n == 1)
      assertThrows[IllegalArgumentException](
        Layout.compact(spark, in, out, targetFileBytes = 0L))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(base.toFile)
    }
  }
}
