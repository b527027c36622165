package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout clustering on a Z-order (Morton) curve — the
  * multi-dimensional file-clustering step (Delta OPTIMIZE ZORDER /
  * Iceberg sort-order family) that makes min/max zone pruning work
  * for predicates on EITHER of two columns: rows sorted by the
  * interleaved key land in files whose per-column value ranges are
  * small boxes, so a scan with a filter on one dimension skips most
  * files. This is exactly the layout a 100 TB fact table wants under
  * ad-hoc two-column slicing.
  */
object Layout {

  /** Morton interleave of the low 16 bits of two non-negative int
    * columns: x occupies even bit positions, y odd. Pure codegen'd
    * bit algebra (32 shift-mask terms, no UDF, constant-folded
    * weights).
    */
  def zvalue16(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        (shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }

  /** The layout action: range-partition on the z-value (one range
    * shuffle — Spark samples split points, so partitions are
    * balanced even under key skew) and sort each partition by it.
    * Each output file then covers a contiguous z-range = a bounded
    * box in (x, y). Partition count follows the session's shuffle
    * parallelism; at deploy scale, size it to the target file count.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val withZ = df.withColumn("zval", zvalue16(col(xCol), col(yCol)))
    withZ.repartitionByRange(col("zval")).sortWithinPartitions(col("zval"))
  }

  /** Driver query — the pruning-quality report for a z-layout of
    * lineitem on (l_partkey, l_suppkey): bucket the z-space into 64
    * equal-width cells (stand-ins for files) and emit each cell's
    * row count and per-dimension min/max box. Tight boxes == a
    * selective scan skips the cell. The z max rides a broadcast
    * 1-row aggregate; everything else is map + one hash agg.
    */
  def zorderCells(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .withColumn("zval", zvalue16(col("l_partkey"), col("l_suppkey")))
    val zmax = li.agg(max(col("zval")).as("z_max"))
    li.crossJoin(broadcast(zmax))
      .groupBy(floor(col("zval") * 64.0 / (col("z_max") + 1))
        .cast("long").as("cell"))
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_part"),
        max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"),
        max(col("l_suppkey")).as("max_supp"))
  }

  /** Small-files compaction (the Delta/Iceberg OPTIMIZE bin-packing
    * analog): rewrite a fragmented parquet directory into
    * ≈ targetFileBytes files. Streaming sinks and fine-grained
    * ingests leave thousands of KB-scale files per partition; at
    * 100 TB the resulting driver-side listing and per-file task
    * overhead dominate scan time long before the bytes do.
    *
    * File count derives from the directory's ACTUAL bytes
    * (`ceil(inputBytes / targetFileBytes)`, floor 1); the rewrite is
    * one RoundRobin repartition — even output sizes by construction,
    * no sampling pass, no sort (use [[clusterByZ]] first when the
    * table also wants zone-pruning order; compaction preserves any
    * within-partition order it is given). Returns the file count it
    * wrote. Parquet-size inflation vs raw bytes is bounded by the
    * source being parquet too — targets are honored within codec
    * variance, which is what OPTIMIZE promises as well.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "compact: targetFileBytes must be > 0")
    // spark.read is LAZY: an overwrite into the input directory would
    // delete the source before it is fully read — refuse up front.
    // OVERLAP, not just equality: overwriting an ANCESTOR of inPath
    // recursively deletes the input too, and writing INTO the input
    // dir pollutes every later scan of it — both directions refuse.
    val inCanon =
      new java.io.File(inPath.stripPrefix("file:")).getCanonicalPath
    val outCanon =
      new java.io.File(outPath.stripPrefix("file:")).getCanonicalPath
    val sep = java.io.File.separator
    require(inCanon != outCanon &&
        !inCanon.startsWith(outCanon + sep) &&
        !outCanon.startsWith(inCanon + sep),
      s"compact: outPath ($outPath) overlaps inPath ($inPath) — " +
        "write.mode(overwrite) would destroy or pollute the input")
    // parquetOnly: the target file count derives from DATA bytes —
    // _SUCCESS/.crc sidecars don't survive the rewrite and must not
    // inflate it. Non-local schemes fail loud (see localInputBytes).
    val total = graft.GraftSession.localInputBytes(inPath, parquetOnly = true)
    val nFiles = math.max(1,
      math.ceil(total.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
