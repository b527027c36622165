package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.operators.Par

/** Split-starvation guard specs — the row-group-aware half: parquet
  * splits at row-group boundaries, so a byte-ample estimate over a
  * few oversized row groups must still fire the guard.
  */
class ParSpec extends GraftSpecBase {

  private def partitions(df: DataFrame): Int = df.rdd.getNumPartitions

  private def hasRepartition(df: DataFrame): Boolean =
    df.queryExecution.logical.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }.nonEmpty

  test("oversized row groups: byte estimate says ample, footer says " +
      "starved — the guard fires on the footer truth") {
    initLog()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rg").toString
    // one file, ONE row group (default 128 MB block ≫ file size),
    // but enough bytes that a small maxPartitionBytes setting makes
    // the byte estimate ≥ target
    (0 until 5000).map(i => (i.toLong, "x" * 200))
      .toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val df = spark.read.parquet(dir)
      // sanity: bytes/maxSplit ≥ shuffle target (the pre-fix no-op
      // condition), yet the scan can physically yield only 1 split
      val bytes = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      val target = spark.sessionState.conf.numShufflePartitions
      assert(bytes / 4096 >= target,
        s"fixture too small: $bytes bytes, target $target")
      // the scan PLANS byte-range partitions, but a range with no
      // row-group midpoint reads nothing: the real work lands on ONE
      // partition — exactly the starvation the byte estimate misses
      val nonEmpty = df.rdd
        .mapPartitions(it => Iterator(if (it.hasNext) 1 else 0))
        .collect().sum
      assert(nonEmpty == 1,
        s"fixture must starve: $nonEmpty non-empty of ${partitions(df)}")
      val ensured = Par.ensure(df)
      assert(hasRepartition(ensured),
        "guard must fire: footer shows 1 row group < target")
      assert(partitions(ensured) == target)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("many row groups: footer confirms the byte estimate and the " +
      "guard stays a no-op") {
    initLog()
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_rg2").toString
    // force tiny row groups so the file carries ≥ target of them
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      (0 until 5000).map(i => (i.toLong, "x" * 200))
        .toDF("id", "text").coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", "4096")
        .option("parquet.page.size", "1024")
        .parquet(dir)
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      val df = spark.read.parquet(dir)
      val target = spark.sessionState.conf.numShufflePartitions
      // footer truth: enough row groups to feed every core
      val hconf = spark.sessionState.newHadoopConf()
      val rgs = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f.getPath), hconf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try r.getRowGroups.size finally r.close()
        }.sum
      assert(rgs >= target, s"fixture grew only $rgs row groups")
      assert(!hasRepartition(Par.ensure(df)),
        "ample row groups must keep the guard lazy (no scan-copy)")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("byte-starved input still fires without any footer read " +
      "(the pre-existing path is unchanged)") {
    initLog()
    val docs = graft.sources.Tables.documents(spark, sf)
    // sf0.001 documents ≪ maxPartitionBytes — byte estimate < target
    assert(hasRepartition(Par.ensure(docs)))
  }
}
