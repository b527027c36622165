package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the boilerplateScrub exchange-sharing question
  * (VERDICT r6 #5): the segs subtree feeds both the df aggregate and
  * the join probe with no exchange boundary, so the segmentation map
  * stage (split + explode + slice + md5) runs twice. Variant B
  * repartitions segs on seg_md5 so both branches share ONE exchange
  * (ReusedExchange) — segmentation computed once — at the price of
  * (a) shipping full segment rows through that exchange and (b) the
  * df aggregate losing its map-side partial (the input is already
  * clustered, so a viral segment's every copy reaches one task's
  * aggregation state instead of collapsing per map task).
  *
  * Usage: runMain graft.tools.AbSegmentsExchange [sfDir] [reps]
  */
object AbSegmentsExchange {

  private def segmentedLocal(docs: DataFrame, window: Int): DataFrame =
    graft.operators.Segments.segmented(docs, window)

  /** Variant B: shared exchange via repartition on the segment hash. */
  def boilerplateScrubShared(docs: DataFrame, window: Int = 10,
      dfThreshold: Int = 2): DataFrame = {
    val segs = segmentedLocal(docs, window)
      .withColumn("seg_md5", md5(col("seg")))
      .repartition(col("seg_md5"))
    val dfs = segs
      .groupBy(col("seg_md5"))
      .agg(countDistinct(col("doc_id")).as("seg_df"))
    val joined = segs.join(dfs, "seg_md5")
    joined
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("seg_df") < dfThreshold, 0L).otherwise(1L)).as("n_boiler"),
        md5(array_join(
          array_sort(collect_list(when(col("seg_df") < dfThreshold,
            struct(col("seg_idx"), col("seg"))))).getField("seg"),
          " ")).as("clean_md5"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.GraftSession.local(cpus, "graft-ab-segments")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.documents(spark, sfDir)

    def time(label: String, mk: () => DataFrame): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = ts.min
      println(f"[ab] $label%-10s min=$best%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
      best
    }

    // interleave to equalize JIT/cache state
    time("warmup", () => graft.operators.Segments.boilerplateScrub(docs))
    val a = time("A-current", () => graft.operators.Segments.boilerplateScrub(docs))
    val b = time("B-shared", () => boilerplateScrubShared(docs))
    val a2 = time("A-current", () => graft.operators.Segments.boilerplateScrub(docs))
    val b2 = time("B-shared", () => boilerplateScrubShared(docs))
    println(f"[ab] RESULT A=${math.min(a, a2)}%.3f B=${math.min(b, b2)}%.3f")
    spark.stop()
  }
}
