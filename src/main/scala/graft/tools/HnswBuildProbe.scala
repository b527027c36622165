package graft.tools

import org.apache.spark.sql.functions._

/** Cost attribution for the shared ann_hnsw* lane build (the bench's
  * `hnsw_build_sec`): times each driver-visible stage of
  * [[graft.operators.Hnsw.buildGraph]] in isolation — the §1 "measure
  * first" pass behind the r17 build optimization. Usage:
  *   runMain graft.tools.HnswBuildProbe [sfDir] [reps]
  */
object HnswBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localFor(cpus, dir, "graft-hnsw-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(2000000L).selectExpr("sum(id * 2)").collect()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"HB $name%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to reps).foreach { i =>
      println(s"-- rep $i")
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val adj = t("buildGraph+ckpt") {
        graft.operators.Hnsw.buildGraph(e, dims0 = 64)
          .localCheckpoint(true)
      }
      t("count-only") { e.count() }
      t("adj rows") { adj.count() }
      adj.queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(false)
        case _ => ()
      }
    }
    spark.stop()
  }
}
