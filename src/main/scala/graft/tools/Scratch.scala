package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Par, TextAnalysis}
import graft.sources.Tables

/** Ad-hoc profiling scratchpad (not part of the public surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/sf10x")
    val spark = graft.GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    time("scan count")(docs.count())
    val sh = Par.ensure(docs)
      .filter(size(split(col("text"), " ")) >= 4)
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), 4)).as("g"))
    time("shingle explode count")(sh.count())
    val hashed = sh.select(col("doc_id"),
      xxhash64(col("g")).as("h1"), xxhash64(lit(42L), col("g")).as("h2"))
    time("hashed count")(hashed.count())
    val bench = hashed.filter(col("doc_id") % 20 === 0)
      .select(col("h1"), col("h2")).distinct()
    time("bench distinct count")(bench.count())
    time("full contamination")(TextAnalysis.contamination(docs).count())
    time("full contamination again")(TextAnalysis.contamination(docs).count())
    spark.stop()
  }
}
