package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B diagnosis for the 10× scale knees found in round 7:
  * q_basket_pairs (15× at 10× data) and dedup_incremental (12×).
  * Times each variant through the noop sink and prints the join
  * strategy lines from the final adaptive plan.
  * Usage: runMain graft.tools.AbAffinity [sfDir]
  */
object AbAffinity {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/sfx10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localFor(cpus, sfDir, "graft-ab-affinity")
    spark.sparkContext.setLogLevel("WARN")
    // The noop write runs its OWN QueryExecution — reading
    // df.queryExecution.executedPlan would show the PRE-adaptive plan
    // (under AQE, possibly a different join strategy than the one the
    // timed run used — the very thing this tool diagnoses). Capture
    // the executed QE via a listener instead; events arrive async, so
    // poll briefly after the write returns.
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String](null)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastPlan.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def time(name: String)(df: => DataFrame): Unit = {
      val d = df
      lastPlan.set(null)
      val t0 = System.nanoTime()
      d.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      val deadline = System.nanoTime() + 3000000000L
      while (lastPlan.get() == null && System.nanoTime() < deadline)
        Thread.sleep(50)
      val joins = Option(lastPlan.get()).getOrElse("").linesIterator
        .filter(l => l.contains("Join") || l.contains("Cartesian"))
        .map(_.trim.take(90)).toSeq
      println(f"[ab] $name%-28s $s%8.2fs  joins=${joins.size}")
      joins.foreach(j => println(s"[ab]     $j"))
    }
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    time("basket_pairs as shipped") {
      graft.operators.Affinity.basketPairs(li, "l_orderkey", "l_partkey")
    }
    time("basket_pairs bcast counts") {
      val it = li.select(col("l_orderkey").as("basket"),
        col("l_partkey").as("item")).distinct()
      val nB = it.select(col("basket")).distinct()
        .agg(count(lit(1)).as("n_total"))
      val ic = it.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      val pairs = it.as("a").join(it.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
        .agg(count(lit(1)).as("n_baskets"))
      pairs
        .join(broadcast(ic.select(col("item").as("item_a"),
          col("cnt").as("cnt_a"))), "item_a")
        .join(broadcast(ic.select(col("item").as("item_b"),
          col("cnt").as("cnt_b"))), "item_b")
        .crossJoin(broadcast(nB))
        .withColumn("lift", round(col("n_baskets").cast("double") /
          col("cnt_a") * col("n_total") / col("cnt_b"), 6))
        .select(col("item_a"), col("item_b"), col("n_baskets"), col("lift"))
        .orderBy(col("n_baskets").desc, col("item_a"), col("item_b"))
        .limit(50)
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val corpus = docs.filter(
      graft.operators.Sampling.inHashSample(col("doc_id"), 15))
    val delta = docs.filter(
      !graft.operators.Sampling.inHashSample(col("doc_id"), 15))
    time("incremental as shipped") {
      graft.operators.Governance.incrementalDedup(corpus, delta)
    }
    spark.stop()
  }
}
