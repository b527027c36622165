package graft.tools

import graft.operators.Bpe

/** Wall-clock for deep BPE training — the measurement behind the
  * [[Bpe.trainMergesBatched]] claim that realistic merge counts
  * (GPT-2 ran 40k rounds of the same greedy loop) are driver-loop
  * feasible: batching applies the provably-safe ranked prefix per
  * round, so rounds ≪ R. Prints one JSON line with the merge count,
  * the distributed rounds actually taken (jobs), and seconds, for
  * sequential-vs-batched at the same R.
  *
  * Usage: runMain graft.tools.BpeScale [R] [sfDir]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val r = args.lift(0).map(_.toInt).getOrElse(256)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.localFor(cpus, dir, "graft-bpe-scale")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Tables.documents(spark, dir)
    // the synthetic corpora have small vocabularies that can fully
    // merge before deep R (sf0.1 exhausts at 88) — auto-cap at the
    // exhaustion point the trainer reports rather than failing the
    // measurement
    // cap discovery is a separate untimed pass so the measured runs
    // below are clean single trainings
    val r2 =
      try { Bpe.trainMergesBatched(docs, rounds = r, batch = 64); r }
      catch {
        case e: IllegalArgumentException if e.getMessage.contains("exhausted") =>
          "after (\\d+) merges".r.findFirstMatchIn(e.getMessage)
            .map(_.group(1).toInt).getOrElse(throw e)
      }
    val t0 = System.nanoTime()
    val batched = Bpe.trainMergesBatched(docs, rounds = r2, batch = 64)
    val tBatched = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val seq = Bpe.trainMerges(docs, rounds = r2)
    val tSeq = (System.nanoTime() - t1) / 1e9
    val equal = batched == seq
    println(f"""{"r_requested":$r,"r_effective":$r2,"sf":"$dir",""" +
      f""""batched_sec":$tBatched%.2f,"sequential_sec":$tSeq%.2f,""" +
      f""""equal":$equal}""")
    spark.stop()
  }
}
