package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench regression-gate unit specs (no Spark session needed). */
class BenchSpec extends AnyFunSuite {

  private val prev = Map("a" -> 1.0, "b" -> 2.0, "c" -> 0.5)

  test("regressedLanes flags >=2x lanes on a quiet same-sf run only") {
    val cur = Seq("a" -> 2.5, "b" -> 2.1, "c" -> 0.99, "new" -> 9.0)
    // a: 2.5x -> flagged; b: 1.05x fine; c: 1.98x fine; new: no prev
    assert(Bench.regressedLanes(prev, cur, noisy = false,
      sameSf = true) == Seq("a"))
    // exactly 2x counts as a regression (the gate is >= 2x)
    assert(Bench.regressedLanes(prev, Seq("c" -> 1.0), noisy = false,
      sameSf = true) == Seq("c"))
    // noisy host: contention inflates unevenly — never flag
    assert(Bench.regressedLanes(prev, cur, noisy = true,
      sameSf = true).isEmpty)
    // different sf dir (scale run sharing the cwd artifact): never flag
    assert(Bench.regressedLanes(prev, cur, noisy = false,
      sameSf = false).isEmpty)
  }

  test("regressedLanes ignores failed lanes on either side") {
    // current failure is reported via `failed`, not as a regression;
    // a previously-failed (-1) lane has no meaningful baseline
    val p = Map("x" -> -1.0, "y" -> 1.0)
    assert(Bench.regressedLanes(p, Seq("x" -> 5.0, "y" -> -1.0),
      noisy = false, sameSf = true).isEmpty)
  }

  test("quadratic-contract set matches the capped lanes") {
    assert(Bench.quadraticContract ==
      Set("dedup_embedding", "dedup_embedding_exact_hi"))
    // both lanes exist in the registry — a rename would silently
    // un-exclude them from total_nonquadratic
    assert(Bench.quadraticContract.subsetOf(SparkEntry.queries.keySet))
  }
}
