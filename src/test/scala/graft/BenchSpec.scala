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

  test("slowed calibration probe forces noisy and suppresses the " +
      "regressed field even at low loadavg (the r12 detector gap)") {
    // r12 shipped regressed:[4 lanes] at loadavg 2.78 on a uniformly
    // 1.37x-shifted suite — loadavg alone is not a contention signal.
    // A probe 3x over its quiet baseline must flip noisy...
    assert(Bench.noisyHost(loadavg = 2.78, probeMs = 4 * Bench.QuietProbeMs))
    assert(!Bench.noisyHost(loadavg = 2.78, probeMs = Bench.QuietProbeMs))
    // ...and loadavg still fires on its own
    assert(Bench.noisyHost(loadavg = 5.0, probeMs = Bench.QuietProbeMs))
    // noisy suppresses the regression gate end to end
    val cur = Seq("a" -> 2.5)
    val noisy = Bench.noisyHost(2.78, 4 * Bench.QuietProbeMs)
    assert(Bench.regressedLanes(prev, cur, noisy = noisy,
      sameSf = true).isEmpty)
    // the probe itself runs and returns a plausible figure (smoke —
    // an unJITed or dead-code-eliminated loop would return ~0)
    val ms = Bench.calibrationProbeMs()
    assert(ms > 1.0 && ms < 60000.0, s"probe measured $ms ms")
  }

  test("quiet baseline is the rolling min — a slower host is its own " +
      "reference, never permanently noisy") {
    // first run on any box: its own baseline — probe-arm can't fire
    assert(Bench.quietBaseline(1100.0, None) == 1100.0)
    assert(!Bench.noisyHost(1.0, 1100.0,
      Bench.quietBaseline(1100.0, None)))
    // history converges downward: min(prev, current)
    assert(Bench.quietBaseline(1100.0, Some(950.0)) == 950.0)
    assert(Bench.quietBaseline(900.0, Some(950.0)) == 900.0)
    // with a real quiet history, a 3x-slowed probe flags
    assert(Bench.noisyHost(1.0, 1100.0,
      Bench.quietBaseline(1100.0, Some(340.0))))
    // a garbage prev (<= 0, corrupted artifact) is ignored
    assert(Bench.quietBaseline(400.0, Some(0.0)) == 400.0)
  }

  test("quadratic-contract set matches the capped lanes") {
    assert(Bench.quadraticContract ==
      Set("dedup_embedding", "dedup_embedding_exact_hi"))
    // both lanes exist in the registry — a rename would silently
    // un-exclude them from total_nonquadratic
    assert(Bench.quadraticContract.subsetOf(SparkEntry.queries.keySet))
  }
}
