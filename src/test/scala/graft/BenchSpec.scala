package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's contention self-adjudication (r21, verdict ask #1): the
  * r20 driver record shipped a 5.7×-inflated total flagged
  * `contended: false` because the relative rule (median vs the run's own
  * p10) is blind to steal that inflates the WHOLE measured window. The
  * verdict logic is a pure function so the spec drives it with synthetic
  * probe series — no load injection, no flaky timing.
  */
class BenchSpec extends AnyFunSuite {

  test("quiet run does not flag: median near both p10 and warmup floor") {
    val quiet = Seq.fill(60)(5.0) ++ Seq.fill(60)(6.5) // bimodal wake noise
    assert(!Bench.contentionVerdict(quiet, warmupFloor = 4.5))
  }

  test("relative rule flags a run whose median dwarfs its own quiet window") {
    // a short quiet head, then sustained steal: p10 stays low, median high
    val probes = Seq.fill(15)(5.0) ++ Seq.fill(105)(20.0)
    assert(Bench.contentionVerdict(probes, warmupFloor = -1.0))
  }

  test("floor rule flags the r20 mode: uniformly inflated measured window") {
    // every measured probe inflated ~4x — the run's own p10 is inflated
    // too, so the relative rule stays silent; the warmup floor catches it
    val uniform = Seq.fill(120)(20.0)
    assert(!Bench.contentionVerdict(uniform, warmupFloor = -1.0),
      "relative rule alone must NOT flag a uniformly inflated run (the r20 blind spot)")
    assert(Bench.contentionVerdict(uniform, warmupFloor = 5.0),
      "the warmup-floor rule must flag it")
  }

  test("floor rule tolerates the normal quiet-median-over-floor margin") {
    // quiet medians sit ~1.2-1.5x above the min-of-samples floor
    val quiet = Seq.fill(120)(6.8)
    assert(!Bench.contentionVerdict(quiet, warmupFloor = 5.0))
  }

  test("small runs and probe failures never flag") {
    assert(!Bench.contentionVerdict(Seq.fill(9)(100.0), warmupFloor = 1.0))
    assert(!Bench.contentionVerdict(Seq.fill(120)(-1.0), warmupFloor = 1.0))
    assert(!Bench.contentionVerdict(Nil, warmupFloor = 1.0))
  }

  test("suspect queries: degraded-probe passes are named, not removed") {
    val byQuery = Seq("q02_b" -> 20.0, "q01_a" -> 5.5, "q03_c" -> 13.0)
    assert(Bench.suspectQueries(byQuery, warmupFloor = 5.0) ==
      Seq("q02_b", "q03_c"))
    assert(Bench.suspectQueries(byQuery, warmupFloor = -1.0).isEmpty,
      "no floor -> no suspects (rule disabled, never all-suspect)")
  }
}
