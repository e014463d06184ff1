package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contamination gate's decision rules (VERDICT r13 next #1's
  * "a Bench unit test for the contamination verdict") — pure functions,
  * no Spark session. */
class BenchGateSpec extends AnyFunSuite {

  test("verdict: clean iff at least one pass ran under the gate") {
    assert(BenchGate.verdict(Seq(0.0, 0.0)) == "clean")
    assert(BenchGate.verdict(Seq(0.4, 0.02)) == "clean")
    assert(BenchGate.verdict(Seq(0.4, 0.35, 0.2, 0.11)) == "contaminated")
    // Boundary: the gate value itself is NOT contaminated (strict >).
    assert(BenchGate.verdict(Seq(BenchGate.EXT_LOAD_GATE)) == "clean")
    assert(BenchGate.verdict(Seq(BenchGate.EXT_LOAD_GATE + 1e-9)) ==
      "contaminated")
  }

  test("needAnotherPass: 2 baseline passes always; retries only while ALL " +
      "passes are contaminated; hard cap holds") {
    assert(BenchGate.needAnotherPass(Seq.empty))
    assert(BenchGate.needAnotherPass(Seq(0.0)))
    // Two clean passes: stop.
    assert(!BenchGate.needAnotherPass(Seq(0.0, 0.01)))
    // One clean among two: stop (the clean pass owns the mins).
    assert(!BenchGate.needAnotherPass(Seq(0.5, 0.0)))
    // Both contaminated: retry...
    assert(BenchGate.needAnotherPass(Seq(0.5, 0.4)))
    assert(BenchGate.needAnotherPass(Seq(0.5, 0.4, 0.3)))
    // ...until the cap.
    assert(!BenchGate.needAnotherPass(Seq(0.5, 0.4, 0.3, 0.2)))
    // A clean retry ends the loop before the cap.
    assert(!BenchGate.needAnotherPass(Seq(0.5, 0.4, 0.05)))
  }

  test("needAnotherPass (r16 convergence form): retries while the min-total " +
      "still drops >2% per pass; stops on convergence and at the cap") {
    val cap = BenchGate.MAX_PASSES
    // Baseline two passes regardless of totals.
    assert(BenchGate.needAnotherPass(Seq.empty, Seq.empty, cap))
    assert(BenchGate.needAnotherPass(Seq(0.0), Seq(100.0), cap))
    // Two quiet passes whose min-total barely moved: converged, stop.
    assert(!BenchGate.needAnotherPass(Seq(0.0, 0.0), Seq(100.0, 99.5), cap))
    // Pass 2 pulled the min-total down 20% (pass 1 was ambient-smeared
    // with a clean ext_load — the r15 failure mode): run pass 3.
    assert(BenchGate.needAnotherPass(Seq(0.0, 0.0), Seq(125.0, 100.0), cap))
    // Pass 3 found another 5%: keep going; then converge.
    assert(BenchGate.needAnotherPass(
      Seq(0.0, 0.0, 0.0), Seq(125.0, 100.0, 95.0), cap))
    assert(!BenchGate.needAnotherPass(
      Seq(0.0, 0.0, 0.0), Seq(125.0, 100.0, 99.2), cap))
    // Hard cap holds even while still improving.
    assert(!BenchGate.needAnotherPass(
      Seq(0.0, 0.0, 0.0, 0.0), Seq(125.0, 100.0, 90.0, 80.0), cap))
    // All-contaminated still retries (the r13 lane), same cap.
    assert(BenchGate.needAnotherPass(Seq(0.5, 0.4), Seq(100.0, 100.0), cap))
    assert(!BenchGate.needAnotherPass(
      Seq(0.5, 0.4, 0.3, 0.2), Seq(100.0, 100.0, 100.0, 100.0), cap))
  }

  test("keepQuiescing: bounded, gated on system CPU, blind witness never blocks") {
    assert(BenchGate.keepQuiescing(0L, 0.9))
    assert(!BenchGate.keepQuiescing(0L, 0.05)) // quiet machine: start now
    assert(!BenchGate.keepQuiescing(BenchGate.QUIESCE_MAX_MS, 0.9)) // bounded
    assert(!BenchGate.keepQuiescing(0L, -1.0)) // no witness -> no wait
  }

  test("ExtLoadSampler aggregates max(0, sys - proc) and drops invalid samples") {
    // Deterministic supplier: three valid samples (one where proc > sys,
    // clamped to 0) and one invalid (-1) that must be dropped.
    val feed = Iterator((0.8, 0.5), (0.2, 0.6), (-1.0, 0.3), (0.4, 0.3))
    val fed = new java.util.concurrent.atomic.AtomicInteger(0)
    val sampler = new ExtLoadSampler(
      supplier = () =>
        if (feed.hasNext) { fed.incrementAndGet(); feed.next() }
        else (-1.0, -1.0),
      periodMs = 1L)
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    while (fed.get() < 4 && System.nanoTime() < deadline) Thread.sleep(5)
    val mean = sampler.stopAndMean()
    assert(fed.get() >= 4, "sampler thread never drained the feed")
    // Valid externals: 0.3, 0.0 (clamped), 0.1 -> mean 0.4/3.
    assert(math.abs(mean - 0.4 / 3) < 1e-9, s"mean was $mean")
  }

  test("ExtLoadSampler with no valid samples reports 0 (never flags blind)") {
    val sampler = new ExtLoadSampler(supplier = () => (-1.0, -1.0), periodMs = 1L)
    Thread.sleep(20)
    assert(sampler.stopAndMean() == 0.0)
  }

  test("mean seam") {
    assert(ExtLoadSampler.mean(0.0, 0L) == 0.0)
    assert(ExtLoadSampler.mean(0.9, 3L) == 0.3)
  }
}
