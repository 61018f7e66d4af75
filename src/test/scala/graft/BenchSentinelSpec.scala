package graft

import org.scalatest.funsuite.AnyFunSuite

/** The contention sentinel's tier thresholds, exercised with synthetic
  * probe values (no actual load generation — deterministic). The round-8
  * failure mode this pins: a box floored at ~1.5× the idle probe distorted
  * per-query tails but stayed under the single 2× `contended` flag, so the
  * dirty artifact did not self-mark. The `degraded` tier must catch that
  * half-load band.
  */
class BenchSentinelSpec extends AnyFunSuite {

  private val ref = Bench.ProbeRefSec

  test("idle probe (at or under reference) is clean") {
    assert(Bench.contentionTier(ref) == "clean")
    assert(Bench.contentionTier(ref * 0.8) == "clean")
    // normal idle spread (committed idle runs sat at 0.33–0.46 s vs 0.40
    // reference) must not flag
    assert(Bench.contentionTier(0.46, refSec = 0.40) == "clean")
  }

  test("synthetic half-load (1.5x reference — the round-8 band) is degraded") {
    assert(Bench.contentionTier(ref * 1.5) == "degraded")
    assert(Bench.contentionTier(ref * 1.6) == "degraded")
    // the round-8 measured floor: probes 0.62–0.78 against a 0.40 reference
    assert(Bench.contentionTier(0.62, refSec = 0.40) == "degraded")
    assert(Bench.contentionTier(0.78, refSec = 0.40) == "degraded")
  }

  test("saturated load (over 2x reference) is contended") {
    assert(Bench.contentionTier(ref * 2.01) == "contended")
    assert(Bench.contentionTier(ref * 10) == "contended")
  }

  test("tier boundaries are exclusive at the threshold") {
    assert(Bench.contentionTier(ref * Bench.DegradedFactor) == "clean")
    assert(Bench.contentionTier(ref * Bench.ContendedFactor) == "degraded")
  }

  test("floor-dominated set names only declared queries (no rot)") {
    val declared = SparkEntry.queries.keySet
    val stale = Bench.FloorDominated -- declared
    assert(stale.isEmpty, s"FloorDominated entries not in SparkEntry.queries: $stale")
  }

  test("every streaming query is in the floor-dominated set") {
    // streaming queries pay a per-trigger scheduler/commit latch — none of
    // them belongs in the 3-rep compute tier
    val streaming = SparkEntry.queries.keySet.filter(_.contains("stream"))
    val missing = streaming -- Bench.FloorDominated
    assert(missing.isEmpty, s"streaming queries missing from FloorDominated: $missing")
  }
}
