package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the bench harness's pure decision logic — no Spark
  * session. The stall guard's rules have driver-budget consequences
  * (round 10: an uncapped >2×-mover re-ran a genuinely-regressed
  * multi-minute query 3 extra times and the driver killed the bench at
  * its timeout, rc=124, no artifact of record), so the decision
  * function is pinned here rather than living only inside the loop.
  */
class BenchSpec extends AnyFunSuite {

  test("stall guard: no committed prior means no re-runs (new queries run unguarded)") {
    assert(Bench.stallGuard(None, 100.0) === ((0, false)))
    assert(Bench.stallGuard(Some(0.0), 100.0) === ((0, false)))
    assert(Bench.stallGuard(Some(-1.0), 100.0) === ((0, false)))
  }

  test("stall guard: readings within 2x of the prior are normal") {
    assert(Bench.stallGuard(Some(1.0), 1.9) === ((0, false)))
    assert(Bench.stallGuard(Some(1.0), 2.0) === ((0, false)))
  }

  test("stall guard: sub-0.5s jitter never burns reps even when >2x") {
    assert(Bench.stallGuard(Some(0.1), 0.4) === ((0, false)))
  }

  test("stall guard: a >2x mover under the ceiling re-runs min-of-3") {
    assert(Bench.stallGuard(Some(1.0), 3.0) === ((3, false)))
    assert(Bench.stallGuard(Some(20.0), 55.0) === ((3, false)))
  }

  test("stall guard: past the absolute ceiling it records once as suspect — never re-runs") {
    // the round-10 failure shape: prior 5.96s, exploded plan runs in
    // minutes; the old guard burned 3 more multi-minute reps
    assert(Bench.stallGuard(Some(5.96), 400.0) === ((0, true)))
    assert(Bench.stallGuard(Some(1.0), 61.0) === ((0, true)))
    // the ceiling binds only when the reading is ALSO a >2x mover: a
    // query whose committed prior is already slow stays unguarded
    assert(Bench.stallGuard(Some(50.0), 70.0) === ((0, false)))
  }

  test("artifact-of-record path: sf0.1 is the record, other scales are side files") {
    assert(Bench.artifactFor("/root/testdata/sf0.1") === "BENCH_FULL.json")
    assert(Bench.artifactFor("/root/testdata/sf0.01") === "BENCH_FULL_sf0.01.json")
    assert(Bench.artifactFor("/root/testdata/sf0.001") === "BENCH_FULL_sf0.001.json")
  }
}
