package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench wall-clock-budget degradation path (r21, verdict #1:
  * BENCH_r20.json rc=124 — the driver's artifact was killed mid-suite by its
  * wall-clock cap; the budget degrades measurement instead of losing it).
  * The decisions are pure functions so this spec runs without Spark. */
class BenchBudgetSpec extends AnyFunSuite {

  test("within budget: base runs (and the extra-runs floor of 5) apply") {
    assert(Bench.runsFor(elapsedS = 100, budgetS = 2400, baseRuns = 3, extra = false) === 3)
    assert(Bench.runsFor(elapsedS = 100, budgetS = 2400, baseRuns = 3, extra = true) === 5)
    assert(Bench.runsFor(elapsedS = 100, budgetS = 2400, baseRuns = 7, extra = true) === 7)
    assert(Bench.runsFor(elapsedS = 2400, budgetS = 2400, baseRuns = 3, extra = false) === 3,
      "the boundary is exclusive: elapsed == budget still measures normally")
  }

  test("past budget: every query degrades to a single run, extra-runs set included") {
    assert(Bench.runsFor(elapsedS = 2401, budgetS = 2400, baseRuns = 3, extra = false) === 1)
    assert(Bench.runsFor(elapsedS = 2401, budgetS = 2400, baseRuns = 3, extra = true) === 1,
      "the variance-prone extra-runs set must degrade too — runs=5 past the " +
        "budget is exactly the overrun that killed r20's artifact")
    assert(Bench.runsFor(elapsedS = 9e9, budgetS = 2400, baseRuns = 1, extra = false) === 1)
  }

  test("self-heal reruns stop past the budget AND past the volume cap") {
    assert(Bench.selfHealAllowed(elapsedS = 100, budgetS = 2400, rerunsUsed = 0, cap = 60))
    assert(!Bench.selfHealAllowed(elapsedS = 2401, budgetS = 2400, rerunsUsed = 0, cap = 60),
      "no self-heal past the wall-clock budget")
    assert(!Bench.selfHealAllowed(elapsedS = 100, budgetS = 2400, rerunsUsed = 60, cap = 60),
      "the rerun VOLUME cap binds independently of the budget (r19: 242 " +
        "rerun pairs fired in one contended window)")
    assert(Bench.selfHealAllowed(elapsedS = 100, budgetS = 2400, rerunsUsed = 59, cap = 60))
  }
}
