package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench failure-accounting contract (ADVICE r13): a failed
  * execution (NaN sample) must never contribute a fabricated floor or
  * first-shot, and an all-failed query must come out as NaN/NaN so the
  * caller excludes it from every total instead of publishing a
  * time-to-failure as the registry's fastest query.
  */
class BenchSummarizeSpec extends AnyFunSuite {
  private val nan = Double.NaN

  test("clean samples: first = pass 1, floor = min") {
    assert(Bench.summarize(Seq(1.5, 0.9, 1.1)) == ((1.5, 0.9, 0)))
  }

  test("a failed pass is dropped from the floor and counted") {
    val (first, floor, failed) = Bench.summarize(Seq(1.5, nan, 1.1))
    assert(first == 1.5 && floor == 1.1 && failed == 1)
  }

  test("failed FIRST pass: first-shot is NaN, never a warm substitute") {
    // ADVICE r14: the single_shot column is the COLD-plan story; when
    // pass 1 fails, substituting the first successful (warm) pass would
    // silently skew it — the caller drops NaN firsts from the cold
    // map/total with failed_pass_counts as the receipt
    val (first, floor, failed) = Bench.summarize(Seq(nan, 1.2, 1.4))
    assert(first.isNaN && floor == 1.2 && failed == 1)
  }

  test("all passes failed: NaN/NaN, never a time-to-failure floor") {
    val (first, floor, failed) = Bench.summarize(Seq(nan, nan))
    assert(first.isNaN && floor.isNaN && failed == 2)
  }
}
