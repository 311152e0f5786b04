package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench measurement protocol's decision table (round 10):
  * the published artifact's trustworthiness rests on these rules, so
  * they must not drift silently with a refactor. No SparkSession —
  * the decisions are pure.
  */
class BenchProtocolSpec extends AnyFunSuite {

  private def entry(medians: Double*): Bench.Entry =
    Bench.Entry(medians.map(s => Bench.Pass(s, 1.0, 0.0, 0.0)), 0.1)

  test("pins arm on the exact sf0.1 basename only") {
    assert(Bench.pinsArmedFor("/root/testdata/sf0.1"))
    assert(Bench.pinsArmedFor("/root/testdata/sf0.1/"))
    assert(!Bench.pinsArmedFor("/root/testdata/sf0.12"))
    assert(!Bench.pinsArmedFor("/root/testdata/sf0.1_old"))
    assert(!Bench.pinsArmedFor("/root/testdata/sf0.01"))
    // location-independent: an sf0.1 dataset elsewhere still arms
    assert(Bench.pinsArmedFor("/elsewhere/sf0.1"))
  }

  test("pin violation = armed AND pinned AND median > 3x committed") {
    val pin = Bench.Pins("replacing_latest")
    assert(Bench.isPinViolation("replacing_latest", pin * 3.01, true))
    assert(!Bench.isPinViolation("replacing_latest", pin * 2.9, true))
    // disarmed (wrong scale factor): never a violation
    assert(!Bench.isPinViolation("replacing_latest", pin * 100, false))
    // unpinned queries can't violate regardless of time
    assert(!Bench.isPinViolation("q1_pricing_summary", 999.0, true))
  }

  test("canary thresholds: suspect at >= 2x baseline, recovered at " +
      "<= 1.5x") {
    assert(Bench.isCanarySuspect(0.20, 0.10))
    assert(!Bench.isCanarySuspect(0.19, 0.10))
    assert(Bench.canaryRecoveredAt(0.15, 0.10))
    assert(!Bench.canaryRecoveredAt(0.16, 0.10))
  }

  test("publishedOf takes the lower median; a worse re-measure never " +
      "replaces the first reading") {
    val first = entry(1.0, 1.1, 1.2) // median 1.1
    val better = entry(0.4, 0.5, 0.6) // median 0.5
    val worse = entry(2.0, 2.1, 2.2)
    assert(Bench.publishedOf(first, Some(better)) eq better)
    assert(Bench.publishedOf(first, Some(worse)) eq first)
    assert(Bench.publishedOf(first, None) eq first)
  }

  test("Entry stats: median is the middle of 3 sorted passes, min/max " +
      "bound the spread") {
    val e = entry(1.2, 1.0, 1.1)
    assert(e.median == 1.1 && e.min == 1.0 && e.max == 1.2)
  }
}
