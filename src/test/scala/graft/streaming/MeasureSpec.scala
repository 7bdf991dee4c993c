package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Pins the nearest-rank percentile used for the per-batch latency
  * report (`batch_latency_ms` in the bench artifact). The pre-r11 floor
  * form returned the sample MAX as "p95" for every leg under 21 batches
  * (ADVICE r10) — exactly the regime the 5-run AvailableNow legs run in
  * — so these cases pin the small-N behavior explicitly. No Spark
  * session needed: the statistic is pure. */
class MeasureSpec extends AnyFunSuite {

  private def nr(xs: Seq[Long], p: Double): Long =
    Measure.nearestRank(xs.toArray.sorted, p)

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("nearest-rank p95 is below max for N in 2..20 (the old floor form returned max)") {
    // distinct ascending samples: order statistics all differ, so a
    // degenerate p95==max is detectable for every N where it matters
    for (n <- 2 to 20) {
      val xs = (1L to n.toLong).toSeq
      val p95 = nr(xs, 0.95)
      assert(p95 == math.ceil(n * 0.95).toLong, s"N=$n")
      if (math.ceil(n * 0.95).toLong < n)
        assert(p95 < xs.max, s"N=$n: p95 must not degenerate to max")
    }
    // the textbook boundary: N=20 → ceil(19.0)=19th of 20, NOT the max
    assert(nr(1L to 20L, 0.95) == 19L)
    // N=21 → ceil(19.95)=20th of 21, still below max
    assert(nr(1L to 21L, 0.95) == 20L)
  }

  test("nearest-rank p50 is the lower median; p100 is max; p→0 clamps to min") {
    assert(nr(Seq(1L, 2L, 3L, 4L), 0.50) == 2L)
    assert(nr(Seq(1L, 2L, 3L), 0.50) == 2L)
    assert(nr(Seq(5L), 0.95) == 5L)
    assert(nr(Seq(7L, 9L), 1.00) == 9L)
    assert(nr(Seq(7L, 9L), 0.0) == 7L)
  }

  test("nearest-rank is monotone in p and always an actual sample value") {
    val xsGen: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L))
    val pGen: Gen[Double] = Gen.chooseNum(0.0, 1.0)
    check(Prop.forAll(xsGen, pGen, pGen) {
      (xs: List[Long], p1: Double, p2: Double) =>
        val lo = math.min(p1, p2)
        val hi = math.max(p1, p2)
        val a = nr(xs, lo)
        val b = nr(xs, hi)
        a <= b && xs.contains(a) && xs.contains(b)
    })
  }
}
