package graft.api

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (SURVEY §5 test plan): the assigner index math
  * and the three window indexes must agree under arbitrary inputs — the
  * reference's own equivalence (appender materializer ≡ incremental
  * fold, `arcon/src/index/window/mod.rs:5-61`), generalized. */
class WindowPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  test("windowsFor: every assigned window covers ts, aligns to slide, and the count is length/slide") {
    val gen = for {
      slide <- Gen.choose(1L, 1000L)
      mult <- Gen.choose(1, 8)
      ts <- Gen.choose(0L, 1000000L)
    } yield (slide * mult, slide, ts)
    check(Prop.forAll(gen) { case (length, slide, ts) =>
      val asg = WindowAssigner.Sliding(length, slide)
      val ws = asg.windowsFor(ts)
      val covers = ws.forall(s => s <= ts && ts < s + length)
      val aligned = ws.forall(s => s % slide == 0 && s >= 0)
      val distinct = ws.distinct.size == ws.size
      // length/slide windows overlap ts, fewer only near the epoch
      // where negative starts are clipped
      val expected = (length / slide).toInt
      val count = if (ts >= length - slide) ws.size == expected else ws.size <= expected
      covers && aligned && distinct && count
    }, minTests = 200)
  }

  test("windowsFor is consistent: s ∈ windowsFor(ts) ⇔ ts ∈ [s, s+length)") {
    val gen = for {
      slide <- Gen.choose(1L, 500L)
      mult <- Gen.choose(1, 6)
      ts <- Gen.choose(0L, 100000L)
      probe <- Gen.choose(0L, 40L)
    } yield (slide * mult, slide, ts, probe)
    check(Prop.forAll(gen) { case (length, slide, ts, probe) =>
      val asg = WindowAssigner.Sliding(length, slide)
      val s = (probe % (length / slide)) * slide // an aligned candidate start
      val in = asg.windowsFor(ts).contains(s)
      in == (s <= ts && ts < s + length)
    }, minTests = 200)
  }

  test("appender ≡ incrementalMerged ≡ arrowBatch on random event sets (window-index equivalence)") {
    val genEvents = Gen.listOfN(40, for {
      key <- Gen.choose(0, 3)
      ts <- Gen.choose(0L, 30000L)
      v <- Gen.choose(-50L, 50L)
    } yield Ev(key, ts, v))
    check(Prop.forAll(genEvents) { evs =>
      evs.isEmpty || {
        def base = Stream.fromCollection(spark, evs)
          .withTimestampExtractor(_.ts)
          .keyBy(_.key)
          .window(WindowAssigner.Sliding(lengthMs = 10000, slideMs = 5000))
        val inc = base.incrementalMerged[Long](_.v, (e, a) => a + e.v, _ + _).debug().toSet
        val app = base.appender(_.map(_.v).sum).debug().toSet
        val arr = base.arrowBatch(_.map(_.v).sum).debug().toSet
        inc == app && inc == arr
      }
    }, minTests = 5) // each sample runs 3 Spark jobs
  }
}
