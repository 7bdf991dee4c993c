package graft.api

import graft.SparkTestBase

/** Ports of the reference's window-index and window-assigner unit tests:
  *  - sum 0..9 = 45 / 0..19 = 190
  *    (`/root/reference/arcon/src/index/window/mod.rs:5-61`)
  *  - tumbling/sliding per-key window counts, overlapping slides, long
  *    windows (`/root/reference/arcon/src/stream/operator/window/assigner.rs:404-567`)
  */
case class Ev(key: Int, ts: Long, v: Long)

class WindowDslSpec extends SparkTestBase {
  import spark.implicits._

  private def stream(events: Seq[Ev]): Stream[Ev] =
    Stream.fromCollection(spark, events).withTimestampExtractor(_.ts)

  test("appender window sums 0..9 to 45 (index/window/mod.rs:16-33)") {
    val evs = (0 until 10).map(i => Ev(1, 1000L + i, i.toLong))
    val out = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Tumbling(lengthMs = 10000))
      .appender(elems => elems.map(_.v).sum)
      .debug()
    assert(out.map(_._4) == Seq(45L))
  }

  test("incremental window sums 0..19 to 190 (index/window/mod.rs:36-60)") {
    val evs = (0 until 20).map(i => Ev(1, 1000L + i, i.toLong))
    val out = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Tumbling(lengthMs = 60000))
      .incremental[Long](e => e.v, (e, acc) => acc + e.v)
      .debug()
    assert(out.map(_._4) == Seq(190L))
  }

  test("tumbling windows split by window start per key (assigner.rs tumbling tests)") {
    // two keys; key 1 has events in two distinct 10s windows
    val evs = Seq(
      Ev(1, 1000, 1), Ev(1, 5000, 1), Ev(1, 12000, 1),
      Ev(2, 3000, 1))
    val out = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Tumbling(lengthMs = 10000))
      .count.debug()
      .map(r => (r._1, r._2, r._4)).toSet
    assert(out == Set((1, 0L, 2L), (1, 10000L, 1L), (2, 0L, 1L)))
  }

  test("sliding windows: each element lands in length/slide windows (assigner.rs overlapping test)") {
    // length 10s slide 5s: element at 7s belongs to windows starting 0 and 5s
    val evs = Seq(Ev(1, 7000, 1))
    val out = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Sliding(lengthMs = 10000, slideMs = 5000))
      .count.debug()
      .map(r => (r._2, r._4)).toSet
    assert(out == Set((0L, 1L), (5000L, 1L)))
  }

  test("sliding window sums overlap correctly") {
    // events at 1s,6s,11s; windows(10s/5s): [0,10):{1,6} [5,15):{6,11} [10,20):{11} + [-,?) none below 0
    val evs = Seq(Ev(1, 1000, 10), Ev(1, 6000, 20), Ev(1, 11000, 40))
    val out = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Sliding(lengthMs = 10000, slideMs = 5000))
      .sum(_.v).debug()
      .map(r => (r._2, r._4)).toMap
    assert(out == Map(0L -> 30L, 5000L -> 60L, 10000L -> 40L))
  }

  test("empty windows are not emitted (assigner.rs empty-window test)") {
    val evs = Seq(Ev(1, 1000, 1), Ev(1, 95000, 1)) // gap leaves windows 10..90s empty
    val out = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Tumbling(lengthMs = 10000))
      .count.debug()
    assert(out.size == 2)
  }

  test("arrowBatch window UDF ≡ incremental ≡ appender (index/window/arrow.rs equivalence)") {
    // The reference's three window indexes must agree on the same fold;
    // arrowBatch hands the whole group to a batch fn (ArrowWindow analog),
    // appender buffers+sorts, incrementalMerged folds with map-side combine.
    val evs = (0 until 20).map(i => Ev(i % 2, 1000L + i * 700, i.toLong))
    def base = stream(evs).keyBy(_.key)
      .window(WindowAssigner.Tumbling(lengthMs = 5000))
    val inc = base.incrementalMerged[Long](e => e.v, (e, acc) => acc + e.v, _ + _)
      .debug().toSet
    val arrow = base.arrowBatch(it => it.map(_.v).sum).debug().toSet
    val app = base.appender(elems => elems.map(_.v).sum).debug().toSet
    assert(inc.nonEmpty)
    assert(arrow == inc)
    assert(app == inc)
  }

  test("window validation mirrors the reference (builder.rs:93-108)") {
    assertThrows[IllegalArgumentException] {
      WindowAssigner.Sliding(lengthMs = 10000, slideMs = 15000) // length < slide
    }
    assertThrows[IllegalArgumentException] {
      WindowAssigner.Sliding(lengthMs = 10000, slideMs = 3000) // not a multiple
    }
  }
}
