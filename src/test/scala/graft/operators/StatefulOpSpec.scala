package graft.operators

import graft.SparkTestBase
import graft.api.Stream
import org.apache.spark.sql.Encoders

/** Ports of the reference's stateful-operator integration tests:
  *  - keyed enrichment keeping the first value per key
  *    (`/root/reference/arcon/src/test/keyby_integration.rs`: 256 keys,
  *    EnrichedEvent{data, key, firstVal})
  *  - custom operator with event-time timers
  *    (`/root/reference/examples/custom_operator.rs:12-87`: TimerOperator
  *    schedules +1000 ms and emits on timeout)
  */
case class KeyedEvent(data: Long, key: Int)
case class EnrichedEvent(data: Long, key: Int, firstVal: Long)
case class TimerOut(key: Int, kind: String, at: Long)
case class TaggedOut(tag: String, t: Long)

class StatefulOpSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful enrichment: first value per key sticks (keyby_integration.rs)") {
    val events = (0 until 1024).map(i => KeyedEvent(i.toLong, i % 256))
    val op = new StatefulOperator[Int, KeyedEvent, Long, EnrichedEvent] {
      def initialState: Long = -1L
      def handleElement(key: Int, e: KeyedEvent, ts: Option[Long], state: Long,
          ctx: OperatorContext): (Long, Iterator[EnrichedEvent]) = {
        val first = if (state == -1L) e.data else state
        (first, Iterator(EnrichedEvent(e.data, key, first)))
      }
    }
    val out = Stream.fromCollection(spark, events)
      .withTimestampExtractor(_.data) // arrival order = data order
      .keyBy(_.key)
      .operator(op)(Encoders.scalaLong, Encoders.product[EnrichedEvent])
      .debug()
    assert(out.size == 1024)
    // every key's firstVal is the smallest data seen for that key (= key index)
    out.groupBy(_.key).foreach { case (k, rows) =>
      assert(rows.forall(_.firstVal == k.toLong))
    }
  }

  test("event-time timers fire when time passes (custom_operator.rs TimerOperator)") {
    // Operator: on first element per key schedule a timer +1000ms; on
    // timeout emit a sentinel carrying the key.
    val op = new StatefulOperator[Int, KeyedEvent, Long, TimerOut] {
      def initialState: Long = 0L
      def handleElement(key: Int, e: KeyedEvent, ts: Option[Long], state: Long,
          ctx: OperatorContext): (Long, Iterator[TimerOut]) = {
        if (state == 0L) ctx.scheduleAt(ts.get + 1000)
        (state + 1, Iterator(TimerOut(key, "elem", ts.get)))
      }
      override def handleTimeout(key: Int, state: Long,
          ctx: OperatorContext): (Long, Iterator[TimerOut]) =
        (state, Iterator(TimerOut(key, "timeout", -1L)))
    }
    val events = Seq(KeyedEvent(1, 1), KeyedEvent(2, 1), KeyedEvent(1, 2))
    val out = Stream.fromCollection(spark, events)
      .withTimestampExtractor(e => e.data * 1000)
      .keyBy(_.key)
      .operator(op)(Encoders.scalaLong, Encoders.product[TimerOut])
      .debug()
    val byKind = out.groupBy(_.kind).view.mapValues(_.size).toMap
    assert(byKind("elem") == 3)
    assert(byKind("timeout") == 2) // one per key at end-of-stream flush
  }

  test("two timers at the same instant fire twice (per-entry multiset, timer.rs)") {
    val op = new StatefulOperator[Int, KeyedEvent, Long, TimerOut] {
      def initialState: Long = 0L
      def handleElement(key: Int, e: KeyedEvent, ts: Option[Long], state: Long,
          ctx: OperatorContext): (Long, Iterator[TimerOut]) = {
        if (state == 0L) { ctx.scheduleAt(ts.get + 1000); ctx.scheduleAt(ts.get + 1000) }
        (state + 1, Iterator.empty)
      }
      override def handleTimeout(key: Int, state: Long,
          ctx: OperatorContext): (Long, Iterator[TimerOut]) =
        (state, Iterator(TimerOut(key, "timeout", ctx.currentTime.get)))
    }
    val out = Stream.fromCollection(spark, Seq(KeyedEvent(1, 1)))
      .withTimestampExtractor(e => e.data * 1000)
      .keyBy(_.key)
      .operator(op)(Encoders.scalaLong, Encoders.product[TimerOut])
      .debug()
    assert(out.count(_.kind == "timeout") == 2)
    assert(out.map(_.at).distinct == Seq(2000L))
  }

  test("bounded replay is event-time ordered, timers interleave") {
    // Elements arrive out of order; timer set at first (by event time)
    // element +1500ms must fire BETWEEN elements, not at the end.
    val op = new StatefulOperator[Int, KeyedEvent, Long, TaggedOut] {
      def initialState: Long = 0L
      def handleElement(key: Int, e: KeyedEvent, ts: Option[Long], state: Long,
          ctx: OperatorContext): (Long, Iterator[TaggedOut]) = {
        if (state == 0L) ctx.scheduleAt(ts.get + 1500)
        (state + 1, Iterator(TaggedOut("elem", ts.get)))
      }
      override def handleTimeout(key: Int, state: Long,
          ctx: OperatorContext): (Long, Iterator[TaggedOut]) =
        (state, Iterator(TaggedOut("timeout", 0)))
    }
    // event times 1000, 3000 (unsorted input); timer at 2500 fires before 3000
    val events = Seq(KeyedEvent(3, 7), KeyedEvent(1, 7))
    val out = Stream.fromCollection(spark, events)
      .withTimestampExtractor(e => e.data * 1000)
      .keyBy(_.key)
      .operator(op)(Encoders.scalaLong, Encoders.product[TaggedOut])
      .debug()
    assert(out.map(_.tag) == Seq("elem", "timeout", "elem"))
  }
}
