package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.streaming.GroupState

/** Runtime context handed to [[StatefulOperator]] callbacks — the analog
  * of arcon's `OperatorContext` (`/root/reference/arcon/src/stream/operator/mod.rs:71-158`):
  * event-time timer scheduling (`schedule_at`) and the current element
  * time. Keyed state is the `S` value threaded through the callbacks
  * (arcon separates state behind `ArconState`; here it is an explicit
  * value, checkpointed by the streaming state store).
  */
final class OperatorContext(val currentTime: Option[Long]) {
  private[operators] val scheduled = mutable.ArrayBuffer.empty[Long]

  /** Schedule an event-time timer for this key; fires when the watermark
    * passes `ts` — `ProcessorContext::schedule_at`. Multiple live timers
    * per key are supported, as in the reference's quad-wheel
    * (arcon/src/stream/node/timer.rs:61-274): the framework keeps the
    * pending MULTISET in state (two timers at the same instant fire
    * twice, like the reference's per-entry firing) and arms Spark's
    * single per-group timeout at the earliest entry, re-arming as
    * timers fire. */
  def scheduleAt(ts: Long): Unit = scheduled += ts
}

/** The reference's `Operator` trait re-expressed for Spark
  * (`arcon/src/stream/operator/mod.rs:21-54`):
  * `handle_element(elem, ctx) -> out iterator` with keyed state and
  * event-time timers, plus `handle_timeout`. Runs on
  * `flatMapGroupsWithState` (unbounded) or an ordered per-key replay
  * (bounded).
  */
trait StatefulOperator[K, IN, S, OUT] extends Serializable {
  /** Initial per-key state (`OperatorState` construction). */
  def initialState: S

  /** Process one element; returns the new state and any outputs. */
  def handleElement(key: K, element: IN, timestamp: Option[Long], state: S,
      ctx: OperatorContext): (S, Iterator[OUT])

  /** Event-time timer callback (watermark passed the scheduled time;
    * `ctx.currentTime` is the fired timer's timestamp). */
  def handleTimeout(key: K, state: S, ctx: OperatorContext): (S, Iterator[OUT]) =
    (state, Iterator.empty)
}

object StatefulOperator {

  /** Pending timers as a sorted MULTISET (timestamp → count): two timers
    * scheduled at the same instant for a key fire as two `handleTimeout`
    * invocations, exactly like the reference quad-wheel, which fires
    * each scheduled entry (timer.rs:61-274). */
  private[operators] final class TimerQueue {
    private val m = mutable.TreeMap.empty[Long, Int]
    def nonEmpty: Boolean = m.nonEmpty
    def head: Long = m.firstKey
    def removeOne(t: Long): Unit = m.get(t) match {
      case Some(1) => m.remove(t)
      case Some(n) => m.update(t, n - 1)
      case None    =>
    }
    def add(t: Long): Unit = m.update(t, m.getOrElse(t, 0) + 1)
    def addAll(ts: Iterable[Long]): Unit = ts.foreach(add)
    def size: Int = m.valuesIterator.sum
    def iterator: Iterator[Long] =
      m.iterator.flatMap { case (t, n) => Iterator.fill(n)(t) }
  }

  /** Pending timers ride the group state as packed bytes so any `S` works
    * without extra encoders (the reference persists timer entries in its
    * state backend the same way — timer.rs:91-127). */
  private[operators] def packTimers(ts: TimerQueue): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(ts.size * 8)
    ts.iterator.foreach(bb.putLong)
    bb.array()
  }

  private[operators] def unpackTimers(b: Array[Byte]): TimerQueue = {
    val s = new TimerQueue
    if (b != null) {
      val bb = java.nio.ByteBuffer.wrap(b)
      while (bb.hasRemaining) s.add(bb.getLong)
    }
    s
  }

  /** Adapt to Spark's `flatMapGroupsWithState` function (streaming path).
    * Elements within a micro-batch arrive unordered — same as the
    * reference, which only guards against elements older than the
    * watermark (`arcon/src/stream/node/mod.rs:293-305`); Spark applies
    * the same watermark filtering before stateful operators.
    *
    * Group state = (user state, packed pending timers). On timeout, every
    * pending timer at or before the watermark fires in time order —
    * timers scheduled from `handleTimeout` itself included — then the
    * earliest remaining timer is re-armed.
    */
  def asFlatMapFunc[K, IN, S, OUT](op: StatefulOperator[K, IN, S, OUT],
      timeFn: Option[IN => Long], timersEnabled: Boolean):
      (K, Iterator[IN], GroupState[(S, Array[Byte])]) => Iterator[OUT] = {
    (key, elems, gstate) =>
      var (state, timerBytes) = gstate.getOption.getOrElse((op.initialState, Array.empty[Byte]))
      val timers = unpackTimers(timerBytes)
      val buf = mutable.ArrayBuffer.empty[OUT]
      if (gstate.hasTimedOut) {
        val wm = gstate.getCurrentWatermarkMs()
        while (timers.nonEmpty && timers.head <= wm) {
          val t = timers.head
          timers.removeOne(t)
          val ctx = new OperatorContext(Some(t))
          val (s2, out) = op.handleTimeout(key, state, ctx)
          state = s2
          buf ++= out
          timers.addAll(ctx.scheduled)
        }
      } else {
        elems.foreach { e =>
          val ts = timeFn.map(f => f(e))
          val ctx = new OperatorContext(ts)
          val (s2, out) = op.handleElement(key, e, ts, state, ctx)
          state = s2
          buf ++= out
          timers.addAll(ctx.scheduled)
        }
      }
      gstate.update((state, packTimers(timers)))
      if (timersEnabled && timers.nonEmpty) {
        // Spark requires the timeout timestamp be beyond the watermark;
        // overdue timers re-fire on the next no-data micro-batch.
        val wm = gstate.getCurrentWatermarkMs()
        gstate.setTimeoutTimestamp(math.max(timers.head, wm + 1))
      }
      buf.iterator
  }

  /** Bounded (batch) execution: replay this key's elements in event-time
    * order, firing due timers as time advances, then fire all remaining
    * timers (end-of-input watermark = +∞, like the reference tests'
    * final max-watermark flush). */
  def runBounded[K, IN, S, OUT](op: StatefulOperator[K, IN, S, OUT],
      timeFn: Option[IN => Long], key: K, elems: Iterator[IN]): Iterator[OUT] = {
    val ordered = timeFn match {
      case Some(f) => elems.toSeq.sortBy(f)
      case None => elems.toSeq
    }
    var state = op.initialState
    val timers = new TimerQueue
    val buf = mutable.ArrayBuffer.empty[OUT]

    def fireDue(now: Long): Unit =
      while (timers.nonEmpty && timers.head <= now) {
        val t = timers.head
        timers.removeOne(t)
        val ctx = new OperatorContext(Some(t))
        val (s2, out) = op.handleTimeout(key, state, ctx)
        state = s2
        buf ++= out
        timers.addAll(ctx.scheduled)
      }

    ordered.foreach { e =>
      val ts = timeFn.map(f => f(e))
      ts.foreach(fireDue)
      val ctx = new OperatorContext(ts)
      val (s2, out) = op.handleElement(key, e, ts, state, ctx)
      state = s2
      buf ++= out
      timers.addAll(ctx.scheduled)
    }
    // end of stream: watermark -> +inf, fire everything left
    fireDue(Long.MaxValue)
    buf.iterator
  }
}
