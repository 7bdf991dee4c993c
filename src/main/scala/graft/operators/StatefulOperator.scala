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
  private[operators] var scheduled: Option[Long] = None

  /** Schedule (or move) this key's event-time timer; fires when the
    * watermark passes `ts` — `ProcessorContext::schedule_at`. One live
    * timer per key (re-scheduling replaces), which is Spark's
    * `GroupState.setTimeoutTimestamp` model; the reference allows many
    * timers per key, so operators needing several keep them in `S` and
    * re-arm the earliest. */
  def scheduleAt(ts: Long): Unit = scheduled = Some(ts)
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

  /** Event-time timer callback (watermark passed the scheduled time). */
  def handleTimeout(key: K, state: S, ctx: OperatorContext): (S, Iterator[OUT]) =
    (state, Iterator.empty)
}

object StatefulOperator {

  /** Adapt to Spark's `flatMapGroupsWithState` function (streaming path).
    * Elements within a micro-batch arrive unordered — same as the
    * reference, which only guards against elements older than the
    * watermark (`arcon/src/stream/node/mod.rs:293-305`); Spark applies
    * the same watermark filtering before stateful operators. */
  def asFlatMapFunc[K, IN, S, OUT](op: StatefulOperator[K, IN, S, OUT],
      timeFn: Option[IN => Long]): (K, Iterator[IN], GroupState[S]) => Iterator[OUT] = {
    (key, elems, gstate) =>
      if (gstate.hasTimedOut) {
        val ctx = new OperatorContext(None)
        val (s2, out) = op.handleTimeout(key, gstate.get, ctx)
        gstate.update(s2)
        ctx.scheduled.foreach(gstate.setTimeoutTimestamp)
        out
      } else {
        var state = gstate.getOption.getOrElse(op.initialState)
        val buf = mutable.ArrayBuffer.empty[OUT]
        var timer: Option[Long] = None
        elems.foreach { e =>
          val ts = timeFn.map(f => f(e))
          val ctx = new OperatorContext(ts)
          val (s2, out) = op.handleElement(key, e, ts, state, ctx)
          state = s2
          buf ++= out
          if (ctx.scheduled.isDefined) timer = ctx.scheduled
        }
        gstate.update(state)
        timer.foreach(gstate.setTimeoutTimestamp)
        buf.iterator
      }
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
    var timer: Option[Long] = None
    val buf = mutable.ArrayBuffer.empty[OUT]

    def fireDue(now: Long): Unit =
      while (timer.exists(_ <= now)) {
        timer = None
        val ctx = new OperatorContext(Some(now))
        val (s2, out) = op.handleTimeout(key, state, ctx)
        state = s2
        buf ++= out
        timer = ctx.scheduled
      }

    ordered.foreach { e =>
      val ts = timeFn.map(f => f(e))
      ts.foreach(fireDue)
      val ctx = new OperatorContext(ts)
      val (s2, out) = op.handleElement(key, e, ts, state, ctx)
      state = s2
      buf ++= out
      if (ctx.scheduled.isDefined) timer = ctx.scheduled
    }
    // end of stream: watermark -> +inf, fire everything left
    fireDue(Long.MaxValue)
    buf.iterator
  }
}
