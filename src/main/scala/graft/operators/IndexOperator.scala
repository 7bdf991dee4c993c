package graft.operators

import scala.collection.mutable
import graft.api.{IndexState, LocalIndexState}

/** Timer facade over the engine's native per-key timers — the
  * reference's `schedule_at`/quad-wheel surface
  * (`/root/reference/arcon/src/stream/node/timer.rs:61-274`): any number
  * of live timers per key, watermark-driven expiry. Streaming binds to
  * `StatefulProcessorHandle.registerTimer/deleteTimer`; bounded replay
  * keeps a sorted set. */
trait TimerContext {
  /** Arm a timer at `ts`. SET semantics, deliberately: timers here are
    * keyed by timestamp (scheduling the same instant twice coalesces to
    * one firing, and [[deleteTimer]] disarms by timestamp), mirroring
    * the engine's native `registerTimer`/`deleteTimer` surface that the
    * streaming binding maps onto. [[StatefulOperator]]'s `scheduleAt`
    * is the multiset/per-entry variant for reference-exact firing. */
  def scheduleAt(ts: Long): Unit
  def deleteTimer(ts: Long): Unit
  /** Current event-time watermark (Long.MinValue when unknown). */
  def watermark: Long
}

/** The modern face of the reference's custom `Operator` + `ArconState`
  * pair (`arcon/src/stream/operator/mod.rs:21-54` with
  * `#[derive(ArconState)]` indexes): the operator DECLARES named state
  * indexes in [[open]] (value/appender/map — arcon's index layer), then
  * handles elements and timer expirations against them. Runs on
  * `transformWithState` (streaming: indexes are engine-checkpointed
  * state variables, timers are native multi-timers) or a per-key ordered
  * replay with in-memory indexes (bounded).
  *
  * `open` may be invoked more than once (per partition for streaming,
  * per key for bounded replay) — implementations must simply (re)bind
  * their index fields from the given factory.
  */
trait IndexOperator[K, IN, OUT] extends Serializable {
  def open(state: IndexState): Unit
  def handleElement(key: K, element: IN, timestamp: Option[Long],
      ctx: TimerContext): Iterator[OUT]
  def handleTimer(key: K, firedAt: Long, ctx: TimerContext): Iterator[OUT] =
    Iterator.empty
}

object IndexOperator {

  /** Bounded (batch) execution of an [[IndexOperator]] for one key:
    * event-time-ordered replay with interleaved timer firing, then an
    * end-of-input flush (watermark → +∞), as in
    * [[StatefulOperator.runBounded]]. */
  def runBounded[K, IN, OUT](op: IndexOperator[K, IN, OUT],
      timeFn: Option[IN => Long], key: K, elems: Iterator[IN]): Iterator[OUT] = {
    op.open(new LocalIndexState)
    val ordered = timeFn match {
      case Some(f) => elems.toSeq.sortBy(f)
      case None => elems.toSeq
    }
    val timers = mutable.SortedSet.empty[Long]
    var wm = Long.MinValue
    val ctx = new TimerContext {
      def scheduleAt(ts: Long): Unit = timers += ts
      def deleteTimer(ts: Long): Unit = timers -= ts
      def watermark: Long = wm
    }
    val buf = mutable.ArrayBuffer.empty[OUT]
    def fireDue(now: Long): Unit =
      while (timers.nonEmpty && timers.head <= now) {
        val t = timers.head
        timers -= t
        wm = t
        buf ++= op.handleTimer(key, t, ctx)
      }
    ordered.foreach { e =>
      val ts = timeFn.map(f => f(e))
      ts.foreach { t => fireDue(t); wm = t }
      buf ++= op.handleElement(key, e, ts, ctx)
    }
    fireDue(Long.MaxValue)
    buf.iterator
  }
}
