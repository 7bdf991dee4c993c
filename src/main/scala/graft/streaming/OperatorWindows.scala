package graft.streaming

import graft.operators.{OperatorContext, StatefulOperator}

/** The reference's `WindowAssigner` is itself just an `Operator` over
  * keyed state + event-time timers
  * (`/root/reference/arcon/src/stream/operator/window/assigner.rs:61-229`:
  * insert into per-window state on element, register a trigger timer at
  * the window end, emit + clear on timeout). This module expresses the
  * same construction on graft's [[StatefulOperator]] path — proving the
  * operator framework is complete enough to build the windowing layer,
  * exactly as in the reference. The production windowing path remains
  * the built-in `window()` aggregation ([[EventTimeWindows]]): Catalyst
  * plans it with map-side partial aggregation, which a per-key operator
  * cannot get; the equivalence of the two is pinned by
  * `StreamingSemanticsSpec`.
  *
  * Per-window partial sums ride the group state as packed
  * (windowStart, sum) longs, the timer wheel holds one trigger per open
  * window (multi-timer support), and `handleTimeout` emits and evicts
  * every window whose end has passed the fired time.
  */
object OperatorWindows {

  /** Tumbling event-time sum built on the custom-operator contract.
    * Emits (key, windowStart, sum) when the watermark passes the window
    * end — the same rows append-mode `window()` aggregation emits. */
  final class TumblingSumOp[K, T](lengthMs: Long, value: T => Long)
      extends StatefulOperator[K, T, Array[Byte], (K, Long, Long)] {

    private def decode(b: Array[Byte]): collection.mutable.LinkedHashMap[Long, Long] = {
      val m = collection.mutable.LinkedHashMap.empty[Long, Long]
      if (b != null && b.nonEmpty) {
        val bb = java.nio.ByteBuffer.wrap(b)
        while (bb.hasRemaining) m(bb.getLong) = bb.getLong
      }
      m
    }

    private def encode(m: collection.mutable.LinkedHashMap[Long, Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(m.size * 16)
      m.foreach { case (k, v) => bb.putLong(k); bb.putLong(v) }
      bb.array()
    }

    def initialState: Array[Byte] = Array.emptyByteArray

    def handleElement(key: K, e: T, ts: Option[Long], state: Array[Byte],
        ctx: OperatorContext): (Array[Byte], Iterator[(K, Long, Long)]) = {
      val t = ts.get
      val ws = t - java.lang.Math.floorMod(t, lengthMs)
      val m = decode(state)
      val fresh = !m.contains(ws)
      m(ws) = m.getOrElse(ws, 0L) + value(e)
      // one trigger per open window, armed when the window opens
      if (fresh) ctx.scheduleAt(ws + lengthMs)
      (encode(m), Iterator.empty)
    }

    override def handleTimeout(key: K, state: Array[Byte],
        ctx: OperatorContext): (Array[Byte], Iterator[(K, Long, Long)]) = {
      val firedAt = ctx.currentTime.get
      val m = decode(state)
      val (due, open) = m.partition { case (ws, _) => ws + lengthMs <= firedAt }
      (encode(open), due.iterator.map { case (ws, sum) => (key, ws, sum) })
    }
  }
}
