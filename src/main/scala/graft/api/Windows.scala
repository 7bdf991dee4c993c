package graft.api

import org.apache.spark.sql.{Encoder, Encoders}

/** Window assigners — the analog of `Assigner::{Tumbling, Sliding}` with
  * allowed lateness (`/root/reference/arcon/src/dataflow/builder.rs:122-133`).
  * Validation mirrors the reference (length ≥ slide, length % slide == 0,
  * `arcon/src/dataflow/builder.rs:93-108`). All times are epoch millis, as
  * in the reference's bare-u64 time model.
  */
sealed trait WindowAssigner {
  def lengthMs: Long
  def slideMs: Long
  def lateArrivalMs: Long

  /** Window start timestamps containing `ts` — the assigner index math of
    * `assigner.rs:151-207` (floor..ceil over (ts - start) / slide). */
  def windowsFor(ts: Long): Seq[Long] = {
    val lastStart = ts - (ts % slideMs)
    val n = ((lengthMs + slideMs - 1) / slideMs).toInt
    (0 until n).map(i => lastStart - i.toLong * slideMs)
      .filter(s => s + lengthMs > ts && s >= 0)
  }
}

object WindowAssigner {
  case class Tumbling(lengthMs: Long, lateArrivalMs: Long = 0) extends WindowAssigner {
    require(lengthMs > 0, "window length must be positive")
    def slideMs: Long = lengthMs
  }
  case class Sliding(lengthMs: Long, slideMs: Long, lateArrivalMs: Long = 0)
      extends WindowAssigner {
    require(lengthMs >= slideMs, "length must be >= slide")
    require(lengthMs % slideMs == 0, "length must be a multiple of slide")
  }
}

/** A keyed stream with a window assigner attached; terminal combinators
  * choose the window *index* (SURVEY §2.4):
  *  - [[appender]]  ≙ `AppenderWindow` (holistic: materializer over all
  *    buffered elements, arcon/src/index/window/appender.rs:10-91)
  *  - [[incremental]] ≙ `IncrementalWindow` (per-element fold,
  *    arcon/src/index/window/incremental.rs:12-160)
  *  - [[sum]]/[[count]] convenience folds.
  *
  * Results are `(key, windowStart, windowEnd, result)` tuples — the
  * reference emits the result stamped with the window end
  * (assigner.rs:209-228); here the bounds are explicit columns.
  *
  * Bounded execution: elements flat-map to their (possibly several)
  * windows, then group by (key, windowStart) — one shuffle; for the
  * incremental path the fold is exactly the reference's documented
  * "associative & commutative" contract. Late elements older than
  * `watermark - late_arrival` are dropped by the streaming engine
  * (see graft.streaming for the unbounded plans); in bounded replay
  * nothing is late.
  */
class WindowedStream[K, T](keyed: KeyedStream[K, T], assigner: WindowAssigner)(
    implicit kEnc: Encoder[K]) extends Serializable {

  private val timeFn: T => Long = keyed.stream.conf.timeExtractor.get
  private implicit def tEnc: Encoder[T] = keyed.stream.ds.encoder

  /** (key, windowStart, element) rows — the assigner step (narrow: a
    * flatMap with ≤ length/slide outputs per element, no shuffle). */
  private def assigned: org.apache.spark.sql.Dataset[(K, Long, T)] = {
    implicit val rowEnc: Encoder[(K, Long, T)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, tEnc)
    val kf = keyed.keyFn
    val asg = assigner
    val tf = timeFn
    keyed.stream.ds.flatMap { t =>
      val ts = tf(t)
      asg.windowsFor(ts).map(ws => (kf(t), ws, t))
    }
  }

  /** Holistic window: buffer all elements, apply `materializer` at
    * trigger; elements are presented in event-time order. Prefer
    * [[incremental]] whenever an associative form exists — holistic
    * windows buffer O(window volume) per key. */
  def appender[OUT](materializer: Seq[T] => OUT)(
      implicit outEnc: Encoder[OUT]): Stream[(K, Long, Long, OUT)] = {
    implicit val resEnc: Encoder[(K, Long, Long, OUT)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, outEnc)
    val len = assigner.lengthMs
    val tf = timeFn
    val out = assigned
      .groupByKey(r => (r._1, r._2))(Encoders.tuple(kEnc, Encoders.scalaLong))
      .mapGroups { (kw, it) =>
        val elems = it.map(_._3).toSeq.sortBy(tf)
        (kw._1, kw._2, kw._2 + len, materializer(elems))
      }
    new Stream(out, SourceConf())
  }

  /** Incremental window: `init: IN => OUT`, `agg: (IN, OUT) => OUT` — the
    * reference contract for associative & commutative folds
    * (incremental.rs:25-61). */
  def incremental[OUT](init: T => OUT, agg: (T, OUT) => OUT)(
      implicit outEnc: Encoder[OUT]): Stream[(K, Long, Long, OUT)] = {
    implicit val resEnc: Encoder[(K, Long, Long, OUT)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, outEnc)
    val len = assigner.lengthMs
    val out = assigned
      .groupByKey(r => (r._1, r._2))(Encoders.tuple(kEnc, Encoders.scalaLong))
      .mapGroups { (kw, it) =>
        val elems = it.map(_._3)
        val first = elems.next()
        val res = elems.foldLeft(init(first))((acc, t) => agg(t, acc))
        (kw._1, kw._2, kw._2 + len, res)
      }
    new Stream(out, SourceConf())
  }

  def sum(value: T => Long): Stream[(K, Long, Long, Long)] =
    incremental[Long](t => value(t), (t, acc) => acc + value(t))(Encoders.scalaLong)

  def count: Stream[(K, Long, Long, Long)] =
    incremental[Long](_ => 1L, (_, acc) => acc + 1L)(Encoders.scalaLong)
}
