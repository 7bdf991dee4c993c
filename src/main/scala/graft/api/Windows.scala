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
    * trigger; elements are presented in event-time order (ties broken by
    * the record's string form, so the sequence is deterministic under
    * shuffle reordering). Prefer [[incrementalMerged]] whenever an
    * associative form exists — holistic windows buffer O(window volume)
    * per key. */
  def appender[OUT](materializer: Seq[T] => OUT)(
      implicit outEnc: Encoder[OUT]): Stream[(K, Long, Long, OUT)] = {
    implicit val resEnc: Encoder[(K, Long, Long, OUT)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, outEnc)
    val len = assigner.lengthMs
    val tf = timeFn
    val out = assigned
      .groupByKey(r => (r._1, r._2))(Encoders.tuple(kEnc, Encoders.scalaLong))
      .mapGroups { (kw, it) =>
        val elems = it.map(_._3).toSeq.sortBy(t => (tf(t), t.toString))
        (kw._1, kw._2, kw._2 + len, materializer(elems))
      }
    new Stream(out, SourceConf())
  }

  /** W5 `ArrowWindow` analog (arcon/src/index/window/arrow.rs:17-122):
    * the reference appends the window's elements into an Arrow
    * `MutableTable` and hands `(schema, RecordBatches)` to a batch UDF at
    * trigger. Spark's rows already live in columnar/Tungsten form; the
    * semantic contract — the WHOLE windowed group delivered to one batch
    * function, unordered, streamed — is the group iterator. Unlike
    * [[appender]] nothing is buffered or sorted: the UDF consumes the
    * group as it streams out of the shuffle. */
  def arrowBatch[OUT](batchFn: Iterator[T] => OUT)(
      implicit outEnc: Encoder[OUT]): Stream[(K, Long, Long, OUT)] = {
    implicit val resEnc: Encoder[(K, Long, Long, OUT)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, outEnc)
    val len = assigner.lengthMs
    val out = assigned
      .groupByKey(r => (r._1, r._2))(Encoders.tuple(kEnc, Encoders.scalaLong))
      .mapGroups { (kw, it) =>
        (kw._1, kw._2, kw._2 + len, batchFn(it.map(_._3)))
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

  /** Incremental window with a real accumulator merge — executed as a
    * Spark typed `Aggregator`, so partial aggregation happens MAP-SIDE
    * and only (window, partial) pairs ride the shuffle; [[incremental]]
    * (the reference's merge-less contract,
    * incremental.rs:49-55 `unimplemented!`) must shuffle every raw
    * element. At 100 TB this is the difference between shuffling the
    * window volume and shuffling one row per (key, window, map task). */
  def incrementalMerged[OUT](init: T => OUT, agg: (T, OUT) => OUT,
      merge: (OUT, OUT) => OUT)(
      implicit outEnc: Encoder[OUT]): Stream[(K, Long, Long, OUT)] = {
    implicit val resEnc: Encoder[(K, Long, Long, OUT)] =
      Encoders.tuple(kEnc, Encoders.scalaLong, Encoders.scalaLong, outEnc)
    implicit val bufEnc: Encoder[(Boolean, OUT)] =
      Encoders.tuple(Encoders.scalaBoolean, outEnc)
    implicit val kwEnc: Encoder[(K, Long)] = Encoders.tuple(kEnc, Encoders.scalaLong)
    val len = assigner.lengthMs
    val (initF, aggF, mergeF) = (init, agg, merge)
    val sparkAgg = new org.apache.spark.sql.expressions.Aggregator[(K, Long, T), (Boolean, OUT), OUT] {
      def zero: (Boolean, OUT) = (false, null.asInstanceOf[OUT])
      def reduce(b: (Boolean, OUT), a: (K, Long, T)): (Boolean, OUT) =
        if (!b._1) (true, initF(a._3)) else (true, aggF(a._3, b._2))
      def merge(x: (Boolean, OUT), y: (Boolean, OUT)): (Boolean, OUT) =
        if (!x._1) y else if (!y._1) x else (true, mergeF(x._2, y._2))
      def finish(r: (Boolean, OUT)): OUT = r._2
      def bufferEncoder: Encoder[(Boolean, OUT)] = bufEnc
      def outputEncoder: Encoder[OUT] = outEnc
    }
    val out = assigned
      .groupByKey(r => (r._1, r._2))
      .agg(sparkAgg.toColumn)
      .map { case ((k, ws), res) => (k, ws, ws + len, res) }
    new Stream(out, SourceConf())
  }

  def sum(value: T => Long): Stream[(K, Long, Long, Long)] =
    incrementalMerged[Long](t => value(t), (t, acc) => acc + value(t), _ + _)(
      Encoders.scalaLong)

  def count: Stream[(K, Long, Long, Long)] =
    incrementalMerged[Long](_ => 1L, (_, acc) => acc + 1L, _ + _)(Encoders.scalaLong)
}
