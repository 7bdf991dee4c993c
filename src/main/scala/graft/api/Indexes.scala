package graft.api

import scala.collection.mutable
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{ListState, MapState, StatefulProcessorHandle, TTLConfig, ValueState}

/** The reference's user-facing state-index layer re-expressed for Spark
  * (`/root/reference/arcon/src/index/mod.rs:33-198`): `ValueIndex`
  * (put/get/take/clear/rmw), `AppenderIndex` (append/consume/len) and
  * `MapIndex`, declared by name against a backing store. Two backends,
  * mirroring the reference's Eager (state-backend-backed) and Local
  * (in-memory) variants (`arcon/src/index/value/{eager,local}.rs`):
  *
  *  - [[TwsIndexState]]: backed by `transformWithState` state handles —
  *    keyed RocksDB/HDFS state-store variables, checkpointed by the
  *    engine, scoped to the current grouping key automatically;
  *  - [[LocalIndexState]]: plain in-memory maps for bounded per-key
  *    replay (and unit tests).
  */
trait ValueIndex[T] {
  def get: Option[T]
  def put(v: T): Unit
  def clear(): Unit
  /** take() = get + clear — the reference's `take` contract. */
  def take(): Option[T] = { val v = get; clear(); v }
  /** Read-modify-write with a default for the empty case (`rmw`). */
  def rmw(default: => T)(f: T => T): T = {
    val next = f(get.getOrElse(default))
    put(next)
    next
  }
}

trait AppenderIndex[T] {
  def append(v: T): Unit
  def get: Seq[T]
  def length: Int = get.length
  /** consume() = drain: return the buffer and clear it. */
  def consume(): Seq[T] = { val v = get; clear(); v }
  def clear(): Unit
}

trait MapIndex[A, B] {
  def get(k: A): Option[B]
  def put(k: A, v: B): Unit
  def remove(k: A): Unit
  def contains(k: A): Boolean = get(k).isDefined
  def entries: Iterator[(A, B)]
  def clear(): Unit
}

/** Factory for named indexes — `#[derive(ArconState)]`'s field
  * declarations (`arcon_macros/src/state.rs:56-103`) become `open()`
  * calls against this. */
trait IndexState {
  def value[T](name: String)(implicit enc: Encoder[T]): ValueIndex[T]
  def appender[T](name: String)(implicit enc: Encoder[T]): AppenderIndex[T]
  def map[A, B](name: String)(implicit kEnc: Encoder[A], vEnc: Encoder[B]): MapIndex[A, B]
}

// ---------------------------------------------------------------------
// transformWithState backend (streaming): state variables are
// key-scoped by the engine; one handle-derived state object serves
// every key of the partition.
// ---------------------------------------------------------------------

final class TwsIndexState(handle: StatefulProcessorHandle) extends IndexState {
  def value[T](name: String)(implicit enc: Encoder[T]): ValueIndex[T] =
    new TwsValueIndex(handle.getValueState[T](name, enc, TTLConfig.NONE))
  def appender[T](name: String)(implicit enc: Encoder[T]): AppenderIndex[T] =
    new TwsAppenderIndex(handle.getListState[T](name, enc, TTLConfig.NONE))
  def map[A, B](name: String)(implicit kEnc: Encoder[A], vEnc: Encoder[B]): MapIndex[A, B] =
    new TwsMapIndex(handle.getMapState[A, B](name, kEnc, vEnc, TTLConfig.NONE))
}

private final class TwsValueIndex[T](s: ValueState[T]) extends ValueIndex[T] {
  def get: Option[T] = if (s.exists()) Some(s.get()) else None
  def put(v: T): Unit = s.update(v)
  def clear(): Unit = s.clear()
}

private final class TwsAppenderIndex[T](s: ListState[T]) extends AppenderIndex[T] {
  def append(v: T): Unit = s.appendValue(v)
  def get: Seq[T] = s.get().toSeq
  def clear(): Unit = s.clear()
}

private final class TwsMapIndex[A, B](s: MapState[A, B]) extends MapIndex[A, B] {
  def get(k: A): Option[B] = if (s.containsKey(k)) Some(s.getValue(k)) else None
  def put(k: A, v: B): Unit = s.updateValue(k, v)
  def remove(k: A): Unit = s.removeKey(k)
  def entries: Iterator[(A, B)] = s.iterator()
  def clear(): Unit = s.clear()
}

// ---------------------------------------------------------------------
// Local backend (bounded replay / tests) — arcon's Local* variants.
// ---------------------------------------------------------------------

final class LocalIndexState extends IndexState {
  def value[T](name: String)(implicit enc: Encoder[T]): ValueIndex[T] =
    new LocalValueIndex[T]
  def appender[T](name: String)(implicit enc: Encoder[T]): AppenderIndex[T] =
    new LocalAppenderIndex[T]
  def map[A, B](name: String)(implicit kEnc: Encoder[A], vEnc: Encoder[B]): MapIndex[A, B] =
    new LocalMapIndex[A, B]
}

private final class LocalValueIndex[T] extends ValueIndex[T] {
  private var v: Option[T] = None
  def get: Option[T] = v
  def put(x: T): Unit = v = Some(x)
  def clear(): Unit = v = None
}

private final class LocalAppenderIndex[T] extends AppenderIndex[T] {
  private val buf = mutable.ArrayBuffer.empty[T]
  def append(x: T): Unit = buf += x
  def get: Seq[T] = buf.toSeq
  def clear(): Unit = buf.clear()
}

private final class LocalMapIndex[A, B] extends MapIndex[A, B] {
  private val m = mutable.LinkedHashMap.empty[A, B]
  def get(k: A): Option[B] = m.get(k)
  def put(k: A, v: B): Unit = m(k) = v
  def remove(k: A): Unit = m.remove(k)
  def entries: Iterator[(A, B)] = m.iterator
  def clear(): Unit = m.clear()
}
