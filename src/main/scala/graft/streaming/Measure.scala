package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, DoubleAdder}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** K4 `MeasureSink` analog
  * (`/root/reference/arcon/src/stream/operator/sink/measure.rs:9-96`):
  * the reference measures throughput inside a sink operator (count +
  * average records/s, Yahoo-streaming-bench style). The Spark idiom is a
  * `StreamingQueryListener` fed by the engine's own per-batch progress
  * events — no probe operator in the plan, so nothing for Catalyst to
  * prune away (the flaw of a `count()`-based measure), and it observes
  * EVERY micro-batch of every query on the session.
  */
final class Measure extends StreamingQueryListener {
  private val rows = new AtomicLong(0)
  private val seconds = new DoubleAdder
  private val batches = new AtomicLong(0)
  private val durations =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
  // per-batch triggerExecution times — the per-record end-to-end
  // latency bound under AvailableNow (a record waits at most one
  // trigger); kept raw for percentile reporting, BOUNDED to the most
  // recent maxBatchSamples: a session-lifetime listener on a
  // sub-second trigger would otherwise grow a boxed-Long queue forever
  // (a slow leak) — recent-window percentiles are what the report
  // means anyway. ConcurrentLinkedQueue.size() is O(n), so the count
  // is tracked separately.
  private val maxBatchSamples = 100000
  private val batchMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
  private val batchMsCount = new AtomicLong(0)
  private def recordBatchMs(ms: Long): Unit = {
    batchMs.add(ms)
    if (batchMsCount.incrementAndGet() > maxBatchSamples)
      if (batchMs.poll() != null) batchMsCount.decrementAndGet()
  }
  private def addMs(key: String, ms: Long): Unit =
    durations.computeIfAbsent(key, _ => new AtomicLong).addAndGet(ms)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    rows.addAndGet(p.numInputRows)
    batches.incrementAndGet()
    Option(p.durationMs.get("triggerExecution"))
      .foreach { ms => seconds.add(ms.toDouble / 1000.0); recordBatchMs(ms) }
    // engine-reported phase durations (addBatch = run the batch plan,
    // getBatch/latestOffset = source, queryPlanning, walCommit/
    // commitOffsets = offset log) — the throughput breakdown
    p.durationMs.forEach((k, v) => addMs(k, v))
    // state-store cost on top: per-operator update + commit time
    p.stateOperators.foreach { so =>
      addMs("stateAllUpdates", so.allUpdatesTimeMs)
      addMs("stateCommit", so.commitTimeMs)
    }
  }

  def totalRows: Long = rows.get()
  def totalSeconds: Double = seconds.sum()
  def totalBatches: Long = batches.get()
  def recordsPerSec: Double =
    if (totalSeconds > 0) totalRows / totalSeconds else 0.0
  /** Accumulated per-phase milliseconds across all observed batches. */
  def durationBreakdownMs: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    durations.asScala.map { case (k, v) => k -> v.get() }.toMap
  }
  /** Per-batch triggerExecution percentiles (p50/p95/max ms) — the
    * BASELINE §3 "end-to-end latency from StreamingQueryProgress"
    * analog of the reference MeasureSink's periodic latency logging:
    * under micro-batching a record's end-to-end latency is bounded by
    * its batch's trigger duration (plus enqueue wait). */
  def batchLatencyMs: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val xs = batchMs.iterator().asScala.toArray.sorted
    if (xs.isEmpty) Map.empty
    else Map(
      "p50" -> Measure.nearestRank(xs, 0.50),
      "p95" -> Measure.nearestRank(xs, 0.95),
      "max" -> xs.last)
  }
}

object Measure {
  /** Nearest-rank percentile over a SORTED sample: the ceil(p·N)-th
    * order statistic. The previous floor form (`xs(N·95/100)`) over-shot
    * for small N — any leg under 21 batches reported its max as p95
    * (ADVICE r10); nearest-rank returns the max only when p·N lands in
    * the top sample, the textbook definition. */
  private[streaming] def nearestRank(xs: Array[Long], p: Double): Long =
    xs(math.max(0, math.ceil(xs.length * p).toInt - 1))

  /** Attach a fresh measure listener to the session's stream manager;
    * detach with [[remove]]. */
  def attach(spark: SparkSession): Measure = {
    val m = new Measure
    spark.streams.addListener(m)
    m
  }

  def remove(spark: SparkSession, m: Measure): Unit =
    spark.streams.removeListener(m)
}
