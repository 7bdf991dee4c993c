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

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    rows.addAndGet(p.numInputRows)
    Option(p.durationMs.get("triggerExecution"))
      .foreach(ms => seconds.add(ms.toDouble / 1000.0))
  }

  def totalRows: Long = rows.get()
  def totalSeconds: Double = seconds.sum()
  def recordsPerSec: Double =
    if (totalSeconds > 0) totalRows / totalSeconds else 0.0
}

object Measure {
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
