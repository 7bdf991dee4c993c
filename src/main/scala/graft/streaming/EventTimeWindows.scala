package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unbounded event-time windowing — the Structured Streaming face of the
  * reference's `WindowAssigner`
  * (`/root/reference/arcon/src/stream/operator/window/assigner.rs:61-229`).
  *
  * Semantics mapping (SURVEY §7.4):
  *  - arcon drops elements with `ts < watermark - late_arrival` and fires
  *    at `window_end + late_arrival`; Spark's `withWatermark(delay)` makes
  *    `delay` itself the lateness bound and emits (append mode) when the
  *    watermark passes `window_end + delay`. Setting `delay =
  *    late_arrival` gives the same drop set and the same emission
  *    condition.
  *  - The watermark is the min over input partitions, as the node
  *    watermark is the min over senders (`arcon/src/stream/node/mod.rs:350-404`).
  *
  * These return *plans* (no action); callers attach any sink. All are
  * single-shuffle grouped aggregations with partial aggregation, and
  * all THREE assigners emit the same flattened (window_start,
  * window_end) columns — switching tumbling ↔ sliding ↔ session never
  * changes the downstream schema contract.
  */
object EventTimeWindows {

  def tumbling(df: DataFrame, tsCol: String, length: String,
      lateArrival: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, lateArrival)
      .groupBy(window(col(tsCol), length) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  def sliding(df: DataFrame, tsCol: String, length: String, slide: String,
      lateArrival: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, lateArrival)
      .groupBy(window(col(tsCol), length, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session windows — absent in the reference (SURVEY §2.4 W8), a
    * superset capability. */
  def session(df: DataFrame, tsCol: String, gap: String,
      lateArrival: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, lateArrival)
      .groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("session_window.start"))
      .withColumn("window_end", col("session_window.end"))
      .drop("session_window")
}
