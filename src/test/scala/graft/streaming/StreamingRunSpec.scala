package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The driver-visible streaming oracle row (w1_streaming) must actually
  * execute the STATEFUL streaming path — not silently fall back to a
  * batch aggregate — and must agree with the batch w1 plan row-for-row. */
class StreamingRunSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("w1_streaming executes StateStoreSaveExec over a file streaming source") {
    var plan = ""
    val out = StreamingRun.drainComplete(spark,
      StreamingRun.eventsStream(spark, sfDir)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value")),
      inspect = q => plan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString)
    assert(plan.contains("StateStoreSave"), plan)
    assert(plan.contains("FileScan parquet"), plan)
    assert(out.count() > 0)
  }

  test("w9_streaming_sessions executes the session-window state path") {
    var plan = ""
    val out = StreamingRun.drainComplete(spark,
      StreamingRun.eventsStream(spark, sfDir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value")),
      inspect = q => plan = q
        .asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString)
    assert(plan.contains("SessionWindowStateStoreSave"), plan)
    assert(plan.contains("MergingSessions"), plan)
    assert(out.count() > 0)
  }

  test("w9_streaming_sessions equals the batch session_window aggregation exactly") {
    val streaming = graft.queries.EventTimeQueries
      .defs("w9_streaming_sessions")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }

  test("w1_streaming result equals the batch w1_tumbling plan exactly") {
    val streaming = graft.queries.EventTimeQueries
      .defs("w1_streaming")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.EventTimeQueries
      .defs("w1_tumbling")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }
}
