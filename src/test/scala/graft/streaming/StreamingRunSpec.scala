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
