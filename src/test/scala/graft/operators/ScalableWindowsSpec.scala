package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-phase (bucketed) running sum must equal the single-partition
  * window formulation row for row — on real data (events, sf0.001) with
  * day buckets, exact integer values. */
class ScalableWindowsSpec extends SparkTestBase {

  test("two-phase running sum ≡ Window.partitionBy(key) running sum") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("v", col("event_id") % 97) // exact longs
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = events.select(col("event_id"),
      sum(col("v")).over(w).as("expected"))
    val bucketed = ScalableWindows.runningSum(
      events,
      key = col("user_id"),
      bucket = floor(col("ts").cast("long") / 86400), // day buckets, monotone in ts
      time = col("ts"), tieBreak = col("event_id"), value = col("v"))
      .select(col("event_id"), col("__running"))
    val joined = single.join(bucketed, "event_id")
    assert(joined.filter(col("expected") =!= col("__running")).count() == 0)
    assert(joined.count() == events.count())
  }

  test("two-phase sessionize ≡ single-partition lag+running-sum sessionize") {
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    // single-partition formulation (the w3_sessionize shape)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val isNew = when(col("ts").cast("long") -
        lag(col("ts").cast("long"), 1).over(byUser) > 1800, 1L).otherwise(lit(0L))
    val single = events
      .withColumn("f",
        when(lag(col("ts"), 1).over(byUser).isNull, lit(1L)).otherwise(isNew))
      .withColumn("expected", sum(col("f")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("expected"))
    val bucketed = ScalableWindows.sessionize(
      events,
      key = col("user_id"),
      bucket = floor(col("ts").cast("long") / 86400),
      time = col("ts"), tieBreak = col("event_id"), gapSeconds = 1800)
      .select(col("event_id"), col("session_no"))
    val joined = single.join(bucketed, "event_id")
    assert(joined.filter(col("expected") =!= col("session_no")).count() == 0)
    assert(joined.count() == events.count())
  }

  test("null keys and null buckets survive the two-phase rewrite and match the single-partition window") {
    import spark.implicits._
    // null user (unauthenticated events) and null ts (bucket null)
    val rows = Seq(
      (1L, Option(10L), Option(100L), 5L),
      (2L, Option(10L), Option(200L), 7L),
      (3L, Option.empty[Long], Option(150L), 11L), // null key
      (4L, Option.empty[Long], Option(250L), 13L), // null key, later
      (5L, Option(20L), Option.empty[Long], 17L))  // null time -> null bucket
      .toDF("event_id", "user_id", "ts", "v")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val single = rows.select(col("event_id"), sum(col("v")).over(w).as("expected"))
    val bucketed = ScalableWindows.runningSum(rows,
        key = col("user_id"), bucket = floor(col("ts") / 100),
        time = col("ts"), tieBreak = col("event_id"), value = col("v"))
      .select(col("event_id"), col("__running"))
    val joined = single.join(bucketed, "event_id")
    assert(joined.count() == 5, "null-key/bucket rows must not be dropped")
    assert(joined.filter(col("expected") =!= col("__running")).count() == 0)
  }
}
