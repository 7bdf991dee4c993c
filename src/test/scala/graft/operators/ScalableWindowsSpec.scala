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
}
