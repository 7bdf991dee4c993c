package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe analytic windows.
  *
  * `Window.partitionBy(key)` runs ONE task per key — correct, and the
  * formulation the standard queries use, but a hot key serializes at
  * scale. This is the escape hatch: split each key's timeline into
  * ordered buckets, do the heavy running work per (key, bucket) — many
  * tasks per key — then stitch buckets with a prefix over the tiny
  * per-bucket totals. Results are identical to the single-partition
  * window (integer/exact types; float addition order differs between
  * the two formulations, so use exact types for bit-equality).
  */
object ScalableWindows {

  /** Two-phase running sum of `value` per `key` in `(time, tieBreak)`
    * order. `bucket` must be a monotone function of the ordering within
    * each key (e.g. `floor(epoch(ts) / width)`): all rows of bucket b
    * sort before all rows of bucket b+1.
    *
    *  - phase 1 (parallel in buckets): running sum within
    *    (key, bucket) — tasks per key = number of buckets touched;
    *  - phase 2 (tiny): per-bucket totals, prefix-summed per key —
    *    one row per (key, bucket), not per event;
    *  - stitch: in-bucket running + preceding-buckets offset.
    */
  def runningSum(df: DataFrame, key: Column, bucket: Column,
      time: Column, tieBreak: Column, value: Column): DataFrame = {
    val base = df.withColumn("__k", key).withColumn("__b", bucket)
    val inBucket = Window.partitionBy(col("__k"), col("__b"))
      .orderBy(time, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinRunning = base.withColumn("__run_in", sum(value).over(inBucket))

    val totals = base.groupBy(col("__k"), col("__b"))
      .agg(sum(value).as("__tot"))
    val byKey = Window.partitionBy(col("__k")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.withColumn("__off",
      coalesce(sum(col("__tot")).over(byKey), lit(0)))
      .select(col("__k"), col("__b"), col("__off"))

    // drop every internal helper: callers get the input columns plus
    // exactly one new column, __running
    withinRunning.join(offsets, Seq("__k", "__b"))
      .withColumn("__running", col("__run_in") + col("__off"))
      .drop("__run_in", "__k", "__b", "__off")
  }
}
