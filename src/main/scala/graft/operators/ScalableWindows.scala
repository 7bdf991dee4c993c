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
    // exactly one new column, __running. The stitch join is NULL-SAFE:
    // Window.partitionBy groups null keys/buckets into one partition
    // and emits them, so the two-phase rewrite must match them too — a
    // plain equi-join would silently drop every null-key row and break
    // the documented bit-equivalence with the single-partition window.
    withinRunning.as("__l").join(offsets.as("__r"),
        col("__l.__k") <=> col("__r.__k") && col("__l.__b") <=> col("__r.__b"))
      .select(col("__l.*"), col("__r.__off"))
      .withColumn("__running", col("__run_in") + col("__off"))
      .drop("__run_in", "__k", "__b", "__off")
  }

  /** Skew-safe gap sessionization: per `key` in `(time, tieBreak)` order,
    * a row starts a new session when it is the key's first event or its
    * gap to the previous event exceeds `gapSeconds`. Emits the input
    * plus `session_no` (1-based running session index per key) —
    * identical to the single-partition
    * `lag` + `sum(is_new) over (partition by key)` formulation
    * (w3_sessionize), but a hot key runs as many tasks as buckets it
    * spans instead of one:
    *
    *  - the gap flag needs only the PREVIOUS event's time: within a
    *    bucket that is `lag` over (key, bucket); across the boundary it
    *    is the previous non-empty bucket's max(time), a one-row-per-
    *    bucket join — never a whole-key sort;
    *  - the running session index is [[runningSum]] of the flag, the
    *    two-phase prefix.
    *
    * `bucket` must be monotone in the per-key ordering (e.g.
    * `floor(epoch(ts)/86400)`). Integer flags ⇒ bit-exact equivalence.
    */
  def sessionize(df: DataFrame, key: Column, bucket: Column, time: Column,
      tieBreak: Column, gapSeconds: Long): DataFrame = {
    val t = time.cast("long")
    val base = df.withColumn("__k", key).withColumn("__b", bucket)
    val inB = Window.partitionBy(col("__k"), col("__b")).orderBy(time, tieBreak)
    val flagged0 = base.withColumn("__prev_in", lag(t, 1).over(inB))
    // previous non-empty bucket's last event time: one row per
    // (key, bucket) — the tiny table, never the events
    val byB = Window.partitionBy(col("__k")).orderBy(col("__b"))
    val prevB = base.groupBy(col("__k"), col("__b")).agg(max(t).as("__last"))
      .withColumn("__prev_last", lag(col("__last"), 1).over(byB))
      .select(col("__k"), col("__b"), col("__prev_last"))
    // null-safe for the same reason as runningSum's stitch join
    val flagged = flagged0.as("__l").join(prevB.as("__r"),
        col("__l.__k") <=> col("__r.__k") && col("__l.__b") <=> col("__r.__b"))
      .select(col("__l.*"), col("__r.__prev_last"))
      .withColumn("__prev", coalesce(col("__prev_in"), col("__prev_last")))
      .withColumn("__is_new",
        when(col("__prev").isNull || (t - col("__prev") > gapSeconds), lit(1L))
          .otherwise(lit(0L)))
    runningSum(flagged, col("__k"), col("__b"), time, tieBreak, col("__is_new"))
      .withColumn("session_no", col("__running"))
      .drop("__running", "__prev_in", "__prev_last", "__prev", "__is_new")
  }
}
