package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Everything keys off a content hash, not `rand()`: the assignment is a
  * pure function of the row, so it is reproducible run-to-run, stable
  * under re-partitioning, engine-neutral (DuckDB-oracle-checkable), and
  * — the property that matters at 100 TB — requires NO shuffle at all
  * for the split itself (a narrow projection) and exactly one bounded
  * shuffle for stratified sampling (on the strata key).
  */
object Splits {

  /** Train/val/test assignment by content hash: `pmod(polyHash(on), 100)`
    * lands in [0,100); < trainPct → "train", < trainPct+valPct → "val",
    * else "test". A narrow, shuffle-free projection — rows never move.
    * Duplicate contents land in the same split by construction, which is
    * exactly what leakage-safe splitting wants. */
  def assign(on: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val h = pmod(TextFunctions.polyHash(on), lit(100L))
    when(h < trainPct, lit("train"))
      .when(h < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic shard id in [0, nShards) for write-partitioning. */
  def shard(on: Column, nShards: Int): Column =
    pmod(TextFunctions.polyHash(on), lit(nShards.toLong))

  /** Stratified deterministic sample: the `perStratum` rows of each
    * stratum with the smallest (contentHash, tieBreak) — a uniform
    * pseudo-random but reproducible choice. One shuffle on the strata
    * key. Note the trade: COARSER strata mean LARGER per-stratum work —
    * each stratum is one window partition, so a handful of huge strata
    * concentrates rows on few reducers. What keeps that safe is the
    * `rank <= k` filter: Spark pushes it below the sort as a
    * WindowGroupLimit (pinned in PlanAuditSpec), so every map task keeps
    * only `perStratum` rows per stratum and the reducer merges
    * (numMapTasks × perStratum) rows instead of sorting the full
    * stratum. Truly per-user-fine strata shift the cost the other way
    * (a huge strata-key exchange); pick strata for the sampling
    * semantics, not the plan — the group limit bounds both ends. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], on: Column,
      tieBreak: Column, perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(TextFunctions.polyHash(on), tieBreak)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= perStratum)
  }
}
