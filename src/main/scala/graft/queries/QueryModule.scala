package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries: each entry in `defs` is a
  * Spark implementation of one operator from SURVEY.md §2 (or a
  * training-data-pipeline operator), and `oracles` carries the equivalent
  * ANSI SQL the driver runs in DuckDB over the same parquet tables.
  *
  * Column-name contract: every computed column is aliased identically in
  * both the Spark plan and the oracle SQL (the driver sorts columns by name
  * before hashing values).
  */
trait QueryModule {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
