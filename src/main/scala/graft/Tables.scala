package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md). One parquet file per table.
  *
  * All loads are plain `spark.read.parquet` so Catalyst predicate pushdown,
  * column pruning and partition-size splitting apply unchanged at any scale
  * factor — at 100 TB these would be directories of many files and the same
  * code holds.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for. Read it as raw nanos (legacy long mode) and convert with
    * exact integer division to microsecond TimestampType — the same
    * truncation DuckDB applies casting TIMESTAMP_NS → TIMESTAMP, so oracle
    * comparisons agree. The data is µs-aligned anyway (TESTDATA audit).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Session-level switch (no reader-option form exists for it); set
    // only when absent so repeated loads don't churn the shared conf.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
