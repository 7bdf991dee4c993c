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

  /** Plain parquet read + one normalization: any TIMESTAMP_NTZ column is
    * cast to session-tz TimestampType. The driver-generated parquet has
    * shipped both TIMESTAMP(isAdjustedToUTC=true) and
    * (isAdjustedToUTC=false) flavors across testdata generations; Spark
    * ≥3.4 infers the latter as TIMESTAMP_NTZ, on which epoch arithmetic
    * (`cast(ts as long)`, `unix_millis`) is illegal and which cannot union
    * with TimestampType columns. All graft sessions pin
    * `spark.sql.session.timeZone=UTC`, so the cast is value-preserving and
    * agrees with DuckDB reading the same naive timestamps. The cast is a
    * projection over the scan — pushdown/pruning still reach the parquet
    * reader unchanged.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    if (ntz.isEmpty) df
    else df.withColumns(ntz.map(n => n -> col(n).cast(TimestampType)).toMap)
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` additionally shipped one generation as TIMESTAMP(NANOS),
    * which Spark has no native type for: read it as raw nanos (legacy long
    * mode) and convert with exact integer division to microsecond
    * TimestampType — the same truncation DuckDB applies casting
    * TIMESTAMP_NS → TIMESTAMP, so oracle comparisons agree. The µs-flavor
    * generations (including NTZ) are handled by `load`.
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
