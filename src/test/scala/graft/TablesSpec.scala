package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Pins `Tables.load`'s timestamp normalization: the driver-generated
  * parquet has shipped TIMESTAMP(isAdjustedToUTC=false) — inferred as
  * TIMESTAMP_NTZ since Spark 3.4 — on which downstream epoch arithmetic
  * (`cast(ts as long)`, `unix_millis`) throws. `load` must hand every
  * query session-tz TimestampType with the same instant values (UTC
  * sessions make the cast value-preserving).
  */
class TablesSpec extends SparkTestBase {

  private def withTempDir[A](body: java.io.File => A): A = {
    val dir = Files.createTempDirectory("graft-tables-spec").toFile
    try body(dir)
    finally { // File.deleteOnExit does not recurse; clean up explicitly
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("load casts TIMESTAMP_NTZ columns to session-tz TimestampType, values preserved") { withTempDir { dir =>
    val micros = Seq(0L, 1700000000000000L, 1700000123456789L)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampNTZType)))
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    df.write.mode("overwrite").parquet(s"$dir/t.parquet")
    // written from an NTZ dataframe → parquet isAdjustedToUTC=false, the
    // flavor the driver's generator produces; confirm the raw read really
    // does infer NTZ (else this test pins nothing)
    assert(spark.read.parquet(s"$dir/t.parquet").schema("ts").dataType == TimestampNTZType)

    val loaded = Tables.load(spark, dir.toString, "t")
    assert(loaded.schema("ts").dataType == TimestampType)
    // epoch arithmetic is legal again and the instants are unchanged
    import org.apache.spark.sql.functions._
    val got = loaded.select(col("id"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    micros.zipWithIndex.foreach { case (us, i) =>
      assert(got(i.toLong) == us, s"row $i: expected $us got ${got(i.toLong)}")
    }
  }}

  test("NTZ normalization preserves arbitrary instants, pre-epoch included (property)") { withTempDir { dir =>
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // ±~30,000 years of microseconds — far past any data a pipeline
    // ships, incl. negative (pre-1970) values where div/mod arithmetic
    // on epoch micros is easiest to get wrong
    val genMicros = Gen.choose(-1000000000000000L, 1000000000000000L)
    val prop = Prop.forAll(Gen.listOfN(8, genMicros)) { micros =>
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("ts", TimestampNTZType)))
      val rows = micros.zipWithIndex.map { case (us, i) =>
        Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC))
      }
      val sub = s"$dir/p${math.abs(micros.hashCode)}"
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
        .write.mode("overwrite").parquet(s"$sub/t.parquet")
      import org.apache.spark.sql.functions._
      val got = Tables.load(spark, sub, "t")
        .select(col("id"), expr("unix_micros(ts)").as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      micros.zipWithIndex.forall { case (us, i) => got(i.toLong) == us }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }}

  test("load passes non-NTZ schemas through unchanged — no projection over the scan") { withTempDir { dir =>
    // a UTC-adjusted (session-tz TimestampType) parquet — the flavor that
    // needs NO normalization; load must return the bare relation, not a
    // cast projection over it
    val ts = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1700000000L))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, ts)), 1), schema)
    df.write.mode("overwrite").parquet(s"$dir/t.parquet")
    assert(spark.read.parquet(s"$dir/t.parquet").schema("ts").dataType == TimestampType)

    val loaded = Tables.load(spark, dir.toString, "t")
    assert(loaded.schema("ts").dataType == TimestampType)
    // pass-through: the analyzed plan is the bare relation — no Project
    // node that would sit between future filters and the scan
    val analyzed = loaded.queryExecution.analyzed
    assert(!analyzed.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]),
      analyzed.toString)
  }}

  test("current testdata loads with session-tz TimestampType and working epoch arithmetic") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    // whichever flavor this testdata generation shipped, the result is
    // session-tz TimestampType and epoch arithmetic works
    assert(li.schema("l_shipdate").dataType == TimestampType)
    import org.apache.spark.sql.functions._
    assert(li.select(max(col("l_shipdate").cast("long"))).collect().head.getLong(0) > 0L)
  }
}
