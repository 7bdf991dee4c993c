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

  test("load casts TIMESTAMP_NTZ columns to session-tz TimestampType, values preserved") {
    val dir = Files.createTempDirectory("graft-tables-ntz").toFile
    dir.deleteOnExit()
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
  }

  test("load leaves non-NTZ schemas untouched (no projection inserted over the scan)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    // whichever flavor this testdata generation shipped, the result is
    // session-tz TimestampType and epoch arithmetic works
    assert(li.schema("l_shipdate").dataType == TimestampType)
    import org.apache.spark.sql.functions._
    assert(li.select(max(col("l_shipdate").cast("long"))).collect().head.getLong(0) > 0L)
  }
}
