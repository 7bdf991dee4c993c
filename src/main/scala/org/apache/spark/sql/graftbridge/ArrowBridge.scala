package org.apache.spark.sql.graftbridge

import java.io.FileOutputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.arrow.{ArrowBatchStreamWriter, ArrowConverters}

/** Arrow IPC stream-file export/import over Spark's `private[sql]` Arrow
  * machinery — the analog of the reference's
  * `write_arrow_file`/`read_arrow_file`
  * (`/root/reference/arcon/src/table/mod.rs:295-341`, round-trip tests
  * :343-418). Spark's rows convert to Arrow record batches with the
  * same vectorized path PySpark/pandas interop uses; the file is a
  * standard Arrow IPC stream any Arrow reader can open.
  *
  * Intended for STATE-TABLE snapshots (bounded size): batches gather on
  * the driver to produce the single-file layout the reference uses. The
  * at-scale export path remains parquet (`Stream.toParquet`).
  */
object ArrowBridge {

  def writeArrowFile(df: DataFrame, path: String, timeZoneId: String = "UTC"): Unit = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val batches = classic.toArrowBatchRdd.collect()
    val out = new FileOutputStream(path)
    try {
      val writer = new ArrowBatchStreamWriter(df.schema, out, timeZoneId,
        true /* errorOnDuplicatedFieldNames */, false /* largeVarTypes */)
      writer.writeBatches(batches.iterator)
      writer.end()
    } finally out.close()
  }

  def readArrowFile(spark: SparkSession, path: String): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (rows, schema) = ArrowConverters.fromIPCStream(bytes)
    try {
      val batches = ArrowConverters.readArrowStreamFromFile(path)
      ArrowConverters.toDataFrame(batches.iterator, schema.json,
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    } finally rows.close()
  }
}
