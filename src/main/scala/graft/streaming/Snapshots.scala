package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Epoch-style snapshot catalog — the analog of the reference's
  * `#[table = "name"]` state tables + `SnapshotManager`
  * (`/root/reference/arcon_macros/src/state.rs:56-103`,
  * `/root/reference/arcon/src/manager/snapshot.rs:39-135`): every epoch
  * publishes the operator's state as a queryable table ("TSS" time-travel
  * snapshots, `arcon/src/lib.rs:20-21`).
  *
  * Here: each micro-batch (Spark's epoch — its commit log is the epoch
  * marker protocol) writes the batch result as parquet under
  * `dir/epoch=N/`, and a catalog of committed epochs accrues. Any epoch is
  * re-readable as a DataFrame mid-run — Spark's state is otherwise not
  * SQL-visible during execution, so the export IS the idiomatic TSS.
  *
  * Layout is partition-discovery friendly (`epoch=N`), so
  * `spark.read.parquet(dir)` reads ALL epochs with an `epoch` column —
  * time-travel across the full history with partition pruning on epoch.
  */
object Snapshots {

  /** Attach a snapshot sink to a streaming DataFrame: one parquet snapshot
    * per micro-batch under `dir/epoch=N`. */
  def snapshotWriter(df: DataFrame, dir: String): DataStreamWriter[Row] =
    df.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, epochId: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/epoch=$epochId")
        ()
    }

  def start(df: DataFrame, dir: String, checkpoint: String): StreamingQuery =
    snapshotWriter(df, dir).option("checkpointLocation", checkpoint).start()

  /** Epochs with a committed snapshot, ascending. */
  def epochs(dir: String): Seq[Long] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.startsWith("epoch="))
          .map(_.stripPrefix("epoch=").toLong)
          .toSeq.sorted
      } finally s.close()
    }
  }

  def latestEpoch(dir: String): Option[Long] = epochs(dir).lastOption

  /** Read one epoch's snapshot (the `Snapshot` handle of the reference's
    * subscriber API). */
  def read(spark: SparkSession, dir: String, epoch: Long): DataFrame =
    spark.read.parquet(s"$dir/epoch=$epoch")

  /** Read the whole history with an `epoch` column (time travel). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
