package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
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
  *
  * Each `epoch=N` directory is that micro-batch's DELTA — the keys the
  * batch updated (update output mode; complete mode would rewrite ALL
  * state every epoch, which cannot scale past toy state sizes). The
  * state AS OF an epoch is the last-wins fold of every delta up to it:
  * [[readStateAt]]. [[read]] returns one raw delta.
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

  /** Read one epoch's DELTA: the keys updated in that micro-batch
    * (NOT the full state — quiescent keys are absent; see
    * [[readStateAt]] for the state view). */
  def read(spark: SparkSession, dir: String, epoch: Long): DataFrame =
    spark.read.parquet(s"$dir/epoch=$epoch")

  /** Read the whole history with an `epoch` column (time travel). */
  def readAll(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** The state table AS OF `epoch` (the reference's `Snapshot` handle /
    * TSS time-travel read): fold every committed delta ≤ epoch,
    * last-wins per key — a key updated only in epoch 3 still appears in
    * the epoch-50 state view. Partition pruning keeps the scan to the
    * requested prefix; the per-key window shuffles one row per
    * (key, touching epoch), not per event. The emitted `epoch` column
    * is each key's LAST update ≤ the requested epoch (provenance). */
  def readStateAt(spark: SparkSession, dir: String, keyCols: Seq[String],
      epoch: Long): DataFrame = {
    require(keyCols.nonEmpty, "state keys required for the last-wins fold")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("epoch").desc)
    readAll(spark, dir)
      .filter(col("epoch") <= epoch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  // ---- the checkpoint-direct half of the TSS contract ----------------
  // The export path above copies state OUT through foreachBatch; the
  // three readers below query a stateful operator's CHECKPOINT ITSELF
  // through Spark's statestore data source (SPARK-45511) — no export
  // job attached to the query, any committed version readable after the
  // fact. These are the library surface behind the driver rows
  // k9/k10/k11 (stateAt), k12 (catalog) and k13 (changeFeed).

  /** The raw state rows of `checkpoint` at a committed `batchId`
    * (None = last committed) — the reference's `Snapshot` handle over an
    * epoch (`arcon/src/manager/snapshot.rs:39-135`), served from the
    * checkpoint's own state files. Columns: `key`/`value` structs as
    * laid out by the stateful operator (`operatorId`/`storeName`
    * select among multiple stateful operators in one query). */
  def stateAt(spark: SparkSession, checkpoint: String,
      batchId: Option[Long] = None, operatorId: Int = 0,
      storeName: String = "default"): DataFrame = {
    val r = spark.read.format("statestore").option("path", checkpoint)
      .option("operatorId", operatorId.toString)
      .option("storeName", storeName)
    batchId.fold(r)(b => r.option("batchId", b.toString)).load()
  }

  /** Committed state versions of `checkpoint`, ascending — the
    * SnapshotManager's epoch registry read from the commit log. Listed
    * through Hadoop's FileSystem (resolved from the checkpoint URI +
    * the session's Hadoop conf), not java.nio — a checkpoint on
    * `hdfs://`/`s3a://` lists the same way a local one does, matching
    * the "any checkpoint" contract of [[stateAt]]/[[changeFeed]]
    * (which already go through Spark's statestore source). */
  def committedBatches(spark: SparkSession, checkpoint: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "commits")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).sorted
  }

  /** The per-epoch state CHANGELOG of `checkpoint` from `fromBatchId`
    * on: one row per change with `batch_id` and `change_type`
    * (update/delete, deletes carrying null values) — the delta stream
    * between [[stateAt]] snapshots; folding it (updates overwrite,
    * deletes remove, updates-before-deletes within a batch)
    * reconstructs any snapshot. */
  def changeFeed(spark: SparkSession, checkpoint: String,
      fromBatchId: Long = 0L, operatorId: Int = 0,
      storeName: String = "default"): DataFrame =
    spark.read.format("statestore").option("path", checkpoint)
      .option("operatorId", operatorId.toString)
      .option("storeName", storeName)
      .option("readChangeFeed", "true")
      .option("changeStartBatchId", fromBatchId.toString)
      .load()
}
