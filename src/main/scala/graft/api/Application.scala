package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's `ApplicationConf`
  * (`/root/reference/arcon/src/application/conf/mod.rs:270-311`) mapped
  * onto Spark session configuration:
  *
  * | arcon knob | default | Spark mapping |
  * |---|---|---|
  * | `epoch_interval` 25 000 ms | epoch ≙ micro-batch commit | trigger interval |
  * | `watermark_interval` 250 ms | watermark advances per batch | (no knob; sub-batch cadence has no analog) |
  * | `max_key` / parallelism | key-range shards | `spark.sql.shuffle.partitions` |
  * | backend Sled / Rocks | state backend | HDFS-backed / RocksDB state store provider |
  * | allocator / buffer pool | memory caps | Spark unified memory (free) |
  *
  * [[Application.session]] builds the configured session;
  * [[Application.run]] is the `#[arcon::app]` terminal — attach the
  * default sink and block-ready query handle
  * (`arcon_macros/src/lib.rs:39-78` appends
  * `.builder().build().run_and_block()`).
  */
case class AppConf(
    appName: String = "graft",
    master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
    /** Shuffle/state parallelism — the `max_key` shard-count analog. */
    parallelism: Int = Runtime.getRuntime.availableProcessors(),
    /** "rocksdb" (≙ arcon Rocks backend) or "hdfs" (≙ Sled: the simple
      * default store). */
    stateBackend: String = "rocksdb",
    /** Micro-batch cadence — the epoch interval (reference default 25 s). */
    epochInterval: String = "25 seconds",
    checkpointDir: Option[String] = None)

object Application {

  def session(conf: AppConf): SparkSession = {
    val b = SparkSession.builder()
      .master(conf.master)
      .appName(conf.appName)
      .config("spark.sql.shuffle.partitions", conf.parallelism)
      .config("spark.sql.session.timeZone", "UTC")
    val withBackend = conf.stateBackend match {
      case "rocksdb" => b
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      case _ => b // HDFS-backed default provider
    }
    withBackend.getOrCreate()
  }

  /** Terminal for a streaming pipeline: start it on the epoch-interval
    * trigger with a discarding sink (the `ignore()` default) unless the
    * stream is bounded, in which case it just executes. Returns the
    * query handle for `run_and_block`-style awaiting. */
  def run[T](stream: Stream[T], conf: AppConf = AppConf()): Option[StreamingQuery] =
    if (stream.ds.isStreaming) {
      val w = stream.ds.writeStream
        .format("noop")
        .trigger(Trigger.ProcessingTime(conf.epochInterval))
      Some(conf.checkpointDir.fold(w)(d => w.option("checkpointLocation", d)).start())
    } else {
      stream.ignore()
      None
    }
}
