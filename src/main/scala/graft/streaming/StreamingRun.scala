package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Drive a windowed aggregation through the ACTUAL Structured Streaming
  * execution path — file streaming source, `StateStoreSaveExec`, memory
  * sink — and hand back the sink contents as a plain DataFrame, so the
  * driver's DuckDB oracle can check STREAMING execution, not just the
  * batch plan that shares its window assignment
  * (`/root/reference/arcon/src/stream/operator/window/assigner.rs:404-584`
  * is the behavior being operationalized: assign → state → trigger →
  * emit, here over a real parquet-file source).
  *
  * Output mode is COMPLETE, deliberately: on a BOUNDED input the
  * watermark can never pass the final window's end (watermark = max
  * event time − delay, and the max event falls inside the last window),
  * so append mode would hold the last window per key in state forever
  * and no bounded oracle could ever match it. Complete mode emits every
  * window at the final trigger and still runs the full stateful path —
  * `StateStoreSaveExec` with all-updates save, state rows per (window,
  * key). The at-scale shape is unchanged from the batch w1: ONE keyed
  * exchange into the stateful aggregation; state size is #windows ×
  * #keys (bounded by the window calendar, not the row count), which is
  * exactly the state complete mode re-emits — an unbounded production
  * deployment with a watermark would flip this to append + a durable
  * sink and nothing else in the plan changes.
  */
object StreamingRun {

  /** The `events` table through `readStream` with the SAME timestamp
    * normalization as [[graft.Tables.events]]: schema comes from a
    * batch metadata read (file streaming sources require a declared
    * schema — at 100 TB this is the catalog's job), NTZ columns cast to
    * session-tz TimestampType, the legacy TIMESTAMP(NANOS)-as-long
    * flavor converted with exact integer division. */
  def eventsStream(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = java.nio.file.Paths.get(dir, "events.parquet")
    // FileStreamSource reads DIRECTORIES of files (at 100 TB the input
    // is one); the testdata ships a single parquet file, so stage a
    // symlink directory — zero data copied, the source lists and reads
    // the real file through the link
    val path =
      if (java.nio.file.Files.isDirectory(src)) src.toString
      else {
        // ONE cached staging dir per source path, reused across every
        // bench/oracle/test invocation (a fresh createTempDirectory per
        // call would leak: deleteOnExit cannot remove a non-empty dir).
        // The dir name is deterministic in the source path; deleteOnExit
        // registers dir BEFORE link (it deletes in reverse order, so the
        // link goes first and the then-empty dir can follow)
        val abs = src.toAbsolutePath
        val tag = java.lang.Integer.toHexString(
          scala.util.hashing.MurmurHash3.stringHash(abs.toString))
        val d = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), s"graft-stream-src-$tag")
        java.nio.file.Files.createDirectories(d)
        val link = d.resolve("events.parquet")
        if (!java.nio.file.Files.exists(link,
            java.nio.file.LinkOption.NOFOLLOW_LINKS))
          scala.util.Try(java.nio.file.Files.createSymbolicLink(link, abs))
        d.toFile.deleteOnExit()
        link.toFile.deleteOnExit()
        d.toString
      }
    val raw = s.read.parquet(path).schema // metadata-only: no data scan
    val df = s.readStream.schema(raw).parquet(path)
    val ntz = raw.fields.filter(_.dataType == TimestampNTZType).map(_.name)
    val normalized =
      if (ntz.isEmpty) df
      else df.withColumns(ntz.map(n => n -> col(n).cast(TimestampType)).toMap)
    if (raw("ts").dataType == LongType)
      normalized.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else normalized
  }

  /** Run `plan` (a streaming aggregation) to completion under
    * `Trigger.AvailableNow` in complete mode into a memory sink; block
    * until drained; return the sink table. `inspect` (tests) sees the
    * live query after termination — e.g. to assert the executed plan
    * really is the stateful streaming one. */
  def drainComplete(s: SparkSession, plan: DataFrame,
      inspect: StreamingQuery => Unit = _ => ()): DataFrame = {
    val name = "graft_stream_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    val q = plan.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination()
      inspect(q)
    } finally {
      q.stop()
      // the checkpoint is single-use (unique sink name per call): remove
      // it so repeated bench/verify invocations don't accumulate temp dirs
      scala.util.Try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(ckpt).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
      ()
    }
    s.table(name)
  }

  /** w1's tumbling daily aggregation through the streaming path —
    * the driver-visible streaming-execution oracle row. Identical
    * output contract to the batch `w1_tumbling`, identical oracle. */
  def tumblingDaily(s: SparkSession, dir: String): DataFrame =
    drainComplete(s,
      eventsStream(s, dir)
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value")))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
