package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main — BASELINE.md §3 protocol: per query, one untimed
  * warm-up then the median of 3 warm runs. The measured action is a
  * full-column checksum (xxhash64 over every output column, summed), so
  * Catalyst cannot prune computed columns the way a bare `count()` lets
  * it. Failures are recorded loudly in an `errors` field (never as fake
  * timings). The JSON line goes to stdout AND `bench_result.json` so the
  * driver can parse it out of sbt log noise.
  *
  * Also runs the BASELINE.md §3 streaming leg: records/s through a
  * MemoryStream → watermarked windowed aggregation (the reference's
  * `examples/window.rs` shape) on the RocksDB state store, measured by
  * the [[graft.streaming.Measure]] listener (the MeasureSink analog).
  */
object Bench {

  /** One streaming-leg result: engine-time throughput plus the
    * engine-reported phase breakdown ("where does the time go"). */
  private case class StreamResult(rows: Long, sec: Double, rps: Double,
      batches: Long, wallSec: Double, breakdownMs: Map[String, Long]) {
    def json: String = {
      val bd = breakdownMs.toSeq.sortBy(-_._2).map { case (k, v) =>
        "\"" + k + "\":" + v }.mkString("{", ",", "}")
      s"""{"rows":$rows,"sec":$sec,"records_per_sec":$rps,"batches":$batches,"wall_sec":$wallSec,"breakdown_ms":$bd}"""
    }
  }

  /** Streaming throughput through a tumbling-window sum per key on the
    * RocksDB store, checkpointed to local disk — two protocols over the
    * SAME pipeline:
    *
    *  - `waves = Some(n)`: the historical feed-and-wait protocol (n
    *    synchronous `processAllAvailable` waves). Comparable with prior
    *    rounds, but it measures the harness as much as the engine: each
    *    wave pays a full drain barrier, and the driver-side `addData`
    *    materialization sits inside the measured window.
    *  - `waves = None`: ALL data is staged into the MemoryStream before
    *    the query starts, then one `Trigger.AvailableNow` run drains it.
    *    Feed cost is excluded by construction; what remains is the
    *    engine: planning, source getBatch, the windowed-agg batch run,
    *    state-store update/commit, offset-log commits — reported in
    *    `breakdown_ms` from the engine's own progress metrics.
    */
  private def streamingBench(spark: SparkSession, total: Int,
      waves: Option[Int]): StreamResult = {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, Long, Long)]
    val agg = input.toDF().toDF("ts", "key", "v")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("key"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
    val m = graft.streaming.Measure.attach(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString
    def mkData(base: Long, n: Int): Seq[(Timestamp, Long, Long)] =
      (0 until n).map { i =>
        val t = (base + i) * 10L // 10 ms apart -> ~100 windows/key/chunk
        (new Timestamp(t), (base + i) % 100L, 1L)
      }
    val wall0 = System.nanoTime()
    try {
      waves match {
        case Some(chunks) =>
          val q = agg.writeStream.outputMode("append").format("noop")
            .option("checkpointLocation", ckpt).start()
          try {
            val perChunk = total / chunks
            var c = 0
            while (c < chunks) {
              input.addData(mkData(c.toLong * (total / chunks), perChunk))
              q.processAllAvailable()
              c += 1
            }
          } finally q.stop()
        case None =>
          // stage everything first, in blocks (MemoryStream offsets are
          // per addData call), THEN start: the engine runs flat-out
          val blocks = 10
          (0 until blocks).foreach(b =>
            input.addData(mkData(b.toLong * (total / blocks), total / blocks)))
          val q = agg.writeStream.outputMode("append").format("noop")
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
      }
    } finally graft.streaming.Measure.remove(spark, m)
    val wallSec = (System.nanoTime() - wall0) / 1e9
    // listener events are posted async; give the bus a moment to drain
    val deadline = System.nanoTime() + 5000000000L
    while (m.totalRows < total && System.nanoTime() < deadline) Thread.sleep(50)
    StreamResult(m.totalRows, m.totalSeconds, m.recordsPerSec,
      m.totalBatches, wallSec, m.durationBreakdownMs)
  }

  /** Force every output column to be computed: hash each row across all
    * columns, sum the hashes. One cheap partial-agg on top of the query's
    * own plan; nothing is prunable. */
  private def checksum(df: DataFrame): Unit = {
    // double sum: immune to ANSI long-overflow on summed hashes
    df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
        .cast("double").as("h"))
      .agg(sum(col("h"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // changelog checkpointing: commit the per-batch delta, not a full
      // RocksDB snapshot per partition per batch — the production
      // setting for micro-batch cadence
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Optional comma-separated query-name filter for local iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .flatMap { case (name, fn) =>
      try {
        checksum(fn(spark, sfDir)) // warm-up: JVM/codegen/file-cache
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          checksum(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }.sorted
        Some(name -> times(1)) // median of 3 warm runs
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: $e")
          errors(name) = e.getClass.getSimpleName
          None
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val es = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val streaming =
      if (only.isEmpty)
        try {
          // leg 1: historical wave protocol (round-over-round comparable)
          val w = streamingBench(spark, total = 500000, waves = Some(5))
          // leg 2: pre-staged AvailableNow — engine-only throughput
          val a = streamingBench(spark, total = 500000, waves = None)
          s""","streaming":${w.json},"streaming_availablenow":${a.json}"""
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] streaming leg FAILED: $e")
            s""","streaming":{"error":"${e.getClass.getSimpleName}"}"""
        }
      else ""
    // standing notes the artifact should carry (cost trades + env limits)
    val notes =
      "dd3_simhash ~2x slower at sf0.1 since r4 by design: Manku banding " +
      "raised the explode factor 4->20 to widen band keys to ~2^31 " +
      "(bucket collisions ~10^7 not ~10^13 at N=10^9); the 61-bit " +
      "signature is projected ONCE and referenced by all 20 key " +
      "expressions (verified in the optimized plan - no repeated " +
      "xxhash64 subtrees). streaming leg 'streaming' keeps the " +
      "historical 5-wave feed-and-wait protocol (harness-bound: each " +
      "wave pays a full processAllAvailable drain); " +
      "'streaming_availablenow' pre-stages all rows and measures the " +
      "engine alone with per-phase breakdown_ms. state-store commit is " +
      "the dominant fixed cost per micro-batch; a provider probe showed " +
      "HDFSBacked ~15-20% faster at bench-size state and changelog " +
      "checkpointing a ~20% win for RocksDB - RocksDB+changelog stays " +
      "the configured default because 100TB keyed state exceeds heap. " +
      "kafka e2e remains " +
      "environment-limited: no spark-sql-kafka connector jar in this " +
      "container; the decode/sink projections are unit-tested broker-less."
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es$streaming,"sf":"$sfDir","notes":"$notes"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json)
    println(json)
    spark.stop()
  }
}
