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

  /** Streaming throughput: feed `total` events in `chunks` micro-batch
    * waves through a tumbling-window sum per key, checkpointed to local
    * disk; returns (rows, seconds, records/s) from query progress. */
  private def streamingBench(spark: SparkSession, total: Int, chunks: Int): (Long, Double, Double) = {
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
    val q = agg.writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt).start()
    try {
      val perChunk = total / chunks
      var c = 0
      while (c < chunks) {
        val base = c.toLong * perChunk
        input.addData((0 until perChunk).map { i =>
          val t = (base + i) * 10L // 10 ms apart -> ~100 windows/key/chunk
          (new Timestamp(t), (base + i) % 100L, 1L)
        })
        q.processAllAvailable()
        c += 1
      }
    } finally {
      q.stop()
      graft.streaming.Measure.remove(spark, m)
    }
    (m.totalRows, m.totalSeconds, m.recordsPerSec)
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
          val (rows, sec, rps) = streamingBench(spark, total = 500000, chunks = 5)
          s""","streaming":{"rows":$rows,"sec":$sec,"records_per_sec":$rps}"""
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] streaming leg FAILED: $e")
            s""","streaming":{"error":"${e.getClass.getSimpleName}"}"""
        }
      else ""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es$streaming,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json)
    println(json)
    spark.stop()
  }
}
