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
  */
object Bench {

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
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json)
    println(json)
    spark.stop()
  }
}
