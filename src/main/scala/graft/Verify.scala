package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local[n,2]: allow ONE task retry — production clusters run
    // spark.task.maxFailures=4, local mode defaults to 1, and the w24
    // exactly-once row injects a task fault that MUST be retried, not
    // fail the query. Scheduling is otherwise identical; a real (non-
    // injected) failure now retries once and surfaces in the bench
    // ledger instead of killing the run.
    val spark = SparkSession.builder()
      .master(s"local[$cpus,2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The scratch drains write checkpoints without checksum sidecars
    // (StreamingRun.drainChecksum); the state-store READER then warns
    // once per state file that no sidecar exists before reading the
    // file normally — hundreds of identical benign lines per full
    // verify run. Quiet exactly that logger; real errors still print.
    scala.util.Try(
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "ChecksumCheckpointFileManager",
        org.apache.logging.log4j.Level.ERROR))
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name filter for local iteration (the
    // driver sets nothing and always dumps the full set). Loud, and
    // fail-fast on unknown names: a stale filter leaking into a
    // verification environment must not silently produce a partial,
    // clean-looking dump.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(",")}")
      val skipped = (SparkEntry.queries.keySet -- names).toSeq.sorted
      System.err.println(s"[verify] SPARK_GRAFT_ONLY active: running " +
        s"${names.toSeq.sorted.mkString(",")}; SKIPPING ${skipped.size} " +
        s"queries: ${skipped.mkString(",")}")
    }
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
