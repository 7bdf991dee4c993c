package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: write `.explain("formatted")` for
  * the named queries to `plans/<tag>/<query>_<suffix>.txt` (the
  * before/after plan receipts the optimization rounds commit). Session
  * config mirrors [[Bench]] (same master/shuffle-partitions/timezone),
  * so the captured plan is the one the bench times.
  *
  * Usage: `sbt "runMain graft.PlanDump r21 before dd2_minhash_lsh ..."`
  * — first arg the plans/ subdir, second the filename suffix, rest the
  * query names. SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query>...")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus,2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        dir.resolve(s"${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${dir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
