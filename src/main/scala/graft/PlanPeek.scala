package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan for each query named on
  * the command line (`sbt "runMain graft.PlanPeek dd2_minhash_lsh"`).
  * Pass `--static` to plan under the 100 TB planner regime PlanAuditSpec
  * pins (AQE off, size-based broadcasts off — explicit hints only). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("planpeek")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val static = args.contains("--static")
    if (static) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    }
    args.filterNot(_.startsWith("--")).foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
