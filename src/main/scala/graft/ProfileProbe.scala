package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the optimization rounds: split a query cell's wall
  * time into (build, plan, execute) phases and repeat in one JVM, so
  * driver-side planning cost (analysis + optimization + physical
  * planning, serial driver work that the bench cell pays on every
  * repeat) is visible separately from cluster execution. Bench-identical
  * session config. `sbt "runMain graft.ProfileProbe <reps> <q>..."`. */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus,2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // per-job trace (SPARK_GRAFT_PROBE_JOBS=1): job wall time + task
    // count, to see where a build-heavy cell's eager driver work goes
    if (sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1")) {
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val nt = new java.util.concurrent.ConcurrentHashMap[Int,
            java.util.concurrent.atomic.AtomicInteger]()
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            t0.put(e.jobId, System.nanoTime())
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = ()
          override def onStageCompleted(
              e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val s = e.stageInfo
            println(f"    stage ${s.stageId}%4d tasks=${s.numTasks}%4d " +
              s"name=${s.name.take(70)}")
          }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val dt = (System.nanoTime() - t0.getOrDefault(e.jobId, 0L)) / 1e6
            println(f"  job ${e.jobId}%4d ${dt}%8.1f ms")
          }
        })
    }
    def ms(t0: Long): Double = math.rint((System.nanoTime() - t0) / 1e4) / 100
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps + 1).foreach { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // NOTE: streaming cells execute here
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimize+plan
        val tPlan = ms(t1)
        val t2 = System.nanoTime()
        df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
            .cast("double").as("h"))
          .agg(sum(col("h"))).collect()
        val tExec = ms(t2)
        val tag = if (i == 1) "warm" else s"r${i - 1}"
        println(f"[$name%-28s $tag%4s] build=$tBuild%8.1fms plan=$tPlan%8.1fms exec=$tExec%8.1fms")
      }
    }
    spark.stop()
  }
}
