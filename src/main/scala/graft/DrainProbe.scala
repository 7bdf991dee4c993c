package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev probe for the optimization rounds: per-micro-batch attribution
  * for a STREAMING bench cell. Registers a session-wide
  * [[StreamingQueryListener]] and runs the named cells from
  * [[SparkEntry.queries]] under the bench session config, printing for
  * every micro-batch the engine's phase breakdown (addBatch = run the
  * batch plan, queryPlanning, walCommit/commitOffsets = offset log,
  * getBatch/latestOffset = source) and each stateful operator's
  * state-store numbers (rows total/updated, update + commit ms) — the
  * evidence that separates "the drained plan is slow" from "the
  * per-batch state-commit machinery is the floor", and shows directly
  * whether watermark eviction is bounding state rows across batches.
  * `sbt "runMain graft.DrainProbe <reps> <q>..."`; honors
  * `$SPARK_GRAFT_SF_DIR` / `$SPARK_GRAFT_CPUS`. */
object DrainProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
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
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        def d(k: String): Long =
          Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
        println(f"  batch ${p.batchId}%3d rows=${p.numInputRows}%7d " +
          f"trigger=${d("triggerExecution")}%6d ms  addBatch=${d("addBatch")}%6d " +
          f"plan=${d("queryPlanning")}%5d wal=${d("walCommit") + d("commitOffsets")}%5d " +
          f"src=${d("getBatch") + d("latestOffset")}%5d")
        p.stateOperators.foreach { so =>
          println(f"        state ${so.operatorName}%-40s rows=${so.numRowsTotal}%7d " +
            f"upd=${so.numRowsUpdated}%7d updMs=${so.allUpdatesTimeMs}%6d " +
            f"commitMs=${so.commitTimeMs}%6d mem=${so.memoryUsedBytes}%9d")
        }
      }
    })
    def secs(t0: Long): Double =
      math.rint((System.nanoTime() - t0) / 1e6) / 1000
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        println(s"=== $name rep $i")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // streaming cells drain here
        val tBuild = secs(t0)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"  build+drain=${tBuild}%.3f s  post-drain noop=${secs(t1)}%.3f s")
      }
    }
    spark.stop()
  }
}
