package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: A/B a session-conf set over bench queries, ALTERNATING
  * variants within one JVM so slow JIT/host drift hits both sides
  * equally (the StreamKnobProbe order-robustness lesson). Usage:
  *   SPARK_GRAFT_AB="k=v;k2=v2" sbt "runMain graft.ABProbe <reps> <q>..."
  * Variant A = session defaults, variant B = the conf set applied;
  * each rep runs A then B (and a final reversed pair), printing wall
  * seconds per run plus per-variant min/median. */
object ABProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val confs = sys.env.getOrElse("SPARK_GRAFT_AB", "")
      .split(";").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus,2]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def checksum(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*)
          .cast("double").as("h")).agg(sum(col("h"))).collect()
      ()
    }
    def withVariant[T](b: Boolean)(body: => T): T = {
      if (!b) body
      else {
        val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body
        finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def run(b: Boolean): Double = {
        val t0 = System.nanoTime()
        withVariant(b) { checksum(fn(spark, sfDir)) }
        (System.nanoTime() - t0) / 1e9
      }
      run(false); run(true) // one untimed warm pair
      val order = (1 to reps).flatMap(_ => Seq(false, true)) ++ Seq(true, false)
      val times = order.map(b => b -> run(b))
      val a = times.collect { case (false, t) => t }.sorted
      val b = times.collect { case (true, t) => t }.sorted
      def f(xs: Seq[Double]) = {
        // true median: each variant collects reps+1 samples (an even
        // count), and the upper-middle element biased the A/B medians
        // decisions are read from (ADVICE r21)
        val med =
          if (xs.size % 2 == 1) xs(xs.size / 2)
          else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2.0
        f"min=${xs.head}%.2f med=$med%.2f all=[${xs.map(x => f"$x%.2f").mkString(",")}]"
      }
      println(s"[$name] A(default) ${f(a)}")
      println(s"[$name] B(confs)   ${f(b)}")
    }
    spark.stop()
  }
}
