package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bucketed tables must join WITHOUT a shuffle: both sides are
  * pre-hash-partitioned on the join key at write time, so the join
  * plan's only reads are matching bucket files — the plan shape that
  * makes repeated fact-dimension joins affordable at 100 TB.
  */
class CoLocateSpec extends SparkTestBase {

  test("equi-join of same-bucketing tables runs with zero exchange") {
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = graft.Tables.customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_nationkey"))
    // a fresh (forked) JVM has an empty in-memory catalog, but the
    // warehouse dirs persist across runs — clear stale locations first
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete()
    }
    Seq("bkt_orders", "bkt_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        // recursive: a leftover _temporary subdir from an aborted write
        // would defeat a flat listFiles().foreach(_.delete())
        rmTree(dir)
        assert(!dir.exists(), s"stale warehouse dir $dir survived cleanup")
      }
    }
    CoLocate.writeBucketed(orders, "bkt_orders", "o_custkey", 4)
    CoLocate.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "bkt_customer", "o_custkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"), Seq("o_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle
      // and the result is still correct
      val expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
