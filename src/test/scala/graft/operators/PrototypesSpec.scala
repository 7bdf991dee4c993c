package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics the DuckDB oracle can't pin down for prototypicality:
  * the hand-computed quantized-mean arithmetic, partitioning-invariance
  * of the centroid (the commutative-integer-sum claim), null hygiene,
  * and the corpus-never-shuffles plan shape.
  */
class PrototypesSpec extends SparkTestBase {
  import spark.implicits._

  test("prototypicality: hand-computed centroid and cosine on exact dyadic values") {
    // label 0: [1, 0] and [0, 1] -> centroid [0.5, 0.5] (exact: the
    // coordinates are multiples of 2^-20, so quantization is lossless).
    // cos([1,0], [0.5,0.5]) = 0.5 / (1 * sqrt(0.5)) = sqrt(0.5).
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), 0),
      (2L, Seq(0.0f, 1.0f), 0),
      (3L, Seq(0.5f, 0.5f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Prototypes.prototypicality(df, "vec_id", "embedding", "label",
        pruneAbove = 0.9)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    val exp = math.sqrt(0.5)
    assert(math.abs(out(1L)._1 - exp) < 1e-15)
    assert(math.abs(out(2L)._1 - exp) < 1e-15)
    assert(out(1L)._2 && out(2L)._2) // sqrt(0.5) < 0.9 -> keep
    // singleton label: centroid == the vector; cosine is 1 up to the
    // norm-product rounding (sqrt(0.5)^2 = 0.5000000000000001)
    assert(out(3L)._1 > 0.999999999 && !out(3L)._2)
  }

  test("prototypicality: centroid is partitioning-invariant (commutative integer sums)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    def run(parts: Int) =
      Prototypes.prototypicality(emb.repartition(parts),
        "vec_id", "embedding", "label", pruneAbove = 0.98)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val a = run(2)
    val b = run(7)
    assert(a.size > 0 && a == b, "proto_cos must be bit-identical under any partitioning")
  }

  test("prototypicality: null vectors and null labels drop") {
    val df = Seq(
      (1L, Option(Seq(1.0f, 0.0f)), Option(0)),
      (2L, Option.empty[Seq[Float]], Option(0)),
      (3L, Option(Seq(0.0f, 1.0f)), Option.empty[Int]))
      .toDF("vec_id", "embedding", "label")
    val ids = Prototypes.prototypicality(df, "vec_id", "embedding", "label",
      pruneAbove = 0.9).select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("prototypicality: corpus never shuffles — only (label,pos) sum partials exchange, centroid join is broadcast") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val p = Prototypes.prototypicality(emb, "vec_id", "embedding", "label",
      pruneAbove = 0.98).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_sum"), p)
    // exchanges carry only label-keyed aggregate partials, never the
    // embedding column
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(shuffles.nonEmpty && shuffles.forall(l => !l.contains("embedding#")), p)
  }
}
