package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The top-k APIs must work for ANY id column type: integral ids take
  * the bounded-heap pre-prune, everything else the rank-only path.
  * Zero-padded string ids order identically to their numeric twins, so
  * the two paths must return the exact same rows.
  */
class SimilaritySpec extends SparkTestBase {

  test("top-k with string ids ≡ top-k with numeric ids (rank path, no silent null cast)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val sEmb = e.select(format_string("%05d", col("vec_id")).as("vec_id"),
      col("embedding"))
    val fromString = Similarity.bruteForceTopK(
      sEmb.filter(col("vec_id") < "00005"), sEmb, "vec_id", "embedding", k = 3)
    val fromNumeric = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
      .select(format_string("%05d", col("query_id")).as("query_id"),
        format_string("%05d", col("neighbor_id")).as("neighbor_id"),
        col("cosine"), col("rank"))
    val s = fromString.collect().map(_.toSeq).toSet
    val n = fromNumeric.collect().map(_.toSeq).toSet
    assert(s.nonEmpty && s == n)
  }
}
