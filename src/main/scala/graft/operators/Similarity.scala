package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two strategies with the same output shape (query_id, neighbor_id,
  * cosine, rank):
  *
  *  - [[bruteForceTopK]]: query-set × corpus with a broadcast of the
  *    (small) query side — exact, the correctness baseline. Cost is
  *    |Q|·|corpus| cosines, embarrassingly parallel over corpus
  *    partitions; right up to millions of corpus rows per executor core.
  *  - [[lshTopK]]: random-hyperplane bucketing on both sides; only equal
  *    buckets are compared. At 100 TB this is the one you run: the
  *    shuffle is on bucket keys, comparisons per query drop by ~2^planes,
  *    recall traded via the plane count (multi-probe extends it).
  *
  * Ranking ties break by neighbor id, so results are fully deterministic.
  */
object Similarity {

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), nPlanes, dim).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), nPlanes, dim).as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
