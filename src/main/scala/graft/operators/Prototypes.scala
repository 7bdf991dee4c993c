package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Prototypicality scoring for embedding-based data pruning (the
  * "SSL prototypes" metric of Sorscher et al. 2022, *Beyond neural
  * scaling laws* — also the selection signal SemDeDup-style curation
  * uses after clustering): each vector's cosine to its group's centroid.
  * Highly prototypical examples are the redundant "easy" mass a
  * data-abundant training run prunes first; low scorers are the hard /
  * diverse tail it keeps.
  *
  * Reference scope note: arcon has no vector operators — this sits in
  * the training-data extension surface next to [[Dedup.semanticDedup]]
  * (cf. /root/reference/arcon/src/lib.rs:3-27, record-level stream
  * combinators only).
  *
  * == The centroid is an integer-quantized mean ==
  *
  * A float mean folded with `sum()` is shuffle-order-dependent, and the
  * library's usual fix (ordered fold over `collect_list`, cf.
  * [[Dedup.kmeansCentroids]]) collects every member of a group into one
  * array — fine for k-means cells of bounded size, wrong for a label
  * whose membership is a constant fraction of a 100 TB corpus. Here the
  * coordinates quantize FIRST: `floor(double(x) · 2²⁰)` (the ×2²⁰ is a
  * power-of-two exponent shift, exact for every float; `floor` is
  * unambiguous in every engine), and integer sums are COMMUTATIVE — any
  * partitioning, any merge order, same bits. The mean divides once in
  * double (`(Σq / 2²⁰) / n`, two IEEE divisions) and rounds once to
  * float. This is the mx2 micro-nats trick applied to vectors: kill the
  * float-order sensitivity at the source instead of ordering the fold.
  *
  * == Plan shape at 100 TB ==
  *
  *  1. quantize + `posexplode` is a narrow generator (corpus × dim rows,
  *     never materialized wider than a scan batch);
  *  2. the Σ per (label, pos) aggregate combines MAP-SIDE into at most
  *     |labels|·dim partial rows per task — the only thing that reaches
  *     the exchange; the corpus itself never shuffles;
  *  3. centroid assembly folds the |labels|·dim sum table to |labels|
  *     rows (`sort_array(collect_list)` is safe HERE: dim elements per
  *     group, not corpus members);
  *  4. centroids broadcast back and the per-row cosine
  *     ([[VectorFunctions.cosine]], one compiled ordered fold) is
  *     narrow. Rows with a null vector or null label have no defined
  *     prototype and are dropped.
  */
object Prototypes {

  private val Q = 1048576L // 2^20 quantization step

  /** Per-`labelCol` prototypicality: cosine of each vector to its
    * group's quantized-mean centroid, plus the prune verdict
    * (`keep = proto_cos < pruneAbove` — drop the most prototypical).
    *
    * @return (idCol, labelCol, proto_cos, keep)
    */
  def prototypicality(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, pruneAbove: Double): DataFrame = {
    require(pruneAbove >= -1.0 && pruneAbove <= 1.0,
      s"pruneAbove is a cosine threshold in [-1, 1], got $pruneAbove")
    // Malformed rows drop: null vector, null label, or a vector with a
    // null ELEMENT (a null coordinate would silently bias the mean —
    // sum skips it but a row count would not — and feed garbage to the
    // cosine fold).
    val base = emb
      .filter(col(vecCol).isNotNull && col(labelCol).isNotNull &&
        !exists(col(vecCol), x => x.isNull))
      .select(col(idCol).as("id"), col(labelCol).as("label"),
        col(vecCol).as("v"))
    val quantized = base.select(col("label"),
      posexplode(transform(col("v"),
        x => floor(x.cast("double") * Q).cast("long"))))
    val sums = quantized.groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("s"), count(col("col")).as("n"))
    val centroids = sums
      .withColumn("c",
        ((col("s").cast("double") / lit(Q.toDouble))
          / col("n").cast("double")).cast("float"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("centroid"))
    base.join(broadcast(centroids), Seq("label"))
      .withColumn("proto_cos",
        VectorFunctions.cosine(col("v"), col("centroid")))
      .select(col("id").as(idCol), col("label").as(labelCol),
        col("proto_cos"), (col("proto_cos") < pruneAbove).as("keep"))
  }
}
