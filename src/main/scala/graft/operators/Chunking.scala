package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for training pipelines: split each document into
  * fixed-size overlapping windows (the pre-tokenization step that turns
  * long documents into model-context-sized pieces, and the front half of
  * any chunk-level embedding / retrieval index build).
  *
  * Reference scope note: arcon has no sub-record text operators — this is
  * part of the training-data extension surface, same tier as
  * [[Dedup.passageExactDedup]] (cf. /root/reference/arcon/src/lib.rs:3-27,
  * which stops at record-level stream combinators).
  */
object Chunker {

  /** Fixed character windows: chunk `i` covers `[i*stride, i*stride+size)`
    * with `size > stride` giving `size - stride` characters of overlap;
    * every character is covered and the final chunk may be shorter. The
    * start set is `{ i*stride : i*stride < length }`, i.e.
    * `ceil(length / stride)` chunks per document.
    *
    * Plan shape at 100 TB: a pipelined generator explode (factor
    * ≈ docChars/stride) with NO shuffle anywhere — chunking is a narrow
    * map, so it composes with a downstream dedup/embed stage without
    * moving the corpus. The explode is `explode_outer` + null-filter, not
    * a bare `explode`: InferFiltersFromGenerate would clone the whole
    * chunk-building expression into an inferred `size(...) > 0` filter
    * under a non-outer generate and re-run the substring loop per row
    * (same hazard as [[Dedup.passageExactDedup]]).
    *
    * @return (id, chunk_id, chunk, n_chars) — one row per chunk, chunk_id
    *         dense from 0 in document order.
    */
  def fixedWindows(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val len = length(col(textCol))
    // ceil(len / stride) starts; sequence(0, n-1) is invalid for n = 0
    val nChunks = floor((len + lit(stride - 1)) / lit(stride)).cast("int")
    val chunks = when(len > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => col(textCol).substr(i * stride + 1, lit(size))))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col(idCol).as("id"), posexplode_outer(chunks))
      .filter(col("col").isNotNull)
      .select(col("id"), col("pos").cast("long").as("chunk_id"),
        col("col").as("chunk"), length(col("col")).cast("long").as("n_chars"))
  }
}
