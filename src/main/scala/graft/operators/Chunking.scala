package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Sentence-boundary token-budget packing: consecutive sentences group
    * into chunks by the token offset at which each sentence STARTS —
    * sentence i belongs to chunk `floor(tokensBefore(i) / budget)`. The
    * RAG-style "semantic" chunker: chunk boundaries fall between
    * sentences, never mid-sentence, and each chunk carries ~`budget`
    * tokens (a chunk can exceed the budget by at most its boundary
    * sentence — the price of never splitting one).
    *
    * Boundary-aligned, NOT greedy, deliberately: greedy packing ("close
    * the chunk when adding would overflow") is a sequential decision per
    * sentence, so chunk ids depend on the whole prefix and nothing
    * parallelizes or replays. The floor rule is STATELESS — the same
    * fixed token-offset-boundary semantics as [[Splits.tokenBudgetShards]]
    * (chunk ids are a pure function of the prefix token count, stable
    * under append, recomputable for any row independently) — which is
    * also what makes it engine-neutral and oracle-checkable. Chunk ids
    * are floor-based and may skip values when one sentence spans a whole
    * boundary interval; they are strictly increasing in document order.
    *
    * `sentences` is an `array<string>` column — the caller owns sentence
    * segmentation (a regex split on terminal punctuation in production).
    * Null and empty sentences are dropped before packing. Tokens are
    * non-empty space-separated runs. The per-document running sum is
    * computed ARRAY-LOCALLY (an ordered `aggregate` fold — exact integer
    * arithmetic), so the whole operator is one narrow generator
    * projection: NO shuffle anywhere, same 100 TB contract as
    * [[fixedWindows]] — chunking composes with a downstream embed/dedup
    * stage without moving the corpus. The fold's array-concat
    * accumulator is O(sentences²) per document in tiny per-row arrays —
    * bounded by sentences-per-doc, not corpus size. Same
    * `posexplode_outer` + null-filter discipline as [[fixedWindows]]
    * (InferFiltersFromGenerate would clone the packing expression into
    * an inferred filter under a bare explode).
    *
    * @return (id, chunk_id, chunk, n_tokens, n_sentences) — one row per
    *         chunk; `chunk` is its sentences joined by a single space.
    */
  def sentencePack(docs: DataFrame, idCol: String, sentences: Column,
      budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val sents = filter(sentences, s => s.isNotNull && length(s) > 0)
    val tkc = transform(sents, s =>
      size(filter(split(s, " "), w => length(w) > 0)).cast("long"))
    // cum(i) (1-based) = tokens before sentence i; leading-0 ordered fold
    val cum = aggregate(tkc, array(lit(0L)),
      (acc, x) => concat(acc, array(element_at(acc, -1) + x)))
    val n = size(sents)
    val idx = when(n > 0, sequence(lit(1), n))
      .otherwise(array().cast("array<int>"))
    val zipped = transform(idx, i => struct(
      element_at(sents, i).as("s"),
      element_at(tkc, i).as("tk"),
      floor(element_at(cum, i) / budget).cast("long").as("k")))
    val ks = transform(zipped, z => z.getField("k"))
    val chunks = transform(array_distinct(ks), k => struct(
      k.as("chunk_id"),
      array_join(transform(filter(zipped, z => z.getField("k") === k),
        z => z.getField("s")), " ").as("chunk"),
      aggregate(filter(zipped, z => z.getField("k") === k), lit(0L),
        (a, z) => a + z.getField("tk")).as("n_tokens"),
      size(filter(zipped, z => z.getField("k") === k)).cast("long")
        .as("n_sentences")))
    docs
      .select(col(idCol).as("id"), explode_outer(chunks).as("c"))
      .filter(col("c").isNotNull)
      .select(col("id"), col("c.chunk_id"), col("c.chunk"),
        col("c.n_tokens"), col("c.n_sentences"))
  }
}
