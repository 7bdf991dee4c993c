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
    * non-empty space-separated runs.
    *
    * The packing is ONE ordered array-local `aggregate` fold per
    * document: the accumulator carries (running token count, OPEN
    * chunk, closed-chunk array) and each sentence either extends the
    * open chunk or closes it and opens a new one — every sentence is
    * visited once, exact integer arithmetic, and the closed array is
    * copied only at chunk boundaries, so per-document work is
    * O(sentences + chunks²) element copies (chunks²/2 from the
    * append-per-boundary copy; chunks = docTokens/budget, far smaller
    * than sentences×chunks). (The obvious alternative — per-chunk
    * `filter` passes over an indexed sentence array — re-evaluates the
    * whole zip/cumsum expression tree for every chunk×field because
    * Catalyst does not share subexpressions across nested lambda
    * bodies; measured ~10× slower on the bench corpus.) The whole
    * operator is a narrow generator projection: NO shuffle anywhere,
    * same 100 TB contract as [[fixedWindows]] — chunking composes with
    * a downstream embed/dedup stage without moving the corpus. Same
    * `explode_outer` + null-filter discipline as [[fixedWindows]]
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
    val chunkStruct =
      "struct<chunk_id:bigint,chunk:string,n_tokens:bigint,n_sentences:bigint>"
    val zero = struct(lit(0L).as("cum"),
      lit(null).cast(chunkStruct).as("open"),
      array().cast(s"array<$chunkStruct>").as("closed"))
    val folded = aggregate(
      sents,
      zero,
      (acc, s) => {
        val cum = acc.getField("cum")
        val open = acc.getField("open")
        val closed = acc.getField("closed")
        // the sentence's token count is BOUND once (r22): HOF lambdas
        // get no CSE, and `tk` is referenced three times below (the
        // running total, the extended chunk, the fresh chunk), so the
        // direct form re-split the sentence 3× per fold step
        graft.functions.TextFunctions.bind(
          size(filter(split(s, " "), w => length(w) > 0)).cast("long"), tk => {
        val k = floor(cum / budget).cast("long")
        // null open ⇒ null === k ⇒ false ⇒ the otherwise (open new) arm
        val sameChunk = open.getField("chunk_id") === k
        val extended = struct(
          k.as("chunk_id"),
          concat(open.getField("chunk"), lit(" "), s).as("chunk"),
          (open.getField("n_tokens") + tk).as("n_tokens"),
          (open.getField("n_sentences") + lit(1L)).as("n_sentences"))
        val fresh = struct(
          k.as("chunk_id"), s.as("chunk"),
          tk.as("n_tokens"), lit(1L).as("n_sentences"))
        struct(
          (cum + tk).as("cum"),
          when(sameChunk, extended).otherwise(fresh).as("open"),
          when(sameChunk || open.isNull, closed)
            .otherwise(concat(closed, array(open))).as("closed"))
        })
      },
      acc => when(acc.getField("open").isNull, acc.getField("closed"))
        .otherwise(concat(acc.getField("closed"),
          array(acc.getField("open")))))
    docs
      .select(col(idCol).as("id"), explode_outer(folded).as("c"))
      .filter(col("c").isNotNull)
      .select(col("id"), col("c.chunk_id"), col("c.chunk"),
        col("c.n_tokens"), col("c.n_sentences"))
  }
}
