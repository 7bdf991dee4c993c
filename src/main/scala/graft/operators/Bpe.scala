package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction and tokenization as Spark
  * aggregation — the learned counterpart to the regex token counter in
  * [[graft.functions.TextFunctions]] (SURVEY §6's "token counting" row
  * asked for a BPE-ish approximation; this is the real algorithm,
  * Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"). No reference analog — arcon has no text pipeline —
  * so the design is Spark-first throughout.
  *
  * Scale shape (the reason real BPE trainers work on word histograms,
  * not corpora): the corpus is scanned ONCE into a (word, freq)
  * histogram — one exchange keyed on the word — and every merge round
  * touches only the histogram, whose size is the DISTINCT vocabulary
  * (millions of rows at 100 TB, not billions). Each round is two small
  * jobs over the staged histogram: a pair-count aggregation and a
  * one-row top-1 collect (scalar model selection, the same bounded
  * driver-side pattern as [[Dedup.clusters]]' Σ-convergence check),
  * then the merge applies as a narrow per-row array fold. Rounds are
  * staged through local/reliable checkpoints like every iterative
  * operator here, so lineage stays flat.
  *
  * Merge semantics are the classic ones, expressed identically in the
  * DuckDB oracle so the result is bit-exact cross-engine:
  *  - pair counts are over ADJACENT OVERLAPPING symbol pairs ("a a a"
  *    counts (a,a) twice), weighted by word frequency;
  *  - the best pair maximizes (count, then lexicographic (left, right)
  *    ascending — a total, engine-neutral order over ASCII symbols);
  *  - a merge applies LEFTMOST-NONOVERLAPPING, which the string fold
  *    below gets for free: the accumulator ends with the merged token
  *    (no trailing separator) after a merge, so the just-merged symbol
  *    can never match as the LEFT of the same pair again ("a a a" with
  *    (a,a) → "aa a", not "aa aa").
  */
object Bpe {

  /** One learned merge: rank (1-based round), the pair, and the pair's
    * count at the time it was chosen. */
  final case class Merge(mergeRank: Long, leftSym: String, rightSym: String,
      merged: String, pairCount: Long)

  /** Learned model: the ranked merge list plus the final word → symbol
    * mapping (space-joined symbol string per distinct word) the merges
    * produce — which is all [[tokenize]] needs, since every corpus word
    * maps through the histogram it was learned from. */
  final case class Model(merges: Seq[Merge], vocab: DataFrame)

  /** (word, sym, freq) histogram of `textCol` split on single spaces:
    * the ONE corpus-wide scan and exchange of the whole trainer. `sym`
    * starts as the word's space-joined characters. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    // explode_outer + output-side null/empty filter: a bare explode lets
    // InferFiltersFromGenerate clone the split() into a pre-filter and
    // the corpus-scan projection would tokenize every text twice
    docs.select(explode_outer(split(col(textCol), " ")).as("word"))
      .filter(col("word").isNotNull && col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .select(col("word"), array_join(split(col("word"), ""), " ").as("sym"),
        col("freq"))

  /** Apply one merge (a, b) to a space-joined symbol string: fold the
    * symbols left to right, gluing `x` onto the accumulator WITHOUT a
    * separator when the accumulator ends in the complete symbol `a` and
    * `x = b` (string concatenation of adjacent symbols IS the merge).
    * "Complete symbol" = preceded by a separator or the whole
    * accumulator, which also encodes non-overlap: after a merge the
    * accumulator ends in `ab`, not `a`. */
  private def applyMerge(sym: Column, a: String, b: String): Column =
    applyMerge(sym, lit(a), lit(b))

  /** Column-general form of the merge fold, shared by the learn loop
    * (literal pair) and [[applyMerges]] (pair from the replayed merge
    * array). */
  private def applyMerge(sym: Column, a: Column, b: Column): Column = {
    val s = split(sym, " ")
    aggregate(slice(s, lit(2), size(s) - 1), element_at(s, 1),
      (acc, x) =>
        when(x === b &&
            (acc === a || acc.endsWith(concat(lit(" "), a))),
          concat(acc, x))
        .otherwise(concat(acc, lit(" "), x)))
  }

  /** Rank-ordered merge replay: tokenize ONE word with a fixed learned
    * merge list — the path for words the training histogram never saw.
    * Each merge applies once, in rank order, leftmost-nonoverlapping —
    * exactly the computation [[learn]] runs against the histogram, so
    * for every training-corpus word this replay reproduces the model
    * vocab's symbol string bit-for-bit (the learn loop IS a rank-ordered
    * single pass per round). Pure array-local fold: the merge list is a
    * literal in the expression (a real tokenizer's merge table is a few
    * tens of thousands of entries — it rides the closure, no join). */
  def applyMerges(word: Column, merges: Seq[Merge]): Column = {
    val init = array_join(split(word, ""), " ")
    if (merges.isEmpty) init
    else aggregate(
      array(merges.map(m =>
        struct(lit(m.leftSym).as("l"), lit(m.rightSym).as("r"))): _*),
      init,
      (acc, m) => applyMerge(acc, m.getField("l"), m.getField("r")))
  }

  /** Tokenize ANY corpus with a FIXED learned model — the apply-only
    * tokenizer every production pipeline runs (the model is trained
    * once, then applied to each new crawl). In-vocabulary words resolve
    * through the model's word → symbols table ([[tokenize]]'s lookup —
    * the cheap path, one broadcastable join); out-of-vocabulary words
    * fall back to [[applyMerges]] replay, computed once per DISTINCT
    * word (the word-histogram compaction that makes BPE tractable at
    * corpus scale), never per occurrence. `coalesce` evaluates lazily,
    * so the replay fold only runs for OOV rows.
    *
    * Plan at 100 TB: one exchange keyed on the word for the distinct-
    * word table (vocabulary-sized), the replay array-local over it, and
    * the occurrences → symbols join broadcastable; document re-assembly
    * is the same ordered collect as [[tokenize]].
    *
    * @return (idCol, bpe_text, n_tokens) — same contract as
    *         [[tokenize]]; empty documents are omitted. */
  def applyModel(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val words = explodeWords(docs, idCol, textCol)
    val syms = words.select(col("word")).distinct()
      .join(model.vocab.select(col("word"), col("sym")), Seq("word"), "left")
      .select(col("word"),
        coalesce(col("sym"), applyMerges(col("word"), model.merges)).as("sym"))
    reassemble(words.join(syms, Seq("word")), idCol)
  }

  /** (idCol, i, word) position-preserving word explode shared by
    * [[tokenize]] and [[applyModel]] (explode_outer + output-side
    * filter — the house generator discipline). */
  private def explodeWords(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode_outer(split(col(textCol), " ")).as(Seq("i", "word")))
      .filter(col("word").isNotNull && col("word") =!= "")

  /** Ordered document re-assembly from (idCol, i, sym) rows — shared by
    * [[tokenize]] and [[applyModel]] so the two tokenizer paths cannot
    * drift. Returns (idCol, bpe_text, n_tokens). */
  private def reassemble(mapped: DataFrame, idCol: String): DataFrame =
    mapped
      .groupBy(col(idCol))
      .agg(array_join(transform(array_sort(
          collect_list(struct(col("i"), col("sym")))),
          p => p.getField("sym")), " ").as("bpe_text"))
      .select(col(idCol), col("bpe_text"),
        size(split(col("bpe_text"), " ")).cast("long").as("n_tokens"))

  /** Run `numMerges` rounds of pair-count → argmax → merge over the
    * corpus word histogram. `reliable` stages rounds through the
    * reliable checkpoint directory instead of executor-local blocks —
    * the same trade documented on [[Dedup.clusters]]. */
  def learn(docs: DataFrame, textCol: String, numMerges: Int,
      reliable: Boolean = false): Model = {
    require(numMerges > 0, "numMerges must be positive")
    def stage(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    var hist = stage(wordHistogram(docs, textCol))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val s = split(col("sym"), " ")
      val best = hist
        .select(explode_outer(arrays_zip(
          slice(s, lit(1), size(s) - 1).as("l"),
          slice(s, lit(2), size(s) - 1).as("r"))).as("pr"),
          col("freq"))
        .filter(col("pr").isNotNull) // single-symbol words: no pairs
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true // every word is one symbol
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Merge(rank.toLong, a, b, a + b, c)
        hist = stage(hist.withColumn("sym", applyMerge(col("sym"), a, b)))
        rank += 1
      }
    }
    Model(merges.result(), hist)
  }

  /** Tokenize `docs` with a learned model: per-word lookup through the
    * model's vocab table (words explode with their position, join the
    * mapping, re-assemble in order). The vocab is distinct-word-sized —
    * broadcastable for real vocabularies; the hint is left to the
    * planner since the join also runs correctly, one exchange wider, if
    * a future vocabulary outgrows broadcast.
    *
    * @return (idCol, bpe_text, n_tokens): the space-joined BPE symbol
    *         sequence and its length. Documents with no words (empty
    *         text) are omitted, matching the histogram's domain. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    reassemble(explodeWords(docs, idCol, textCol)
      .join(model.vocab.select(col("word"), col("sym")), Seq("word")), idCol)
}
