package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** The Gopher quality-filter rule battery ("Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", Rae et al. 2021,
  * Table A1) — the canonical document-level pretraining filter, as one
  * wide deterministic projection:
  *
  *  - word count within [minWords, maxWords];
  *  - mean word length within [3, 10];
  *  - ≥ 80% of words contain at least one alphabetic character;
  *  - at least 2 distinct "required" stopwords present (the Gopher
  *    stopword-presence rule, with this library's English function-word
  *    list standing in for Gopher's {the, be, to, of, and, that, have,
  *    with});
  *  - top n-gram character fraction ≤ {0.20, 0.18, 0.16} for n = 2,3,4;
  *  - duplicated n-gram character fraction ≤ {0.15, …, 0.10} for
  *    n = 5..10.
  *
  * Gopher's remaining rules are line-based (bullet-start / ellipsis-end
  * ratios) or symbol-based (#, …); this corpus is single-line lowercase
  * [a-z ] text, so those rules are identically-true and deliberately
  * omitted rather than carried as dead columns.
  *
  * Scale shape: a pure NARROW projection — no shuffle, no join, no
  * aggregate; every statistic is a single compiled pass per row
  * ([[graft.functions.NgramCharFracExpr]] et al.), so the filter
  * streams through executors at scan speed however large the corpus.
  * The n-gram fractions are char-MASS fractions (occurrences · gram
  * length / doc length), the NeMo-Curator/Dolma reading of the rule;
  * the DuckDB oracle restates every statistic from list primitives.
  */
object GopherRules {

  /** (n, threshold) for the top-n-gram char-fraction rules. */
  val topNgramMax: Seq[(Int, Double)] =
    Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)

  /** (n, threshold) for the duplicated-n-gram char-fraction rules. */
  val dupNgramMax: Seq[(Int, Double)] =
    Seq(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The quality-family verdict (word count / word shape / alpha words
    * / stopword presence) as a tri-state column (null for null text). */
  def passQuality(t: Column, minWords: Long = 50L,
      maxWords: Long = 100000L): Column =
    // the token array is BOUND once per row (r22): HOF lambdas get no
    // CSE, so the direct form re-ran split(text) per reference — the
    // size bound, the mean-length fold, the alpha-word numerator AND
    // denominator, plus once per stopword inside the presence lambda
    // (~12 O(len) splits per row on the pl3/pl5/pl6/pl7/pl10/x15 gate
    // path). Every statistic below is the same expression over the
    // bound array — same values, same tri-state null behavior.
    TextFunctions.bind(TextFunctions.tokens(t), ts =>
      passQualityOf(ts, minWords, maxWords))

  /** [[passQuality]] over an ALREADY-tokenized array — shared with
    * [[report]], whose projection stages the token array once for all
    * its statistics. Same expression trees, same tri-state nulls. */
  private def passQualityOf(ts: Column, minWords: Long,
      maxWords: Long): Column =
    size(ts).cast("long").between(minWords, maxWords) &&
      TextFunctions.meanTokenLenOf(ts).between(3.0, 10.0) &&
      (size(filter(ts, w => w.rlike("[a-z]"))).cast("double") /
        size(ts).cast("double") >= 0.8) &&
      (size(filter(
        array(TextFunctions.stopwords.toMap.apply("en").map(lit): _*),
        sw => array_contains(ts, sw))).cast("long") >= 2L)

  /** The repetition-family verdict (all 9 n-gram char-mass rules) as a
    * tri-state column (null for null text). */
  def passRepetition(t: Column): Column =
    (topNgramMax.map { case (n, thr) =>
      (TextFunctions.topNgramCharFrac(t, n) <= thr): Column } ++
      dupNgramMax.map { case (n, thr) =>
        (TextFunctions.dupNgramCharFrac(t, n) <= thr): Column })
      .reduce(_ && _)

  /** The overall keep gate as a single boolean column (false for null
    * text) — the composable form pipeline filters use without carrying
    * the full report. */
  def keep(t: Column, minWords: Long = 50L, maxWords: Long = 100000L): Column =
    coalesce(passQuality(t, minWords, maxWords) && passRepetition(t), lit(false))

  /** Per-document rule report: every statistic, the two rule-family
    * verdicts, and the overall keep flag. Null texts fail everything
    * (`keep = false`, stats null) — a null document is not trainable.
    *
    * @return (idCol, n_tokens, mean_tok_len, alpha_word_frac,
    *         stop_hits, top{2,3,4}gram_frac, dup{5..10}gram_frac,
    *         pass_quality, pass_repetition, keep)
    */
  def report(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val t = col(textCol)
    // stage the token array as a REAL projected column consumed by
    // every token statistic below (r22): the direct `tokens(t)` form
    // re-split the text once per reference — the count, the length
    // fold, both alpha-word sides, each of the 7 stopword probes, and
    // again inside the quality verdict. A multi-use non-cheap alias is
    // not re-inlined by CollapseProject, so the split runs once per
    // row; every statistic is the same expression over the staged
    // array — same values, same nulls.
    val tsCol = "__gr_ts"
    val ts = col(tsCol)
    val nTok = size(ts).cast("long")
    val meanLen = TextFunctions.meanTokenLenOf(ts)
    val alphaWords =
      size(filter(ts, w => w.rlike("[a-z]"))).cast("double") /
        size(ts).cast("double")
    val stopHits = size(filter(
      array(TextFunctions.stopwords.toMap.apply("en").map(lit): _*),
      sw => array_contains(ts, sw))).cast("long")
    val tops = topNgramMax.map { case (n, _) =>
      n -> TextFunctions.topNgramCharFrac(t, n) }
    val dups = dupNgramMax.map { case (n, _) =>
      n -> TextFunctions.dupNgramCharFrac(t, n) }

    val passQ = passQualityOf(ts, minWords, maxWords)
    val passR = passRepetition(t)

    df.select(col("*"), TextFunctions.tokens(t).as(tsCol)).select(
      (Seq(col(idCol),
        nTok.as("n_tokens"),
        meanLen.as("mean_tok_len"),
        alphaWords.as("alpha_word_frac"),
        stopHits.as("stop_hits")) ++
        tops.map { case (n, c) => c.as(s"top${n}gram_frac") } ++
        dups.map { case (n, c) => c.as(s"dup${n}gram_frac") } ++
        Seq(
          coalesce(passQ, lit(false)).as("pass_quality"),
          coalesce(passR, lit(false)).as("pass_repetition"),
          coalesce(passQ && passR, lit(false)).as("keep"))): _*)
  }
}
