package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Known-answer pins for the Gopher rule battery: the char-mass n-gram
  * statistics against hand-computed values, the rule verdicts on
  * crafted pass/fail documents, and the null-text contract.
  */
class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  test("ngram char-mass fractions: hand-computed values on 'a b a b a b'") {
    // tokens [a b a b a b] (11 chars): bigrams "a b"×3, "b a"×2, each
    // len 3 → top mass 9, dup mass 9 + 6 = 15. Overlap counting can
    // exceed 1 by design (all occurrences count, chars re-counted per
    // covering gram).
    val row = Seq("a b a b a b").toDF("text")
      .select(T.topNgramCharFrac(col("text"), 2).as("top2"),
        T.dupNgramCharFrac(col("text"), 2).as("dup2"),
        T.topNgramCharFrac(col("text"), 5).as("top5"),
        T.dupNgramCharFrac(col("text"), 5).as("dup5"))
      .head()
    assert(row.getDouble(0) == 9.0 / 11.0)
    assert(row.getDouble(1) == 15.0 / 11.0)
    // 5-grams: "a b a b a"×1, "b a b a b"×1 → top 9/11, dup 0
    assert(row.getDouble(2) == 9.0 / 11.0)
    assert(row.getDouble(3) == 0.0)
  }

  test("ngram char-mass fractions: degenerate edges are 0") {
    val rows = Seq("", "a", "one two three").toDF("text")
      .select(T.topNgramCharFrac(col("text"), 5).as("top5"),
        T.dupNgramCharFrac(col("text"), 5).as("dup5"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == 0.0)
      assert(r.getDouble(1) == 0.0)
    }
  }

  test("rule battery: crafted pass and fail documents") {
    // 60 tokens, all distinct (no repeated n-grams), 2 stopwords,
    // mean token length ≈ 5.9
    val good = (Seq("the", "of") ++ (1 to 58).map(i => f"word$i%02d")).mkString(" ")
    val short = "the of one two three" // fails word count
    val repeat = ("spam ham " * 30).trim // 60 tokens but one dominant bigram
    val noStops = (1 to 60).map(i => s"w$i").mkString(" ") // no stopwords
    val df = Seq((1L, good), (2L, short), (3L, repeat), (4L, noStops))
      .toDF("doc_id", "text")
    val out = GopherRules.report(df, "doc_id", "text")
      .select("doc_id", "pass_quality", "pass_repetition", "keep")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(out(1L) == ((true, true, true)))
    assert(out(2L)._1 == false && out(2L)._3 == false) // word count < 50
    assert(out(3L)._2 == false && out(3L)._3 == false) // top-2gram frac ≈ 0.5
    assert(out(4L)._1 == false && out(4L)._3 == false) // no stopwords
  }

  test("null text fails everything, stats are null") {
    val out = GopherRules.report(
      Seq((1L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(out.isNullAt(out.fieldIndex("n_tokens")))
    assert(!out.getBoolean(out.fieldIndex("pass_quality")))
    assert(!out.getBoolean(out.fieldIndex("pass_repetition")))
    assert(!out.getBoolean(out.fieldIndex("keep")))
  }
}
