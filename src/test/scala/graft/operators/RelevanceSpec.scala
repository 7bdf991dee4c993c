package graft.operators

import graft.SparkTestBase

/** Hand-computed TF-IDF / BM25 fixtures (the DuckDB oracle pins the
  * corpus-scale run; these pin the math itself on corpora small enough
  * to verify by hand), plus the determinism and exclusion semantics the
  * oracle compare can't isolate.
  */
class RelevanceSpec extends SparkTestBase {
  import spark.implicits._

  private val eps = 1e-9

  test("tfidfTopTerms: tf/df/tfidf match hand computation; ties break by term") {
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b b d"),
      (3L, "a c")).toDF("doc_id", "text")
    val out = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
      .sortBy(t => (t._1, -t._5, t._2))
    // df: a=3 b=2 c=2 d=1; N=3
    val ln15 = math.log(3.0 / 2.0)
    val ln3 = math.log(3.0)
    val expected = Seq(
      // doc 1: b and c tie at ln(1.5) -> term asc picks b, then c
      (1L, "b", 1L, 2L, ln15), (1L, "c", 1L, 2L, ln15),
      // doc 2: d = ln(3) beats b = 2·ln(1.5)
      (2L, "d", 1L, 1L, ln3), (2L, "b", 2L, 2L, 2 * ln15),
      // doc 3: c = ln(1.5) beats a = 0
      (3L, "c", 1L, 2L, ln15), (3L, "a", 1L, 3L, 0.0))
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (got, want) =>
      assert(got._1 == want._1 && got._2 == want._2 &&
        got._3 == want._3 && got._4 == want._4, s"$got vs $want")
      assert(math.abs(got._5 - want._5) < eps, s"$got vs $want")
    }
  }

  test("bm25: symmetric docs score equal, non-matching docs are excluded") {
    val docs = Seq(
      (1L, "x x y z z z"),
      (2L, "x y y q q q"),
      (3L, "q q q q q q")).toDF("doc_id", "text")
    val out = Relevance.bm25(docs, "doc_id", "text", Seq("x", "y"))
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(out.keySet == Set(1L, 2L)) // doc 3 has no query term
    // N=3, avgdl=6, df(x)=df(y)=2, idf=ln(1.6); dl=6 -> denom tf+1.2
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    val want = idf * (2 * 2.2 / 3.2 + 1 * 2.2 / 2.2) // tf {2,1} either way
    assert(math.abs(out(1L)._1 - want) < eps, out)
    assert(math.abs(out(2L)._1 - want) < eps, out)
    assert(out(1L)._2 == 2 && out(2L)._2 == 2)
  }

  test("bm25: more occurrences score higher; length normalization penalizes dl") {
    val docs = Seq(
      (1L, "x x"),
      (2L, "x")).toDF("doc_id", "text")
    val out = Relevance.bm25(docs, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // tf=2 wins even though doc 1 is twice avg length
    assert(out(1L) > out(2L), out)

    val padded = Seq(
      (1L, "x pad pad pad pad pad pad pad"),
      (2L, "x")).toDF("doc_id", "text")
    val out2 = Relevance.bm25(padded, "doc_id", "text", Seq("x"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same tf, longer doc -> lower score
    assert(out2(1L) < out2(2L), out2)
  }

  test("tfidfTopTerms and bm25 are deterministic run-to-run") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    def runT() = Relevance.tfidfTopTerms(docs, "doc_id", "text", k = 3)
      .collect().map(_.toString).sorted.toSeq
    def runB() = Relevance.bm25(docs, "doc_id", "text",
      Seq("spark", "join", "window")).collect().map(_.toString).sorted.toSeq
    assert(runT() == runT())
    assert(runB() == runB())
  }

  test("rrfFuse: hand-computed RRF scores; one-list docs score one term; ties break by doc_id") {
    // query 0: doc 10 is rank 1 in BOTH lists → 2/(60+1);
    // doc 11 rank 2 sparse only → 1/62; doc 12 rank 2 dense only → 1/62
    // (tie with doc 11 → doc 11 first); doc 13 rank 3 sparse + rank 4
    // dense → 1/63 + 1/64.
    val sparse = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 13L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 10L, 1L), (0L, 12L, 2L), (0L, 13L, 4L))
      .toDF("query_id", "doc_id", "rank")
    val out = Relevance.rrfFuse(Seq(sparse, dense), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expected = Seq(
      (0L, 10L, 1.0 / 61 + 1.0 / 61, 1L),
      (0L, 13L, 1.0 / 63 + 1.0 / 64, 2L),
      (0L, 11L, 1.0 / 62, 3L),         // tie on score with doc 12:
      (0L, 12L, 1.0 / 62, 4L))         // doc_id ascending breaks it
    assert(out.length == 4)
    out.zip(expected).foreach { case ((q, d, s, r), (eq, ed, es, er)) =>
      assert(q == eq && d == ed && r == er, out.mkString("\n"))
      assert(s == es, s"$d: $s != $es") // bit-exact: ordered two-term sum
    }
  }

  test("rrfFuse: fused top-k truncates at k per query; queries fuse independently") {
    val sparse = (1 to 8).map(i => (0L, i.toLong, i.toLong)) ++
      Seq((1L, 100L, 1L))
    val dense = (1 to 8).map(i => (0L, (100 + i).toLong, i.toLong)) ++
      Seq((1L, 200L, 1L))
    val out = Relevance.rrfFuse(
      Seq(sparse.toDF("query_id", "doc_id", "rank"),
        dense.toDF("query_id", "doc_id", "rank")), k = 5)
    val byQ = out.collect().groupBy(_.getLong(0))
    assert(byQ(0L).length == 5)               // 16 candidates → top 5
    assert(byQ(1L).length == 2)               // fewer than k survive
    assert(byQ(0L).map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
