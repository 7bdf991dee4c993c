package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** The native Catalyst expressions must be bit-identical to their
  * declarative HOF twins — the twins are the executable specification
  * (and the thing the DuckDB oracles were derived from). Checked over
  * the real sf0.001 corpus plus adversarial edge cases (empty text,
  * sub-shingle-length texts, repeated tokens, multi-space runs, CJK).
  */
class NativeExprParitySpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    val edges = Seq(
      "", "a", "a b", "one two three", "one two three four",
      "tok tok tok tok", "x  y   z", " leading", "trailing ",
      "的 是 了 在 和", "a b a b a b").toDF("text")
    real.union(edges)
  }

  test("native text expressions ≡ HOF twins (polyHash/simHash/shingles/bandKeys)") {
    val df = corpus.select(
      T.polyHash(col("text")).as("n1"), T.polyHashHof(col("text")).as("h1"),
      T.simHash(col("text")).as("n2"), T.simHashHof(col("text")).as("h2"),
      T.shingleHashes(col("text"), 3).as("n3"),
      T.shingleHashesHof(col("text"), 3).as("h3"),
      T.minHashBandKeys(col("text"), 3, 32, 8).as("n4"),
      T.minHashBandKeysHof(T.shingleHashesHof(col("text"), 3), 32, 8).as("h4"))
    val bad = df.filter(!(col("n1") <=> col("h1") && col("n2") <=> col("h2") &&
      col("n3") <=> col("h3") && col("n4") <=> col("h4"))).count()
    assert(bad == 0)
  }

  test("native topBigramFrac ≡ HOF twin (incl. <2-token and repeat edges)") {
    val df = corpus.select(
      T.topBigramFrac(col("text")).as("n"),
      T.topBigramFracHof(col("text")).as("h"))
    assert(df.filter(!(col("n") <=> col("h"))).count() == 0)
  }

  test("native ngramCharFrac ≡ HOF twin (top + dup, n ∈ {2, 5, 10})") {
    val checks = for {
      n <- Seq(2, 5, 10)
      dup <- Seq(false, true)
    } yield (T.topNgramCharFrac(col("text"), n), // native top unused when dup
      if (dup) T.dupNgramCharFrac(col("text"), n) else T.topNgramCharFrac(col("text"), n),
      T.ngramCharFracHof(col("text"), n, dup))
    val df = corpus.select(checks.zipWithIndex.flatMap { case ((_, nat, hof), i) =>
      Seq(nat.as(s"n$i"), hof.as(s"h$i")) }: _*)
    val bad = df.filter(checks.indices.map(i =>
      !(col(s"n$i") <=> col(s"h$i"))).reduce(_ || _)).count()
    assert(bad == 0)
  }

  test("native jaccard ≡ HOF twin (incl. empty-set edge)") {
    val pairs = corpus.as("a").crossJoin(corpus.limit(5).as("b"))
      .select(T.shingleHashes(col("a.text"), 3).as("sa"),
        T.shingleHashes(col("b.text"), 3).as("sb"))
    val bad = pairs.filter(
      !(T.jaccardShingles(col("sa"), col("sb")) <=>
        T.jaccardShinglesHof(col("sa"), col("sb")))).count()
    assert(bad == 0)
  }

  test("native aHash61 ≡ pure-Scala reference on random byte streams + edges") {
    // independent reference: functional restatement of the pooling rule
    def ref(b: Array[Byte]): Long = {
      val n = b.length
      val cells = (0 until 61).map { j =>
        val lo = (j.toLong * n / 61).toInt
        val hi = ((j + 1).toLong * n / 61).toInt
        if (hi > lo) b.slice(lo, hi).map(x => (x & 0xff).toLong).sum / (hi - lo)
        else 0L
      }
      val mean = cells.sum / 61
      cells.zipWithIndex.collect { case (c, j) if c > mean => 1L << j }.sum
    }
    val rnd = new scala.util.Random(7)
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      Array[Byte](0), Array[Byte](-1), // unsigned-read edge (0xff)
      Array.fill[Byte](61)(42),
      Array.fill[Byte](7)(0)) ++
      (1 to 40).map(_ => Array.fill[Byte](rnd.nextInt(400))(rnd.nextInt(256).toByte))
    val df = cases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "media")
      .select(col("id"), T.aHash61(col("media")).as("sig"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.zipWithIndex.foreach { case (b, i) =>
      assert(got(i.toLong) == ref(b), s"case $i (len ${b.length})")
    }
    // the 61-bit packing contract: top bits always clear
    assert(got.values.forall(s => (s >>> 61) == 0L))
  }

  test("native vector expressions ≡ HOF twins (cosine/lshSignature)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = emb.as("a").crossJoin(emb.limit(7).as("b"))
      .select(col("a.embedding").as("va"), col("b.embedding").as("vb"))
    val bad = pairs.filter(
      !(V.cosine(col("va"), col("vb")) <=> V.cosineHof(col("va"), col("vb")) &&
        V.lshSignature(col("va"), 8, 64) <=> V.lshSignatureHof(col("va"), 8, 64)))
      .count()
    assert(bad == 0)
  }
}
