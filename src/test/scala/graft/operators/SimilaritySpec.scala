package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The top-k APIs must work for ANY id column type: integral ids take
  * the bounded-heap pre-prune, everything else the rank-only path.
  * Zero-padded string ids order identically to their numeric twins, so
  * the two paths must return the exact same rows.
  */
class SimilaritySpec extends SparkTestBase {

  test("top-k with string ids ≡ top-k with numeric ids (rank path, no silent null cast)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val sEmb = e.select(format_string("%05d", col("vec_id")).as("vec_id"),
      col("embedding"))
    val fromString = Similarity.bruteForceTopK(
      sEmb.filter(col("vec_id") < "00005"), sEmb, "vec_id", "embedding", k = 3)
    val fromNumeric = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
      .select(format_string("%05d", col("query_id")).as("query_id"),
        format_string("%05d", col("neighbor_id")).as("neighbor_id"),
        col("cosine"), col("rank"))
    val s = fromString.collect().map(_.toSeq).toSet
    val n = fromNumeric.collect().map(_.toSeq).toSet
    assert(s.nonEmpty && s == n)
  }

  test("hardNegatives: every mined negative has a different label; ranks follow cosine; same-label twins are excluded") {
    import spark.implicits._
    // label 0: two near-identical vectors (would be each other's top-1
    // under bruteForceTopK); label 1/2: progressively farther vectors
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.1f, 0.0f), 0),
      (3L, Seq(0.7f, 0.7f, 0.0f), 1),
      (4L, Seq(0.0f, 1.0f, 0.0f), 1),
      (5L, Seq(0.0f, 0.0f, 1.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df.filter(col("vec_id") <= 2), df,
        "vec_id", "embedding", "label", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val labels = Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 2)
    out.foreach { case (q, n, _) =>
      assert(labels(q) != labels(n), s"positive pair ($q, $n) mined as negative")
    }
    // query 1's hardest negative is vector 3 (cos ~0.70), then 4 or 5
    val q1 = out.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(q1.head == 3L, q1)
    // the same-label near-twin (2) never appears for query 1
    assert(!out.filter(_._1 == 1L).map(_._2).contains(2L))
  }

  test("zero-norm (NaN-cosine) corpus vectors never rank, for integral AND string id paths") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 0.0f)), // zero vector: cosine NaN
      (4L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val numeric = Similarity.bruteForceTopK(df.filter(col("vec_id") === 1L), df,
        "vec_id", "embedding", k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    val str = df.withColumn("vec_id", concat(lit("v"), col("vec_id")))
    val stringy = Similarity.bruteForceTopK(str.filter(col("vec_id") === "v1"), str,
        "vec_id", "embedding", k = 3)
      .select("neighbor_id").as[String].collect().map(_.stripPrefix("v").toLong).toSet
    assert(numeric == Set(2L, 4L), numeric.toString)
    assert(stringy == numeric, s"id-type-dependent top-k: $stringy vs $numeric")
  }

  test("sq8TopK with rerank = corpus size equals bruteForceTopK exactly") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count().toInt
    val exact = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    val sq8 = Similarity.sq8TopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 3, rerank = n)
      .collect().map(_.toSeq).toSet
    assert(sq8.nonEmpty && sq8 == exact)
  }

  test("sq8TopK: quantization clamps to ±127 and the candidate scan is pure integer order") {
    import spark.implicits._
    // components beyond ±1 clamp to ±127, so vectors 2 and 3 quantize
    // IDENTICALLY (same codes → tied integer score, tie broken by id);
    // the full-precision re-rank then orders them by true cosine
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(5.0f, 0.0f)),  // clamps to (127, 0)
      (3L, Seq(9.0f, 0.0f)),  // clamps to (127, 0) — same codes as 2
      (4L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.sq8TopK(df.filter(col("vec_id") === 1L), df,
        "vec_id", "embedding", k = 3, rerank = 3)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    // 2 and 3 both have cosine 1.0 to the query; rank ties break by id
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 4L), out.mkString(","))
    assert(out(0)._2 == 1.0 && out(1)._2 == 1.0)
  }

  test("ivfSq8TopK with rerank = corpus size equals ivfTopK at the same cells/probes (quantization only reorders candidates, never the final rank)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count().toInt
    val full = Similarity.ivfTopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2)
      .collect().map(_.toSeq).toSet
    val quantized = Similarity.ivfSq8TopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 2, rerank = n)
      .collect().map(_.toSeq).toSet
    assert(quantized.nonEmpty && quantized == full)
  }

  test("ivfSq8TopK with all cells probed and full rerank equals bruteForceTopK") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = e.count().toInt
    val exact = Similarity.bruteForceTopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding", k = 3)
      .collect().map(_.toSeq).toSet
    val ivfsq = Similarity.ivfSq8TopK(
      e.filter(col("vec_id") < 5), e, "vec_id", "embedding",
      k = 3, nCells = 4, nProbe = 4, rerank = n)
      .collect().map(_.toSeq).toSet
    assert(ivfsq.nonEmpty && ivfsq == exact)
  }

  test("sq8TopK rejects rerank < k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    intercept[IllegalArgumentException] {
      Similarity.sq8TopK(e, e, "vec_id", "embedding", k = 5, rerank = 4)
    }
  }

  test("knnGraph: ≤ k ranked edges per node, cosine ordering, mutual ⇔ reverse edge present") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val edges = Similarity.knnGraph(e, "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(edges.nonEmpty)
    // per-src: ranks are 1..n (n ≤ k), cosine non-increasing in rank
    edges.groupBy(_._1).foreach { case (src, es) =>
      val byRank = es.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length).toSeq, s"src $src")
      assert(byRank.length <= 5, s"src $src has > k edges")
      byRank.sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"src $src rank order")
        case _ =>
      }
      assert(es.forall(_._2 != src), s"src $src has a self-edge")
    }
    // mutual is exactly "the reversed edge also survived top-k"
    val edgeSet = edges.map(t => (t._1, t._2)).toSet
    edges.foreach { case (s, d, _, _, m) =>
      assert(m == edgeSet.contains((d, s)), s"mutual flag wrong on ($s, $d)")
    }
  }

  test("knnGraph: pair-budget guard trips loudly on a single-bucket corpus") {
    import spark.implicits._
    // 60 near-identical vectors: all share one LSH bucket, so the
    // multiprobe self-join would generate ~(nPlanes+1)·60² candidate
    // rows — the skewed-corpus case the guard exists to catch
    val df = (1L to 60L).map(i => (i, Seq(1.0f, i.toFloat * 1e-6f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraph(df, "vec_id", "embedding", k = 2,
        nPlanes = 4, dim = 2, maxCandidatePairs = 1000L)
    }
    assert(e.getMessage.contains("candidate pairs > budget 1000"))
    assert(e.getMessage.contains("suggestedPlanes"))
    // same corpus, budget lifted: the graph still computes (fail-loud,
    // not fail-wrong)
    val edges = Similarity.knnGraph(df, "vec_id", "embedding", k = 2,
      nPlanes = 4, dim = 2, maxCandidatePairs = Long.MaxValue)
    assert(edges.groupBy("src_id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("suggestedPlanes: bucket count tracks corpus growth, capped at 62") {
    // at the reference scale the tuned base comes back unchanged
    assert(Similarity.suggestedPlanes(250L) == 8)
    assert(Similarity.suggestedPlanes(1L) == 8)
    // each growth factor g adds ⌈log₂ g⌉ planes (the canary's 8 → 12
    // at 10× rule, now API)
    assert(Similarity.suggestedPlanes(2500L) == 12)
    assert(Similarity.suggestedPlanes(500L) == 9)
    assert(Similarity.suggestedPlanes(2000L, basePlanes = 8, baseCorpus = 200L) == 12)
    // exact powers of two don't over-shoot
    assert(Similarity.suggestedPlanes(2048L, basePlanes = 8, baseCorpus = 256L) == 11)
    // Long-bitmask cap
    assert(Similarity.suggestedPlanes(Long.MaxValue, basePlanes = 8, baseCorpus = 1L) == 62)
    intercept[IllegalArgumentException] {
      Similarity.suggestedPlanes(0L)
    }
  }

  test("knnGraph: within tight clusters every edge is mutual and cluster-internal") {
    import spark.implicits._
    // two tight clusters in nearly-opposite directions: cross-cluster
    // bucket signatures differ in ≥ 2 planes with overwhelming
    // probability, within-cluster vectors share their bucket
    val df = Seq(
      (1L, Seq(1.0f, 0.01f)), (2L, Seq(0.99f, 0.0f)), (3L, Seq(1.0f, 0.02f)),
      (11L, Seq(-1.0f, -0.01f)), (12L, Seq(-0.99f, 0.0f)), (13L, Seq(-1.0f, -0.02f)))
      .toDF("vec_id", "embedding")
    val edges = Similarity.knnGraph(df, "vec_id", "embedding", k = 2,
        nPlanes = 4, dim = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(4)))
    assert(edges.length == 12) // 6 nodes × 2 cluster-mates each
    edges.foreach { case (s, d, m) =>
      assert((s < 10) == (d < 10), s"cross-cluster edge ($s, $d)")
      assert(m, s"within-cluster edge ($s, $d) not mutual")
    }
  }
}
