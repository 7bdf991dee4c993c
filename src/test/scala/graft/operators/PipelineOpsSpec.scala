package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantics the DuckDB oracles can't pin down for the pipeline
  * operators: chunk coverage/overlap invariants, two-phase prefix-sum
  * equivalence to the naive global window (and invariance to the bucket
  * granularity), banded-rank equivalence for quantile bucketing (incl.
  * adversarial tie/out-of-range scores), DSIR weight invariants and
  * plan shape, mixture-rate edge cases, the SemDeDup pair-budget
  * guard, and the no-shuffle plan shape of the narrow operators.
  */
class PipelineOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("lang"), col("text"))

  // ---- Chunker ----

  test("fixedWindows: chunks cover the text exactly and overlap by size - stride") {
    val size = 20
    val stride = 15
    val out = Chunker.fixedWindows(docs, "doc_id", "text", size, stride)
      .orderBy("id", "chunk_id")
      .collect()
      .groupBy(_.getLong(0))
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out.keySet == texts.keySet) // every (non-empty) doc chunked
    for ((id, rows) <- out) {
      val text = texts(id)
      val chunks = rows.sortBy(_.getLong(1)).map(_.getString(2))
      assert(chunks.length == (text.length + stride - 1) / stride)
      // stitching chunk prefixes of `stride` chars reconstructs the text
      val stitched = chunks.map(_.take(stride)).mkString
      assert(stitched == text)
      // consecutive full chunks overlap by size - stride characters
      chunks.sliding(2).foreach {
        case Array(a, b) if a.length == size =>
          assert(a.takeRight(size - stride) == b.take(size - stride))
        case _ => ()
      }
      assert(rows.forall(r => r.getLong(3) == r.getString(2).length))
    }
  }

  test("fixedWindows: empty text yields no chunks; stride = size means no overlap") {
    val df = Seq((1L, ""), (2L, "abcdef")).toDF("doc_id", "text")
    val out = Chunker.fixedWindows(df, "doc_id", "text", size = 4, stride = 4)
      .orderBy("id", "chunk_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((2L, 0L, "abcd"), (2L, 1L, "ef")))
  }

  test("fixedWindows: plan has no Exchange (pure narrow generator)") {
    val plan = Chunker.fixedWindows(docs, "doc_id", "text", 200, 150)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  // ---- sentencePack ----

  /** Pure-Scala boundary-aligned packing: the semantics sentencePack's
    * array-local plan must reproduce. */
  private def refPack(sents: Seq[String], budget: Int)
      : Seq[(Long, String, Long, Long)] = {
    val kept = sents.filter(s => s != null && s.nonEmpty)
    val tkc = kept.map(s => s.split(" ").count(_.nonEmpty).toLong)
    val cumb = tkc.scanLeft(0L)(_ + _).init
    val ks = cumb.map(_ / budget)
    ks.distinct.map { k =>
      val idx = ks.zipWithIndex.filter(_._1 == k).map(_._2)
      (k, idx.map(kept).mkString(" "), idx.map(tkc).sum, idx.size.toLong)
    }
  }

  test("sentencePack: boundary-aligned pin — chunk = floor(tokens-before / budget), boundary sentence may overflow") {
    // token counts 3,3,3 with budget 5: cum-before 0,3,6 -> chunks 0,0,1
    val df = Seq((1L, Seq("a b c", "d e f", "g h i")))
      .toDF("doc_id", "sentences")
    val out = Chunker.sentencePack(df, "doc_id", col("sentences"), budget = 5)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((0L, "a b c d e f", 6L, 2L), (1L, "g h i", 3L, 1L)))
  }

  test("sentencePack equals pure-Scala packing on adversarial sentence lists (nulls, empties, oversized)") {
    val rnd = new scala.util.Random(42)
    val cases: Seq[(Long, Seq[String])] = (0L until 40L).map { id =>
      val n = rnd.nextInt(12)
      id -> (0 until n).map { _ =>
        rnd.nextInt(6) match {
          case 0 => null
          case 1 => ""
          case 2 => Seq.fill(rnd.nextInt(40) + 1)("w").mkString(" ") // oversized
          case _ => Seq.fill(rnd.nextInt(6) + 1)("t" + rnd.nextInt(9)).mkString(" ")
        }
      }
    } :+ (99L -> Seq.empty[String])
    val df = cases.toDF("doc_id", "sentences")
    for (budget <- Seq(1, 7, 24)) {
      val got = Chunker.sentencePack(df, "doc_id", col("sentences"), budget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      val want = cases.flatMap { case (id, sents) =>
        refPack(sents, budget).map { case (k, c, tk, ns) => (id, k, c, tk, ns) }
      }.toSet
      assert(got == want, s"budget=$budget")
    }
  }

  test("sentencePack: plan has no Exchange (array-local running sum, narrow generator)") {
    val df = docs.select(col("doc_id"), split(col("text"), "x").as("sentences"))
    val plan = Chunker.sentencePack(df, "doc_id", col("sentences"), budget = 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sentence packing must not shuffle:\n$plan")
  }

  // ---- tokenBudgetShards ----

  test("tokenBudgetShards: equals the naive global running sum, for any bucket granularity") {
    val tokens = size(split(col("text"), " "))
    val naive = docs
      .select(col("doc_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("shard",
        floor((coalesce(sum(col("n_tokens")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L))) / 512).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (chunkDocs <- Seq(1L, 7L, 64L, 100000L)) {
      val twoPhase = Splits
        .tokenBudgetShards(docs, "doc_id", tokens, capacity = 512, chunkDocs = chunkDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(twoPhase == naive, s"chunkDocs=$chunkDocs diverged from global cumsum")
    }
  }

  test("tokenBudgetShards: shards are contiguous in id order and near the capacity") {
    val out = Splits.tokenBudgetShards(docs, "doc_id",
        size(split(col("text"), " ")), capacity = 512)
      .orderBy("doc_id").collect()
    val shardOf = out.map(_.getLong(2))
    assert(shardOf.sliding(2).forall {
      case Array(a, b) => b >= a // monotone non-decreasing in id order
      case _ => true
    })
    // every shard except possibly the last holds >= capacity tokens only
    // once its boundary doc lands — i.e. total tokens before shard k >= k*512
    val totals = out.groupBy(_.getLong(2)).view.mapValues(_.map(_.getLong(1)).sum).toMap
    val maxShard = totals.keys.max
    for (k <- 0L until maxShard)
      assert(totals.filter(_._1 <= k).values.sum >= (k + 1) * 512 - 512 + 1)
  }

  test("sequenceCuts: equals the naive global running sum, for any bucket granularity") {
    val tokens = size(split(col("text"), " "))
    val L = 512L
    val naive = docs
      .select(col("doc_id"), tokens.cast("long").as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(
          Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .collect().flatMap { r =>
        val (id, n, off) = (r.getLong(0), r.getLong(1), r.getLong(2))
        (off / L to (off + n - 1) / L).map { s =>
          val st = math.max(0L, s * L - off) + 1
          val en = math.min(n - 1, (s + 1) * L - 1 - off) + 1
          (id, s, st, en, en - st + 1)
        }
      }.toSet
    for (chunkDocs <- Seq(1L, 7L, 64L, 100000L)) {
      val twoPhase = Splits
        .sequenceCuts(docs, "doc_id", tokens, seqLen = L, chunkDocs = chunkDocs)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      assert(twoPhase == naive, s"chunkDocs=$chunkDocs diverged from global cumsum")
    }
  }

  test("sequenceCuts: every doc is covered exactly once; every sequence except the last holds exactly seqLen tokens") {
    val L = 512L
    val tokens = size(split(col("text"), " "))
    val out = Splits.sequenceCuts(docs, "doc_id", tokens, seqLen = L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTok = docs.select(col("doc_id"), tokens.cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // per doc: ranges are contiguous, start at 1, end at n — no token
    // lost or duplicated across the cut boundaries
    out.groupBy(_._1).foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._3 == 1L, s"doc $id starts at ${sorted.head._3}")
      assert(sorted.last._4 == nTok(id), s"doc $id ends at ${sorted.last._4}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 == a._4 + 1, s"doc $id gap between seq ${a._2} and ${b._2}")
          assert(b._2 == a._2 + 1, s"doc $id skips a sequence")
        case _ =>
      }
    }
    // per sequence: exactly seqLen tokens except the final ragged one
    val perSeq = out.groupBy(_._2).view
      .mapValues(_.map(t => t._4 - t._3 + 1).sum).toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (s, tot) =>
      if (s < lastSeq) assert(tot == L, s"seq $s holds $tot tokens")
      else assert(tot <= L && tot > 0, s"final seq $s holds $tot")
    }
  }

  test("tokenBudgetShards and sequenceCuts stay exact past 2^53 cumulative tokens (integer div, not double floor)") {
    // per-doc token counts of ~2^51 push the running offset past the
    // double mantissa by doc 5; floor(a / b) would round the boundary
    // for a non-power-of-two divisor, `div` cannot
    val big = (0L until 12L).map(i => (i, (1L << 51) + i)).toDF("doc_id", "n")
    val cap = 1000000000000L + 7L // non-power-of-two, ~2^40
    val shards = Splits.tokenBudgetShards(big, "doc_id", col("n"), capacity = cap, chunkDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cuts = Splits.sequenceCuts(big, "doc_id", col("n"), seqLen = cap, chunkDocs = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // BigInt reference
    var off = BigInt(0)
    val wantShards = scala.collection.mutable.Map.empty[Long, Long]
    val wantCuts = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    for (i <- 0L until 12L) {
      val n = BigInt((1L << 51) + i)
      wantShards(i) = (off / cap).toLong
      var s = off / cap
      val last = (off + n - 1) / cap
      while (s <= last) {
        val st = (BigInt(0).max(s * cap - off) + 1).toLong
        val en = ((n - 1).min((s + 1) * cap - 1 - off) + 1).toLong
        wantCuts += ((i, s.toLong, st, en))
        s += 1
      }
      off += n
    }
    assert(shards == wantShards.toMap, shards.toString)
    assert(cuts == wantCuts.toSet)
  }

  test("sequenceCuts: no corpus-wide window — the unpartitioned sort only sees bucket totals") {
    val plan = Splits.sequenceCuts(docs, "doc_id",
        size(split(col("text"), " ")), seqLen = 512, chunkDocs = 64)
      .queryExecution.executedPlan.toString
    // the single-partition exchange exists (bucket totals) but the
    // corpus-row side only exchanges on the bucket key
    assert(!plan.contains("CartesianProduct"), plan)
    val single = "Exchange SinglePartition".r.findAllIn(plan).length
    assert(single <= 1, s"more than one single-partition exchange:\n$plan")
  }

  // ---- mixtureSample ----

  test("mixtureSample: deterministic, honors 0 and 100 rates, narrow plan") {
    val all = Splits.mixtureSample(docs, col("lang"),
      concat(col("text"), lit("#mix")), Map("en" -> 100), defaultPct = 0)
    val langs = all.select("lang").distinct().as[String].collect()
    assert(langs.toSet == Set("en")) // default 0 drops everything else
    val nEn = docs.filter(col("lang") === "en").count()
    assert(all.count() == nEn) // rate 100 keeps every en doc
    val half = Splits.mixtureSample(docs, col("lang"),
      concat(col("text"), lit("#mix")), Map.empty, defaultPct = 50)
    assert(half.collect().toSet == half.collect().toSet) // stable re-run
    val plan = half.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixture sampling must not shuffle:\n$plan")
  }

  // ---- clusterAssign ----

  test("clusterAssign: cluster members co-assign; singletons are their own cluster; assignment is the c#-salted hash") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "cluster_id")
    val out = Splits.clusterAssign(df, "doc_id", labels, "cluster_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L)
    assert(out(4L)._1 == 4L) // unlabeled singleton: own cluster
    // leakage safety: every member of cluster 1 gets the SAME split
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1)
    // and the assignment matches the documented c#-salted content hash
    val h = graft.functions.NativeText.polyHash("c#1") % 100
    val expected = if (h < 80) "train" else if (h < 90) "val" else "test"
    assert(out(1L)._2 == expected)
  }

  // ---- temperatureMixture ----

  test("temperatureMixture: alpha=1 keeps everything; alpha=0 equalizes toward n_min; kept shares track n^alpha") {
    val base = docs.select(col("doc_id"), col("lang"), col("text"))
    val n = base.count()
    val all = Splits.temperatureMixture(base, col("lang"),
      concat(col("text"), lit("#t")), alpha = 1.0)
    assert(all.count() == n) // rate_ppm = 1e6 for every domain
    val counts = base.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val nMin = counts.values.min
    val eq = Splits.temperatureMixture(base, col("lang"),
      concat(col("text"), lit("#t")), alpha = 0.0)
    val eqCounts = eq.groupBy("lang").count().as[(String, Long)].collect().toMap
    // alpha=0: every domain's EXPECTED kept count is n_min; the hash
    // gate is binomial around it — at these sizes allow a wide margin,
    // and pin the exact rate arithmetic instead
    eqCounts.foreach { case (l, k) =>
      assert(k <= counts(l), s"$l kept more than it had")
      assert(math.abs(k - nMin) <= math.max(6L, nMin / 2), s"$l: kept $k, n_min $nMin")
    }
    val half = Splits.temperatureMixture(base, col("lang"),
      concat(col("text"), lit("#t")), alpha = 0.5)
    val rates = half.select(col("lang"), col("rate_ppm")).distinct()
      .as[(String, Long)].collect().toMap
    rates.foreach { case (l, ppm) =>
      assert(ppm == math.floor(math.sqrt(nMin.toDouble / counts(l)) * 1e6).toLong,
        s"$l rate mismatch")
    }
    // smallest domain is kept whole
    val minLang = counts.minBy(c => (c._2, c._1))._1
    assert(rates(minLang) == 1000000L)
    // deterministic across runs
    assert(half.collect().toSet == half.collect().toSet)
  }

  test("temperatureMixture: corpus never shuffles — only the domain-count aggregate exchanges, rate join is broadcast") {
    val out = Splits.temperatureMixture(docs, col("lang"),
      concat(col("text"), lit("#t")), alpha = 0.5)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    // exchanges may exist only under the tiny count aggregate (rows =
    // |domains|), never carrying the text column
    val shuffles = p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
    assert(shuffles.forall(l => !l.contains("text#")), p)
  }

  // ---- semanticDedup ----

  private def emb =
    graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))

  test("semanticDedup: planted scaled copies are dropped with the original as keeper") {
    val planted = emb.union(emb.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        graft.functions.VectorFunctions.scale(col("embedding"), 0.5f).as("embedding")))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val out = Dedup.semanticDedup(planted, "vec_id", "embedding", cents,
      threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plantedIds = emb.filter(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect()
    for (orig <- plantedIds)
      assert(out.get(orig + 100000).contains(orig),
        s"copy of $orig not dropped with keeper $orig")
  }

  // ---- quantileBuckets ----

  private def scoredDocs =
    docs.select(col("doc_id"), col("lang"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("q"))

  test("quantileBuckets: banded rank equals the naive global per-stratum window, for any band count") {
    val naive = scoredDocs
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("q").desc, col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
      .select(col("doc_id"), col("rn"),
        when(col("rn") * 3 <= col("n"), "head")
          .when(col("rn") * 3 <= col("n") * 2, "middle")
          .otherwise("tail").as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    for (bands <- Seq(1, 7, 256)) {
      val out = Splits
        .quantileBuckets(scoredDocs, Seq("lang"), col("q"), col("doc_id"), bands)
        .select(col("doc_id"), col("stratum_rank"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(out == naive, s"bands=$bands diverged from the naive per-stratum window")
    }
  }

  test("quantileBuckets: tercile sizes follow the exact rank formula per stratum") {
    val out = Splits.quantileBuckets(scoredDocs, Seq("lang"), col("q"), col("doc_id"))
    val sizes = out.groupBy("lang", "bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ns = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- ns) {
      assert(sizes.getOrElse((lang, "head"), 0L) == n / 3, s"$lang head")
      assert(sizes.getOrElse((lang, "head"), 0L) +
        sizes.getOrElse((lang, "middle"), 0L) == 2 * n / 3, s"$lang head+middle")
    }
  }

  test("quantileBuckets equals pure-Scala ranking on adversarial scores (ties, negatives, out-of-range)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // heavy ties (small discrete pool), exact band-boundary multiples,
    // and scores outside [0, 1] — the banding edges where a monotone-
    // refinement bug would hide
    val genScore: Gen[Double] = Gen.oneOf(
      Gen.oneOf(0.0, 1.0, 0.5, 3.0 / 16, 15.0 / 16, -0.25, 1.75),
      Gen.choose(-2.0, 2.0))
    val genRows: Gen[List[(Long, String, Double)]] = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        st <- Gen.oneOf("A", "B")
        sc <- genScore
      } yield (st, sc))
    } yield rows.zipWithIndex.map { case ((st, sc), i) => (i.toLong, st, sc) }
    val prop = Prop.forAll(genRows) { rows =>
      val df = rows.toDF("id", "st", "score")
      val got = Splits
        .quantileBuckets(df, Seq("st"), col("score"), col("id"), bands = 16)
        .select(col("id"), col("stratum_rank"), col("bucket")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (-r._3, r._1))
        val n = sorted.size
        sorted.zipWithIndex.map { case ((id, _, _), i) =>
          val rn = i + 1L
          val bucket = if (rn * 3 <= n) "head"
            else if (rn * 3 <= 2L * n) "middle" else "tail"
          (id, rn, bucket)
        }
      }.toSet
      val ok = got == want
      if (!ok) println(s"rows=$rows\ngot=$got\nwant=$want")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- dsirLogWeights ----

  private def docsWithSource =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"), col("text"))

  test("dsirLogWeights: identical texts weigh identically; n_tokens is the token count") {
    val planted = docsWithSource.union(
      docsWithSource.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("source"), col("text")))
    val out = Importance.dsirLogWeights(planted, "doc_id", "text",
      col("source") === "src0").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val copies = out.keys.filter(_ >= 100000)
    assert(copies.nonEmpty)
    for (id <- copies)
      assert(out(id) == out(id - 100000), s"copy of ${id - 100000} diverged")
    val toks = docsWithSource.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, nt) <- toks)
      assert(out(id)._2 == nt, s"doc $id n_tokens")
  }

  test("dsirLogWeights: target docs outscore the rest per token (the importance-ratio direction)") {
    val out = Importance.dsirLogWeights(docsWithSource, "doc_id", "text",
      col("source") === "src0")
      .join(docsWithSource.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy((col("source") === "src0").as("tgt"))
      .agg(avg(col("logw_micro").cast("double") / col("n_tokens").cast("double"))
        .as("per_token"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(out(true) > out(false),
      s"target per-token weight ${out(true)} !> raw ${out(false)}")
  }

  test("dsirLogWeights: two corpus scans, broadcast model join, map-side partial per-doc sum") {
    val p = Importance.dsirLogWeights(docsWithSource, "doc_id", "text",
      col("source") === "src0").queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 2,
      s"expected probe + model-build scans only:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    // the only corpus-sized exchange is the per-doc aggregate's
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning(__id")) == 1, p)
  }

  // ---- hashedBigramLogProb ----

  test("hashedBigramLogProb: identical texts score identically; n_bigrams = tokens - 1; short docs drop") {
    val planted = docsWithSource.union(
      docsWithSource.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"), col("source"), col("text")))
      .union(Seq((999999L, "srcX", "solo")).toDF("doc_id", "source", "text"))
    val out = Importance.hashedBigramLogProb(planted, "doc_id", "text",
      col("source") === "src0").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!out.contains(999999L)) // 1 token -> no bigrams -> dropped
    val copies = out.keys.filter(k => k >= 100000 && k < 999999)
    assert(copies.nonEmpty)
    for (id <- copies)
      assert(out(id) == out(id - 100000), s"copy of ${id - 100000} diverged")
    val toks = docsWithSource.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, nt) <- toks if nt >= 2)
      assert(out(id)._1 == nt - 1, s"doc $id n_bigrams")
  }

  test("hashedBigramLogProb: in-domain text outscores out-of-vocabulary gibberish per bigram") {
    // model = the real corpus; score a verbatim model doc vs a doc of
    // tokens that hash to (mostly) never-seen buckets
    val modelDoc = docsWithSource.orderBy("doc_id").select(col("text"))
      .as[String].head()
    val gibberish = (1 to 40).map(i => s"zzqx$i").mkString(" ")
    val probe = Seq((1L, "m", modelDoc), (2L, "g", gibberish))
      .toDF("doc_id", "tag", "text")
    val scored = Importance.hashedBigramLogProb(
      docsWithSource.select((col("doc_id") + 1000000L).as("doc_id"),
        col("source"), col("text"))
        .unionByName(probe.select(col("doc_id"),
          lit("srcP").as("source"), col("text"))),
      "doc_id", "text", isModel = col("source") =!= "srcP")
      .filter(col("doc_id") <= 2L)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) > scored(2L),
      s"model text ${scored(1L)} !> gibberish ${scored(2L)}")
  }

  test("semanticDedup: pair-budget guard trips when one cell swallows the corpus") {
    // a single centroid → every vector lands in one cell → guard fires
    val oneCell = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("cell"), col("embedding").as("centroid"))
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(emb, "vec_id", "embedding", oneCell,
        threshold = 0.95, maxPairsPerCell = 100L)
    }
    assert(e.getMessage.contains("pairs > budget"))
  }

  // ---- tokenBudgetAllocation ----

  test("tokenBudgetAllocation: capped and uncapped domains match a BigInt reference, incl. near-overflow magnitudes") {
    import spark.implicits._
    val rows = Seq(
      ("big", 5000000000000L),  // 5e12 tokens
      ("mid", 40000L),
      ("tiny", 7L))
    val df = rows.toDF("dom", "tk")
    val weights = Map("big" -> 900000L, "mid" -> 99999L, "tiny" -> 1L)
    val budget = 8999999999999L // ~9e12, tr != 0 exercises the split form
    val maxEp = 3
    val out = Splits.tokenBudgetAllocation(df, col("dom"), col("tk"),
        weights, budget, maxEp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    for ((dom, n) <- rows.map(t => (t._1, BigInt(t._2)))) {
      val w = BigInt(weights(dom))
      val target = (w * budget) / 1000000
      val alloc = target.min(n * maxEp)
      val deficit = target - alloc
      val epMilli = (alloc * 1000) / n
      assert(out(dom) == ((n.toLong, target.toLong, alloc.toLong,
        deficit.toLong, epMilli.toLong)),
        s"$dom: got ${out(dom)}, want ($n, $target, $alloc, $deficit, $epMilli)")
    }
  }

  test("tokenBudgetAllocation: zero-token and unweighted domains drop; corpus never shuffles (one count agg, broadcast weights)") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 0L), ("z", 0L), ("unlisted", 5L))
      .toDF("dom", "tk")
    val out = Splits.tokenBudgetAllocation(df, col("dom"), col("tk"),
      Map("a" -> 500000L, "z" -> 500000L), totalBudget = 100L, maxEpochs = 2)
    assert(out.select("domain").as[String].collect().toSeq == Seq("a"))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_sum"), p)
  }

  // ---- review-fix regressions ----

  test("temperatureMixture: a null-domain group neither defines n_min nor appears in the output") {
    val rows = Seq(
      ("a", "t1"), ("a", "t2"), ("a", "t3"), ("a", "t4"),
      ("b", "t5"),
      (null.asInstanceOf[String], "t6")) // singleton null group
      .toDF("dom", "text")
    val out = Splits.temperatureMixture(rows, col("dom"), col("text"), alpha = 0.0)
    // alpha = 0 equalizes toward n_min; n_min must be |b| = 1, not the
    // null group's 1-row count pretending to be a domain. Domain b
    // (the true smallest) keeps rate 1e6 — kept whole.
    val rates = out.select(col("dom"), col("rate_ppm")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!rates.contains(null), "null-domain rows must drop")
    assert(rates.get("b").forall(_ == 1000000L), rates.toString)
  }

  test("quantileBuckets: null stratum and null score rows rank instead of vanishing") {
    val rows = Seq(
      (1L, "en", 0.9), (2L, "en", 0.5), (3L, "en", 0.1),
      (4L, null.asInstanceOf[String], 0.7),           // null stratum
      (5L, "en", Double.NaN))                          // NaN floors to null band? no - NaN banding
      .toDF("id", "lang", "score")
      .withColumn("score", when(col("id") === 5L, lit(null).cast("double"))
        .otherwise(col("score")))                      // make row 5 a true null score
    val out = Splits.quantileBuckets(rows, Seq("lang"), col("score"),
      tieBreak = col("id"), bands = 4)
    assert(out.count() == 5, "null stratum/score rows must not be dropped")
    val en = out.filter(col("lang") === "en")
      .select(col("id"), col("stratum_rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null score ranks LAST in its stratum (desc = nulls last), like
    // the naive window
    assert(en(5L) == 4L, en.toString)
    assert(en(1L) == 1L && en(2L) == 2L && en(3L) == 3L, en.toString)
  }

  test("shuffleShards: every shard's positions are contiguous 1..n, assignment is deterministic, duplicate texts break ties by id") {
    val base = docs
    val dup = base.filter(col("doc_id") < 3)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text"))
    val corpus = base.union(dup)
    val out = Splits.shuffleShards(corpus, "doc_id", col("text"), nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == corpus.count())
    // shards in range, positions contiguous from 1 within each shard
    out.foreach { case (_, s, _) => assert(s >= 0 && s < 4) }
    out.groupBy(_._2).foreach { case (s, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (1L to rows.length.toLong), s"shard $s positions $ps")
    }
    // duplicate-content rows share a hash, land in the same shard, and
    // sit at ADJACENT positions ordered by id (the tie-break)
    val byId = out.map(t => t._1 -> ((t._2, t._3))).toMap
    dup.select("doc_id").collect().map(_.getLong(0)).foreach { did =>
      val (ds, dp) = byId(did)
      val (os, op) = byId(did - 1000000L)
      assert(ds == os, s"dup $did landed in shard $ds, original in $os")
      assert(op == dp - 1, s"dup $did at pos $dp, original at $op — id tie-break broken")
    }
    // deterministic: a second run returns the identical assignment
    val again = Splits.shuffleShards(corpus, "doc_id", col("text"), nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
  }

  test("shuffleShards: the only exchange is the shard-keyed one — no global sort, no single-partition window") {
    val plan = Splits.shuffleShards(docs, "doc_id", col("text"), nShards = 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly 1 exchange:\n$plan")
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("assign and shard reject degenerate parameters") {
    intercept[IllegalArgumentException] {
      Splits.assign(col("x"), trainPct = 80, valPct = 30)
    }
    intercept[IllegalArgumentException] {
      Splits.assign(col("x"), trainPct = 120, valPct = 0)
    }
    intercept[IllegalArgumentException] { Splits.shard(col("x"), 0) }
  }
}
