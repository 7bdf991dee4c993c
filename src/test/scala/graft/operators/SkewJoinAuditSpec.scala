package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The dedup docstrings claim "skew shows up only if one bucket is hot,
  * which AQE skew-join handles" — this suite turns that claim into a
  * failing test. It (a) pins the session confs the claim depends on,
  * (b) runs the dd2 band self-join on a deliberately hot-bucket corpus
  * with skew thresholds scaled down to test size, asserting the final
  * adaptive plan actually split the skewed partition (`skew=true`) AND
  * the answer stayed exact, and (c) proves the dd3 path no longer NEEDS
  * the skew split for identical-content clusters: signature-identical
  * compaction collapses the hot cluster to one banded row. */
class SkewJoinAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE + skew-join are enabled in the session (the confs the dedup docstrings rely on)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled").toBoolean)
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled").toBoolean)
  }

  /** The round-9 per-document minHashLsh formulation, kept as the
    * equivalence reference: text-identical compaction must be a pure
    * plan transformation — same pairs, same jaccards, any corpus. */
  private def perDocLsh(docs: org.apache.spark.sql.DataFrame,
      k: Int, nh: Int, bands: Int, thr: Double): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions._
    val withSh = docs.select(col("doc_id").as("id"),
      shingleHashes(col("text"), k).as("sh"))
    val banded = docs.select(col("doc_id").as("id"),
      posexplode(minHashBandKeys(col("text"), k, nh, bands)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val pairs = banded.select(col("band"), col("band_key"), col("id").as("doc_a"))
      .join(banded.select(col("band"), col("band_key"), col("id").as("doc_b")),
        Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    pairs
      .join(withSh.select(col("id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(withSh.select(col("id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccardShingles(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= thr)
  }

  test("dd2 band self-join on a hot bucket: AQE splits the skewed partition and answers stay exact") {
    // 600 NEAR-identical but DISTINCT docs (shared 40-token body, one
    // unique token appended) → most band keys agree → hot
    // (band, band_key) buckets that text-identical compaction cannot
    // collapse (the texts are distinct); 150 unrelated docs spread
    // thin. At production scale the same shape is boilerplate with
    // per-page noise — the band join's residual skew, which AQE must
    // rescue. (Verbatim-identical clusters no longer reach the join at
    // all — compacted away, tested below.)
    val hotN = 600
    val body = (1 to 40).map(j => s"body$j").mkString(" ")
    val hot = (0 until hotN).map(i => (i.toLong, s"$body uniq$i"))
    val unique = (0 until 150).map(i =>
      (10000L + i, s"unique document $i " + (1 to 10).map(j => s"tok${i * 31 + j}").mkString(" ")))
    val docs = (hot ++ unique).toDF("doc_id", "text")

    withConf(
      // force the at-scale join shape: no broadcast escape hatch
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale skew detection down to test data volume
      // test-scale shuffles are a few KB after compression — production
      // defaults (256MB/64MB) shrink proportionally. 32 shuffle
      // partitions so the handful of hot band buckets isolate against a
      // tiny-median background (at 4, the 8 hot buckets spread evenly
      // and no partition exceeds 1.2x the median — the same reason
      // production skew detection needs partitions >> hot keys)
      "spark.sql.shuffle.partitions" -> "32",
      // keep the map side multi-task: the band join's map stage is the
      // distinct aggregate (itself a shuffle-read), and at test volume
      // AQE coalesces it to ONE task — a single mapper block cannot be
      // subdivided by the skew splitter (it splits by mapper ranges).
      // At production scale partitions exceed minPartitionSize (1MB)
      // and this never collapses; disabling reproduces that layout.
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      // the band join feeds a distinct() exchange; allow the split anyway
      // (the extra shuffle exists regardless of the split)
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"
    ) {
      val out = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5)
      out.queryExecution.toRdd.count() // materialize → finalize adaptive plan
      val finalPlan = out.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"no skew split in final plan:\n$finalPlan")
      // exactness under the split: bit-identical to the per-document
      // round-9 formulation (LSH recall on near-identical-but-distinct
      // texts is data-dependent, so the reference is the old plan run
      // on the same corpus, not a combinatorial count)
      val got = out.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = perDocLsh(docs, 3, 32, 8, 0.5).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want,
        s"compacted != per-doc: only-got ${(got -- want).take(5)}, " +
          s"only-want ${(want -- got).take(5)}")
      assert(got.size >= hotN.toLong * (hotN - 1) / 2 * 9 / 10,
        s"expected ~C(600,2) hot pairs, got ${got.size}")
    }
  }

  test("dd2 text-identical compaction: a verbatim cluster bands as ONE row, pairs stay exact") {
    // The old hot corpus: 600 VERBATIM-identical docs. Before
    // compaction they put ~180k candidate pairs into each of 8 band
    // buckets; after, the band volume sees one row per DISTINCT text,
    // the hottest bucket is bounded by distinct-text collisions only,
    // and the cluster's C(600,2) jaccard-1 pairs are emitted from group
    // membership instead of the join.
    val hotN = 600
    val hot = (0 until hotN).map(i =>
      (i.toLong, "the same hot boilerplate document body repeated verbatim across the corpus"))
    val unique = (0 until 150).map(i =>
      (10000L + i, s"unique document $i " + (1 to 10).map(j => s"tok${i * 31 + j}").mkString(" ")))
    val docs = (hot ++ unique).toDF("doc_id", "text")
    val nDistinctTexts = docs.select(col("text")).distinct().count()
    val vol = Dedup.minHashBandVolume(docs, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 8)
    assert(vol.maxBlock <= nDistinctTexts,
      s"max bucket ${vol.maxBlock} exceeds distinct texts $nDistinctTexts")
    assert(vol.maxBlock < hotN / 10,
      s"compaction should keep buckets far below the 600-doc cluster, got ${vol.maxBlock}")
    // exactness through membership expansion: all C(600,2) jaccard-1
    // pairs of the cluster are still emitted, exactly once, and the
    // full output matches the per-document reference formulation
    val out = Dedup.minHashLsh(docs, "doc_id", "text",
      shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5)
    val hotPairs = out.filter(col("doc_a") < hotN && col("doc_b") < hotN)
    assert(hotPairs.count() == hotN.toLong * (hotN - 1) / 2)
    assert(hotPairs.select(col("doc_a"), col("doc_b")).distinct().count()
      == hotN.toLong * (hotN - 1) / 2)
    val got = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = perDocLsh(docs, 3, 32, 8, 0.5).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
  }

  test("dd3 signature-identical compaction: a hot identical cluster bands as ONE row, pairs stay exact") {
    // The same hot-cluster corpus: before compaction the 600 identical
    // docs put ~180k candidate pairs in each of 20 band buckets; after,
    // the band volume sees one row per DISTINCT signature, so the
    // hottest bucket is bounded by distinct-signature collisions only.
    val hotN = 600
    val hot = (0 until hotN).map(i =>
      (i.toLong, "the same hot boilerplate document body repeated verbatim across the corpus"))
    val unique = (0 until 150).map(i =>
      (10000L + i, s"unique document $i " + (1 to 10).map(j => s"tok${i * 31 + j}").mkString(" ")))
    val docs = (hot ++ unique).toDF("doc_id", "text")
    val nDistinctSigs = docs
      .select(graft.functions.TextFunctions.simHash(col("text")).as("sig"))
      .distinct().count()
    val vol = Dedup.simHashBandVolume(docs, "doc_id", "text", maxHamming = 3)
    // every banded bucket holds distinct signatures, never cluster copies
    assert(vol.maxBlock <= nDistinctSigs,
      s"max bucket ${vol.maxBlock} exceeds distinct signatures $nDistinctSigs")
    assert(vol.maxBlock < hotN / 10,
      s"compaction should keep buckets far below the 600-doc cluster, got ${vol.maxBlock}")
    // exactness through membership expansion: all C(600,2) hamming-0
    // pairs of the cluster are still emitted, exactly once
    val out = Dedup.simHashDup(docs, "doc_id", "text", maxHamming = 3)
    val hotPairs = out.filter(col("doc_a") < hotN && col("doc_b") < hotN)
    assert(hotPairs.count() == hotN.toLong * (hotN - 1) / 2)
    assert(hotPairs.select(col("doc_a"), col("doc_b")).distinct().count()
      == hotN.toLong * (hotN - 1) / 2)
  }
}
