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

  test("dd2 band self-join on a hot bucket: AQE splits the skewed partition and answers stay exact") {
    // 600 identical docs → one shingle set → 8 hot (band, band_key)
    // buckets; 150 distinct docs spread thin. At production scale the
    // same shape is hot-URL / boilerplate duplication. (minHashLsh bands
    // per document, so the hot bucket reaches the join — the shape AQE
    // must rescue; simHashDup compacts it away first, tested below.)
    val hotN = 600
    val hot = (0 until hotN).map(i =>
      (i.toLong, "the same hot boilerplate document body repeated verbatim across the corpus"))
    val unique = (0 until 150).map(i =>
      (10000L + i, s"unique document $i " + (1 to 10).map(j => s"tok${i * 31 + j}").mkString(" ")))
    val docs = (hot ++ unique).toDF("doc_id", "text")

    withConf(
      // force the at-scale join shape: no broadcast escape hatch
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // scale skew detection down to test data volume
      // test-scale shuffles are a few KB after compression — production
      // defaults (256MB/64MB) shrink proportionally
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      // the band join feeds a distinct() exchange; allow the split anyway
      // (the extra shuffle exists regardless of the split)
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"
    ) {
      val out = Dedup.minHashLsh(docs, "doc_id", "text",
        shingleK = 3, numHashes = 32, bands = 8, threshold = 0.5)
      out.queryExecution.toRdd.count() // materialize → finalize adaptive plan
      val finalPlan = out.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), s"no skew split in final plan:\n$finalPlan")
      // exactness under the split: every hot pair (jaccard 1) survives once
      val hotPairs = out.filter(col("doc_a") < hotN && col("doc_b") < hotN).count()
      assert(hotPairs == hotN.toLong * (hotN - 1) / 2)
    }
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
