package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Deduplication operators for training-data pipelines, each designed
  * around ONE bounded shuffle rather than any n² comparison:
  *
  *  - exact:        shuffle on the content key, keep min-id per group.
  *  - MinHash+LSH:  per-row signature (narrow) → explode to `bands` rows
  *                  → shuffle on band key → pairs only within buckets →
  *                  exact Jaccard verify. Candidate count is governed by
  *                  the (bands, rowsPerBand) S-curve, not by corpus size².
  *  - SimHash:      per-row 61-bit signature (narrow) → 4-chunk banding
  *                  (pigeonhole: hamming ≤ 3 ⇒ some 16-bit chunk equal) →
  *                  hamming verify within buckets.
  *  - n-gram Jaccard: exact pairwise, but only within caller-supplied
  *                  blocking keys (never global n²).
  *  - embedding:    cosine near-dup via random-hyperplane LSH buckets.
  *
  * At 100 TB the explode factors are constants (bands, chunks) and every
  * join key is a hash bucket — skew shows up only if one bucket is hot,
  * which AQE skew-join handles.
  */
object Dedup {

  /** Exact dedup: one surviving row id per distinct value of `key`
    * (deterministically the smallest), plus the duplicate count. */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash-LSH near-duplicate pairs.
    *
    * Plan shape (each stage computes its inputs exactly once per row):
    *  1. text → shingle hashes → signature → band keys is ONE
    *     let-bound expression ([[graft.functions.TextFunctions.minHashBandKeys]]),
    *     so the shingle hashing runs once per row — not once per hash
    *     function (Spark HOFs are interpreted without subexpression
    *     elimination, and CollapseProject re-inlines single-use
    *     projection columns, so multi-projection staging does NOT
    *     guarantee this);
    *  2. the band explode and self-join carry ONLY (band, band_key, id) —
    *     no arrays ride the exchange;
    *  3. candidate pairs are made distinct FIRST, then `sh` is joined
    *     back once per side for a single Jaccard verify per pair.
    *
    * @return (doc_a, doc_b, jaccard) with doc_a < doc_b and verified
    *         shingle-set Jaccard ≥ `threshold`.
    */
  def minHashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val withSh = docs.select(
      col(idCol).as("id"),
      shingleHashes(col(textCol), shingleK).as("sh"))
    // One row per (doc, band): band key = ordered poly-fold of the band's
    // signature slice, computed by the single-pass single-expression
    // pipeline in [[minHashBandKeys]]. Ids only — the shuffle payload is
    // 3 scalars.
    val banded = docs.select(col(idCol).as("id"), posexplode(
      minHashBandKeys(col(textCol), shingleK, numHashes, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    val l = banded.select(col("band"), col("band_key"), col("id").as("doc_a"))
    val r = banded.select(col("band"), col("band_key"), col("id").as("doc_b"))
    val pairs = l.join(r, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    pairs
      .join(withSh.select(col("id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(withSh.select(col("id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        jaccardShingles(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate pairs: hamming(sig_a, sig_b) ≤ maxHamming,
    * candidates found by exact match on one of four 16-bit chunks
    * (pigeonhole-complete for maxHamming ≤ 3). */
  def simHashDup(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = docs.select(col(idCol).as("id"),
      simHash(col(textCol)).as("sig"))
    val chunked = sig.select(col("id"), col("sig"), posexplode(
      array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_key")
    val l = chunked.select(col("chunk"), col("chunk_key"),
      col("id").as("doc_a"), col("sig").as("sig_a"))
    val r = chunked.select(col("chunk"), col("chunk_key"),
      col("id").as("doc_b"), col("sig").as("sig_b"))
    l.join(r, Seq("chunk", "chunk_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      // hamming is two ALU ops — filter BEFORE the distinct so the
      // dedup shuffle carries only surviving near-dup pairs, not every
      // chunk-collision candidate (identical rows: hamming is a
      // function of the pair)
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact pairwise n-gram Jaccard within blocking groups. Emits every
    * in-block pair with its similarity (callers filter by threshold).
    * The blocking columns bound the pair count — never call unblocked. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], n: Int = 3): DataFrame = {
    val withSh = docs.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+
        shingleHashes(col(textCol), n).as("sh")): _*)
    val l = withSh.select(
      (blockCols.map(col) :+ col("id").as("doc_a") :+ col("sh").as("sh_a")): _*)
    val r = withSh.select(
      (blockCols.map(col) :+ col("id").as("doc_b") :+ col("sh").as("sh_b")): _*)
    l.join(r, blockCols)
      .filter(col("doc_a") < col("doc_b"))
      .select((blockCols.map(col) :+ col("doc_a") :+ col("doc_b") :+
        jaccardShingles(col("sh_a"), col("sh_b")).as("jaccard")): _*)
  }

  /** Connected components over a near-duplicate pair list: every doc
    * gets its cluster's minimum doc id as `cluster_id` (the canonical
    * "keeper"), turning pairwise dedup output into per-cluster keep/drop
    * decisions — the step after [[minHashLsh]]/[[simHashDup]] in a real
    * pipeline.
    *
    * Iterative min-label propagation: labels flow along edges until
    * fixpoint; iterations = component diameter (near-dup clusters are
    * shallow — duplicates of a common source — so this is a handful of
    * bounded shuffles, each keyed on doc id). Lineage is truncated per
    * iteration (`localCheckpoint`), the standard guard against plan
    * blow-up in iterative Spark. Isolated docs (no edges) are not
    * emitted; callers left-join and coalesce to self. */
  def clusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .localCheckpoint()
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("cluster_id"))).collect()(0).getLong(0)
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    // Labels only ever DECREASE (min propagation), so Σ(cluster_id)
    // strictly decreases on any change — a single cheap aggregate over
    // the just-materialized labels replaces a per-iteration change join.
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val prop = edges
        .join(labels, edges("b") === labels("doc_id"))
        .select(col("a").as("doc_id"), col("cluster_id"))
        .union(labels)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      val s = labelSum(prop)
      converged = s == prevSum
      prevSum = s
      labels = prop
    }
    labels
  }

  /** Embedding near-duplicates: pairs with cosine ≥ threshold, candidates
    * restricted to equal random-hyperplane LSH buckets (collision prob.
    * for cosine ≥ 0.95 with 8 planes ≈ (1 - 0.102)^8 ≈ 0.42 per table;
    * production would multi-probe — the bucket-join shape is the point). */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 8, dim: Int = 64, threshold: Double = 0.95): DataFrame = {
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorFunctions.lshSignature(col(vecCol), nPlanes, dim).as("bucket"))
    val l = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
