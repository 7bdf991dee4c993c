package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two strategies with the same output shape (query_id, neighbor_id,
  * cosine, rank):
  *
  *  - [[bruteForceTopK]]: query-set × corpus with a broadcast of the
  *    (small) query side — exact, the correctness baseline. Cost is
  *    |Q|·|corpus| cosines, embarrassingly parallel over corpus
  *    partitions; right up to millions of corpus rows per executor core.
  *  - [[lshTopK]]: random-hyperplane bucketing on both sides; only equal
  *    buckets are compared. At 100 TB this is the one you run: the
  *    shuffle is on bucket keys, comparisons per query drop by ~2^planes,
  *    recall traded via the plane count (multi-probe extends it).
  *
  * Both rank in TWO phases: a per-partition bounded heap keeps only the
  * local top-k per query (O(k) memory, no sort), then the global rank
  * runs over ≤ k·partitions survivors per query. The candidate volume
  * never reaches a sort — the plan that survives |corpus| growing 100×.
  * Ranking ties break by neighbor id, so results are fully deterministic.
  */
object Similarity {

  /** Phase 1: per-partition top-k per query via bounded heaps (heap head
    * = the worst kept candidate under (cosine desc, neighbor_id asc)).
    * The heap phase encodes ids as longs, so it only runs for integral
    * id columns (where the cast is lossless and the tie-break order is
    * the id order); [[rankTopK]] checks and skips it otherwise. */
  private def partitionTopK(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    val typed = scored.select(
      col("query_id").cast("long"), col("neighbor_id").cast("long"),
      col("cosine").cast("double"))
      .as[(Long, Long, Double)](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble))
    // worst-first ordering: smaller cosine, then larger id, is "greater"
    val worstFirst: Ordering[(Long, Double)] =
      Ordering.by[(Long, Double), (Double, Long)](t => (-t._2, t._1))
    val pruned = typed.mapPartitions { it =>
      val heaps = mutable.Map.empty[Long, mutable.PriorityQueue[(Long, Double)]]
      it.foreach { case (q, n, c) =>
        val h = heaps.getOrElseUpdate(q, mutable.PriorityQueue.empty(worstFirst))
        h.enqueue((n, c))
        if (h.size > k) h.dequeue()
      }
      heaps.iterator.flatMap { case (q, h) => h.iterator.map(t => (q, t._1, t._2)) }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble))
    pruned.toDF("query_id", "neighbor_id", "cosine")
  }

  /** Phase 2: exact global rank over the pruned survivors. Non-integral
    * id columns (strings, uuids, …) skip the heap phase — the rank alone
    * is still correct for any id type, just without the pre-prune. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val integralIds = Seq("query_id", "neighbor_id").forall { n =>
      scored.schema(n).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    // A zero-norm vector scores cosine = 0/0 = NaN. Drop those
    // candidates up front: similarity to a zero vector is undefined,
    // and the two phases would otherwise DISAGREE on it — the Scala
    // heap's total order treats NaN as largest (evicted first, never
    // ranked) while Spark's desc sort ranks NaN before every real
    // cosine — making top-k depend on the id type. One rule, both
    // paths: NaN never ranks.
    val defined = scored.filter(!isnan(col("cosine")))
    val pruned = if (integralIds) partitionTopK(defined, k) else defined
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    pruned
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most similar corpus vectors with a DIFFERENT label — the
    * near-boundary negatives that carry the contrastive gradient
    * (in-batch random negatives are overwhelmingly easy). Same
    * broadcast-query scan and two-phase bounded-heap rank as
    * [[bruteForceTopK]]; the label-mismatch predicate sits in the join
    * condition, so positive pairs are never even scored. Rows with a
    * null label match nothing (SQL `<>` semantics) — a label-less
    * vector can't be certified negative. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      col(labelCol).as("n_label"))
    val scored = broadcast(q).join(c,
        col("query_id") =!= col("neighbor_id") &&
          col("q_label") =!= col("n_label"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into `nCells`
    * coarse cells by nearest-centroid assignment; each query probes only
    * its `nProbe` nearest cells. Centroid "training" is a deterministic
    * stub — the first `nCells` corpus vectors — so every engine (and the
    * DuckDB oracle) reproduces the cells bit-for-bit; production swaps
    * in k-means centroids and nothing else changes. The shape is what
    * scales: centroids broadcast, the candidate join shuffles on the
    * cell id, and per-query work drops by ~nProbe/nCells. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCells: Int = 8, nProbe: Int = 2): DataFrame = {
    val (cells, probes) =
      ivfAssign(queries, corpus, idCol, vecCol, nCells, nProbe)
    val scored = probes.join(cells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Shared IVF machinery ([[ivfTopK]], [[ivfSq8TopK]]): deterministic
    * stub centroids (the first `nCells` corpus vectors — production
    * swaps in k-means centroids and nothing else changes), full-
    * precision argmax cell assignment, and per-query top-`nProbe` cell
    * probes. Returns (cells = (cell, neighbor_id, cv),
    * probes = (cell, query_id, qv)). */
  private def ivfAssign(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, nCells: Int,
      nProbe: Int): (DataFrame, DataFrame) = {
    // embedding IS NOT NULL pinned on the centroid derivation (r21 —
    // the r20 advisory): the pl13/pl15 serve path and pl13's oracle
    // cents CTE already exclude null embeddings, and this stub must
    // agree with them (and with sim3Sql/sim8's now-pinned CTEs) so a
    // null vector among the first nCells ids can never make the family
    // diverge. Synthetic embeddings are never null, so results are
    // unchanged — this pins the contract, not a behavior change.
    val cents = corpus.filter(col(idCol) < nCells && col(vecCol).isNotNull)
      .select(col(idCol).as("cell"), col(vecCol).as("centroid"))
    val assigned = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("cv"), col("centroid")))
    // argmax centroid per vector as a grouped max_by — a hash aggregate
    // with map-side partials, NOT a row_number window: a window would
    // shuffle AND SORT the nCells×corpus intermediate, the aggregate
    // only shuffles partial maxima. The sort key (sim, -cell) is unique
    // per row, so ties break deterministically by smallest cell — the
    // same order the previous window form used.
    val argmaxKey = struct(col("sim"), -col("cell"))
    val cells = assigned.groupBy(col("neighbor_id"))
      .agg(max_by(col("cell"), argmaxKey).as("cell"),
        max_by(col("cv"), argmaxKey).as("cv"))
      .select(col("cell"), col("neighbor_id"), col("cv"))
    val probes = probeCells(queries, cents, idCol, vecCol, nProbe)
    (cells, probes)
  }

  /** Per-query top-`nProbe` probe cells against a broadcast centroid
    * set — shared by [[ivfAssign]] (build+serve in one plan) and
    * [[ivfTopKServe]] (serve against a PREBUILT index): nCells rows
    * fold into one sorted array per query (bounded by nCells), then
    * explode ≤ nProbe. Returns (cell, query_id, qv). */
  private def probeCells(queries: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String, nProbe: Int): DataFrame = {
    val argmaxKey = struct(col("sim"), -col("cell"))
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", cosine(col("qv"), col("centroid")))
      .groupBy(col("query_id"))
      .agg(max_by(col("qv"), argmaxKey).as("qv"),
        slice(array_sort(collect_list(struct((-col("sim")).as("neg_sim"),
          col("cell")))), 1, nProbe).as("cands"))
      .select(col("query_id"), col("qv"), explode(col("cands")).as("cand"))
      .select(col("cand.cell").as("cell"), col("query_id"), col("qv"))
  }

  /** Serve exact-cosine top-k from a PREBUILT IVF index — the
    * build-once/serve-many split [[ivfTopK]] fuses into one plan:
    * `index` is the materialized (cell, neighbor_id, cv) assignment
    * table (at 100 TB: a cell-partitioned parquet/lakehouse table a
    * streaming ingest appends to — see
    * [[graft.streaming.StreamingRun.ivfCellIngest]]'s census twin),
    * `centroids` the (cell, centroid) coarse layer the ingest
    * broadcast. Per query: top-`nProbe` cells against the broadcast
    * centroids, then ONE shuffle on cell id into the index and the
    * shared NaN-safe rank. Serving equals [[ivfTopK]] exactly when the
    * index equals the batch argmax assignment — which is the pl15
    * row's claim about the stream-built index. */
  def ivfTopKServe(queries: DataFrame, index: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 2): DataFrame = {
    val probes = probeCells(queries, centroids, idCol, vecCol, nProbe)
    val scored = probes.join(index, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** IVF × SQ8 — the production ANN combination: coarse cells bound the
    * candidate set (per-query work drops by ~nProbe/nCells, exactly
    * [[ivfTopK]]'s trade) while the within-cell scan reads int8 codes
    * (4× smaller, integer math, exactly [[sq8TopK]]'s trade), and the
    * exact-cosine re-rank recovers precision for the top `rerank`
    * survivors. Cell assignment and probe selection run full-precision
    * (that is build-time/query-side work, not the corpus scan). The
    * composition changes neither phase — the point made on
    * [[sq8TopK]]'s scaladoc, here as a tested operator. */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int = 8, nProbe: Int = 2,
      rerank: Int = 32): DataFrame = {
    require(k > 0, "k must be positive")
    require(rerank >= k, "rerank must be >= k")
    val (cells, probes) =
      ivfAssign(queries, corpus, idCol, vecCol, nCells, nProbe)
    val c8 = cells.select(col("cell"), col("neighbor_id"), q8(col("cv")).as("cq"))
    val p8 = probes.select(col("cell"), col("query_id"), q8(col("qv")).as("qq"))
    val iscore = aggregate(
      zip_with(col("qq"), col("cq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    // each corpus vector lives in exactly one cell, so a (query,
    // neighbor) candidate pair is reachable through at most one probe —
    // no dedup needed before the rank
    val cands = rankTopK(
      p8.join(c8, Seq("cell"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          iscore.cast("double").as("cosine")), rerank)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(cands, queries, corpus, idCol, vecCol, k)
  }

  /** Scalar-quantized (SQ8) ANN with full-precision re-rank — the
    * memory-bound scale path. Every vector is quantized once to int8
    * codes (`floor(x·127)` clamped to ±127 — exact, engine-neutral
    * integer math); the scan phase ranks candidates by the INTEGER dot
    * product of the codes and keeps the top `rerank` per query through
    * the same two-phase bounded-heap rank as [[bruteForceTopK]]; the
    * re-rank phase fetches full-precision vectors for those ≤
    * |Q|·rerank survivors only and emits the exact-cosine top-k.
    *
    * Why this is the 100 TB shape: the corpus-sized scan reads 1 byte
    * per dimension instead of 4 (the codes are what a production table
    * stores — a 4× smaller scan column, integer-SIMD scoring), while
    * the float vectors are touched only for the candidate set, through
    * a broadcast join the corpus streams past. Quantization loses
    * ranking resolution, not determinism: every engine computes the
    * same codes and the same integer scores, so the candidate set is
    * bit-reproducible (ties break by neighbor id) and the final
    * ordering is the exact cosine. Recall is tuned by `rerank`, the
    * same knob/cost trade as [[ivfTopK]]'s nProbe; composing SQ8 codes
    * inside IVF cells is the production combination and changes neither
    * phase. No reference analog (arcon has no vector ops) — Spark-first
    * design throughout.
    *
    * @return (query_id, neighbor_id, cosine, rank) — exact cosine over
    *         the quantized-scan candidates, rank ≤ k.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, rerank: Int = 32): DataFrame = {
    require(k > 0, "k must be positive")
    require(rerank >= k, "rerank must be >= k")
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), q8(col(vecCol)).as("qq"))
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), q8(col(vecCol)).as("cq"))
    // integer dot product: per-term |x| ≤ 127² and real dims keep the
    // sum far under 2^53, so the double cast into the shared ranking
    // machinery is lossless
    val iscore = aggregate(
      zip_with(col("qq"), col("cq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val cands = rankTopK(
      broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          iscore.cast("double").as("cosine")), rerank)
      .select(col("query_id"), col("neighbor_id"))
    rerankExact(cands, queries, corpus, idCol, vecCol, k)
  }

  /** Exact int8 quantization: float→double widening is exact, the
    * double product rounds identically under IEEE-754 on every engine,
    * floor+clamp land in [-127, 127]. Shared by [[sq8TopK]] and
    * [[ivfSq8TopK]]. */
  private def q8(v: Column): Column =
    transform(v, x => greatest(lit(-127L),
      least(lit(127L), floor(x.cast("double") * lit(127)))))

  /** The full-precision re-rank phase shared by the quantized scans:
    * the ≤ |Q|·rerank candidate pairs broadcast (with their query
    * vectors), the corpus streams past to supply neighbor vectors, and
    * the exact-cosine top-k ranks. */
  private def rerankExact(cands: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val fullQ = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val fullC = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = broadcast(cands.join(fullQ, Seq("query_id")))
      .join(fullC, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }

  /** Approximate k-NN GRAPH over the whole corpus — every vector is
    * simultaneously a query and a candidate, the primitive under
    * graph-based curation (SemDeDup-style cluster pruning, diversity
    * sampling, graph-connectivity dedup all start from this edge list).
    *
    * Differs from [[lshTopK]] in the one way that matters at 100 TB:
    * there is NO small query side to broadcast. Both roles stream
    * through the SAME bucket exchange — the self-join shuffles the
    * corpus once per side on the bucket key, per-bucket work is
    * quadratic in bucket population (the LSH contract: ~2^planes
    * reduction vs all-pairs), and the per-partition bounded heap holds
    * k entries per DISTINCT query id in the partition (memory O(k ×
    * queries-per-partition), never the candidate volume). `multiProbe`
    * extends recall by probing all 1-bit-flip buckets on the query
    * role only — a hamming-≤1 edge is reachable through exactly one
    * probe, so no dedup is needed.
    *
    * Edges are DIRECTED (a → its top-k list); `mutual` marks edges
    * whose reverse also survived — the mutual-kNN subgraph is the
    * standard robust-clustering reduction (an edge-keyed self-join of
    * the top-k output against its reversal, edge-list-sized, nothing
    * corpus-sized moves). No reference analog (arcon has no vector
    * ops); Spark-first throughout.
    *
    * Fail-loud scale contract (the same pair-budget discipline as
    * [[Dedup.ngramJaccardPairs]]/[[Dedup.prefixJaccardPairs]]/
    * [[Dedup.semanticDedup]]): before the self-join runs, the exact
    * candidate volume it would generate ([[knnGraphBucketVolume]] — one
    * cheap aggregate over the signature table, no vector math) is
    * checked against `maxCandidatePairs`. A skewed or under-planed
    * corpus aborts with the hottest bucket's size instead of silently
    * running the per-bucket quadratic; remedies in the message:
    * [[suggestedPlanes]] (more planes = more buckets), upstream cluster
    * compaction ([[Dedup.semanticDedup]]/[[Dedup.embeddingDup]] — on
    * clustered data the hottest bucket tracks the biggest cluster no
    * matter how many planes), or an explicit larger budget.
    * `maxCandidatePairs = Long.MaxValue` skips the pre-pass.
    *
    * BEHAVIOR CHANGE (r16): the pair-budget guard is NEW and ON BY
    * DEFAULT — a call that previously ran (however slowly) on a large,
    * skewed, or under-planed corpus now throws IllegalArgumentException
    * once its exact candidate volume exceeds the 10M-pair default
    * budget. This is deliberate fail-loud (the silent alternative is an
    * unbounded per-bucket quadratic); existing callers that accept the
    * cost must opt out with `maxCandidatePairs = Long.MaxValue` or pass
    * their own budget. The guard does NOT rescan the corpus: one
    * checkpointed (id, vector, signature) projection feeds the volume
    * aggregate AND both sides of the bucket self-join, so the signature
    * expression evaluates once per row with or without the guard.
    *
    * @return (src_id, dst_id, cosine, rank, mutual), rank ≤ k per src.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64,
      multiProbe: Boolean = true,
      maxCandidatePairs: Long = 10000000L,
      reliable: Boolean = false): DataFrame = {
    // the [[Dedup.clusters]] staging trade: localCheckpoint truncates
    // lineage into executor-local blocks (fast, but a lost executor
    // loses an unrecomputable partition — acceptable for bounded
    // re-runnable jobs); `reliable = true` stages the two
    // materializations here through the reliable checkpoint directory
    // for long multi-TB runs
    def stage(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val (exact, _) = bucketExprs(vecCol, nPlanes, dim, multiProbe)
    // ONE corpus scan + signature eval, shared by the guard's volume
    // aggregate and both roles of the self-join below
    val signed = stage(corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        exact.as("__sig")))
    def probedSig = probedBuckets(col("__sig"), nPlanes, multiProbe)
    if (maxCandidatePairs < Long.MaxValue) {
      val v = Dedup.crossBlockVolume(
        signed.select(probedSig.as("bucket")),
        signed.select(col("__sig").as("bucket")), Seq("bucket"))
      if (v.totalPairs > maxCandidatePairs)
        throw new IllegalArgumentException(
          s"knnGraph: bucket self-join would generate ${v.totalPairs} " +
            s"candidate pairs > budget $maxCandidatePairs (hottest bucket " +
            s"${v.maxBlock} probe×member pairs of ${v.nBlocks} buckets). " +
            "Raise nPlanes (suggestedPlanes keeps bucket count growing " +
            "with the corpus), compact dominant clusters upstream " +
            "(semanticDedup/embeddingDup — the hottest bucket tracks the " +
            "biggest cluster regardless of plane count), or raise the " +
            "budget if the corpus genuinely carries this much neighbor " +
            "mass.")
    }
    // localCheckpoint: the edge list feeds both the output and its
    // reversal — without it the whole bucket-join + rank pipeline (the
    // corpus-sized work) would evaluate twice
    val q = signed.select(col("__id").as("query_id"), col("__v").as("qv"),
      probedSig.as("bucket"))
    val c = signed.select(col("__id").as("neighbor_id"),
      col("__v").as("cv"), col("__sig").as("bucket"))
    val edges = stage(rankTopK(
      q.join(c, Seq("bucket"))
        .filter(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosine(col("qv"), col("cv")).as("cosine")), k)
      .select(col("query_id").as("src_id"), col("neighbor_id").as("dst_id"),
        col("cosine"), col("rank")))
    val rev = edges.select(col("dst_id").as("src_id"),
      col("src_id").as("dst_id"), lit(true).as("mutual"))
    edges.join(rev, Seq("src_id", "dst_id"), "left")
      .select(col("src_id"), col("dst_id"), col("cosine"), col("rank"),
        coalesce(col("mutual"), lit(false)).as("mutual"))
  }

  /** Plane count for [[knnGraph]]/[[lshTopK]]: bucket count must grow
    * LINEARLY with the corpus (2^planes ∝ corpusSize) so mean bucket
    * population — and with it the per-bucket quadratic's cost — stays
    * constant as the corpus grows. The [[Dedup.suggestedCells]] rule for
    * the hyperplane-LSH family: tune `basePlanes` once at a
    * recall-audited reference scale `baseCorpus` (the sim5-style
    * recall-vs-exact audit), then every growth factor g adds ⌈log₂ g⌉
    * planes. Capped at 62 so the signature stays a valid Long bitmask.
    * Plane growth bounds MEAN bucket size only — a dominant cluster
    * shares its bucket at any plane count; the [[knnGraph]] pair-budget
    * guard is the fail-loud backstop for that case, and upstream
    * compaction ([[Dedup.semanticDedup]]) the mitigation. */
  def suggestedPlanes(corpusSize: Long, basePlanes: Int = 8,
      baseCorpus: Long = 250L): Int = {
    require(corpusSize > 0 && baseCorpus > 0 && basePlanes > 0,
      s"suggestedPlanes needs positive sizes; got corpusSize=$corpusSize " +
        s"baseCorpus=$baseCorpus basePlanes=$basePlanes")
    // overflow-safe ⌈corpusSize / baseCorpus⌉ (the +denominator-1 form
    // would wrap at corpusSize near Long.MaxValue)
    val growth = math.max(1L,
      corpusSize / baseCorpus + (if (corpusSize % baseCorpus == 0) 0L else 1L))
    val extra = 64 - java.lang.Long.numberOfLeadingZeros(growth - 1) // ⌈log₂⌉
    math.min(62, basePlanes + math.max(0, extra))
  }

  /** [[Dedup.crossBlockVolume]] over [[knnGraph]]'s bucket self-join —
    * probe rows are every vector's multiprobe buckets (nPlanes+1 per
    * vector), build rows its exact bucket, exactly as the graph joins
    * them. `totalPairs` counts the raw candidate rows, including the N
    * hamming-0 self-matches the operator filters; `maxBlock` is the
    * hottest bucket's probe×member product — the quantity that must
    * stay bounded for the per-bucket quadratic to survive scale. */
  def knnGraphBucketVolume(corpus: DataFrame, idCol: String,
      vecCol: String, nPlanes: Int = 8, dim: Int = 64,
      multiProbe: Boolean = true): Dedup.BlockVolume = {
    val (exact, probed) = bucketExprs(vecCol, nPlanes, dim, multiProbe)
    val clean = corpus.filter(col(vecCol).isNotNull)
    Dedup.crossBlockVolume(
      clean.select(probed.as("bucket")),
      clean.select(exact.as("bucket")),
      Seq("bucket"))
  }

  /** `multiProbe = true` additionally probes every 1-bit-flip neighbor
    * of the QUERY's bucket (explode factor nPlanes+1, queries are the
    * small side), so candidates include corpus vectors whose signature
    * differs in at most one plane — per-candidate recall rises from
    * (1-q)^nPlanes to +nPlanes·q·(1-q)^(nPlanes-1) more, at constant
    * cost. A hamming-≤1 candidate is reachable through exactly one
    * probe, so no dedup is needed. */
  /** The (exact, probed) bucket expressions of the LSH bucket join —
    * ONE definition shared by [[lshTopK]]/[[knnGraph]] and the
    * [[knnGraphBucketVolume]] bench canary, so the canary can never
    * drift from the join it measures. The coalesce marks the key
    * non-nullable (null vectors are pre-filtered) so the optimizer
    * cannot infer `isnotnull(lshsignatureexpr(v))` and evaluate the
    * signature twice per row (see PlanAuditSpec's single-eval audit);
    * `probed` additionally explodes every 1-bit-flip neighbor bucket. */
  private def bucketExprs(vecCol: String, nPlanes: Int, dim: Int,
      multiProbe: Boolean): (Column, Column) =
    (coalesce(lshSignature(col(vecCol), nPlanes, dim), lit(0L)),
      probedBuckets(
        coalesce(lshSignature(col(vecCol), nPlanes, dim), lit(0L)),
        nPlanes, multiProbe))

  /** The probe-side bucket set derived from an ALREADY-COMPUTED exact
    * signature column: the bucket itself plus (under multiprobe) its
    * nPlanes 1-bit-flip neighbors. Factored out so [[knnGraph]] can
    * probe from its checkpointed signature column without re-evaluating
    * the signature expression. */
  private def probedBuckets(sig: Column, nPlanes: Int,
      multiProbe: Boolean): Column =
    if (multiProbe)
      explode(array((lit(0L) +: (0 until nPlanes).map(p => lit(1L << p)))
        .map(flip => sig.bitwiseXOR(flip)): _*))
    else sig

  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nPlanes: Int = 8, dim: Int = 64, multiProbe: Boolean = false): DataFrame = {
    val (exact, probed) = bucketExprs(vecCol, nPlanes, dim, multiProbe)
    val q = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        probed.as("bucket"))
    val c = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        exact.as("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cosine"))
    rankTopK(scored, k)
  }
}
