package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic dataset splitting and sampling for training pipelines.
  *
  * Everything keys off a content hash, not `rand()`: the assignment is a
  * pure function of the row, so it is reproducible run-to-run, stable
  * under re-partitioning, engine-neutral (DuckDB-oracle-checkable), and
  * — the property that matters at 100 TB — requires NO shuffle at all
  * for the split itself (a narrow projection) and exactly one bounded
  * shuffle for stratified sampling (on the strata key).
  */
object Splits {

  /** Train/val/test assignment by content hash: `pmod(polyHash(on), 100)`
    * lands in [0,100); < trainPct → "train", < trainPct+valPct → "val",
    * else "test". A narrow, shuffle-free projection — rows never move.
    * Duplicate contents land in the same split by construction, which is
    * exactly what leakage-safe splitting wants. */
  def assign(on: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"split percentages must be non-negative and sum to <= 100, " +
        s"got train=$trainPct val=$valPct")
    val h = pmod(TextFunctions.polyHash(on), lit(100L))
    when(h < trainPct, lit("train"))
      .when(h < trainPct + valPct, lit("val"))
      .otherwise(lit("test"))
  }

  /** Deterministic shard id in [0, nShards) for write-partitioning. */
  def shard(on: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    pmod(TextFunctions.polyHash(on), lit(nShards.toLong))
  }

  /** Deterministic global corpus shuffle into training shards — the
    * "shuffle the data once, globally, reproducibly" step every
    * pretraining run does before sharding (training-order correlation
    * with crawl/source order is a real optimization hazard; a content-
    * hash order destroys it deterministically, no `rand()` and no seed
    * file to lose). Each row's shard is `pmod(h, nShards)` of a SALTED
    * content hash (its own channel, independent of [[assign]]/[[shard]]'s
    * keys — reusing a channel would correlate the shuffle with the
    * split), and `pos_in_shard` is the row's rank within its shard under
    * (h, id) — a total, engine-neutral order (the id breaks duplicate-
    * content ties).
    *
    * Plan at 100 TB: one exchange keyed on the shard id, then a window
    * sort WITHIN each shard — per-reducer work is corpus/nShards, all
    * shards sort in parallel, and that per-shard sort is exactly the
    * order the shard file must be written in anyway (no global sort, no
    * single-partition window anywhere). Pick nShards so corpus/nShards
    * fits a reducer (a real run uses thousands).
    *
    * @return (idCol, shard, pos_in_shard) — pos is 1-based within shard. */
  def shuffleShards(df: DataFrame, idCol: String, on: Column,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol))
    df.select(col(idCol),
        TextFunctions.polyHash(concat(on, lit("#shuffle"))).as("__h"))
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .select(col(idCol), col("shard"),
        row_number().over(w).cast("long").as("pos_in_shard"))
  }

  /** Token-budget shard packing: documents in id order are packed
    * greedily into shards of ~`capacity` tokens — shard = floor(cumulative
    * tokens before this doc / capacity), the deterministic assignment a
    * sharded training-data writer uses so every output file lands near a
    * target token count.
    *
    * The semantics are a GLOBAL running sum — inherently sequential — but
    * the plan is the classic two-phase distributed prefix sum, never a
    * single-partition window over the corpus:
    *
    *  1. ids bucket into coarse ranges (`chunkDocs` docs per bucket) and
    *     one small aggregate computes per-bucket token totals;
    *  2. bucket offsets are a running sum over the BUCKET TOTALS — a
    *     table N/chunkDocs rows long (the only unpartitioned window, and
    *     it never sees document rows; at 10⁹ docs and chunkDocs = 8192
    *     that is ~122 k rows — add a second level before this needs it);
    *  3. offsets broadcast back and a window PARTITIONED BY bucket does
    *     the local cumsum, so per-reducer work is bounded by chunkDocs.
    *
    * The DuckDB oracle states the semantics as the naive global window;
    * this plan must reproduce it exactly.
    *
    * Requires a numeric id; ties in `idCol` would make "cumulative before"
    * ambiguous, so ids are assumed unique (true of any doc id worth the
    * name). Returns (idCol, n_tokens, shard). */
  def tokenBudgetShards(df: DataFrame, idCol: String, tokens: Column,
      capacity: Long, chunkDocs: Long = 8192L): DataFrame = {
    require(capacity > 0 && chunkDocs > 0)
    runningTokenOffsets(df, idCol, tokens, chunkDocs)
      .select(col("id").as(idCol), col("n_tokens"),
        // SQL `div` (IntegralDivide), never floor(a / b): the double
        // route rounds above 2^53 and the shard boundary would drift
        // off the oracle's exact integer `//`
        expr(s"cum_before div CAST($capacity AS BIGINT)").as("shard"))
  }

  /** The two-phase distributed prefix sum shared by [[tokenBudgetShards]]
    * and [[sequenceCuts]]: (id, n_tokens, cum_before) where cum_before =
    * Σ n_tokens of all smaller ids. Plan as documented on
    * [[tokenBudgetShards]] — the only unpartitioned window runs over the
    * bucket-totals table, never over document rows. */
  private def runningTokenOffsets(df: DataFrame, idCol: String,
      tokens: Column, chunkDocs: Long): DataFrame = {
    val base = df.select(col(idCol).as("id"), tokens.cast("long").as("n_tokens"))
      .withColumn("bucket", floor(col("id") / chunkDocs))
    val bucketTotals = base.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_total"))
    val wBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(wBuckets), lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    val wLocal = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("bucket"))
      .withColumn("cum_before",
        col("bucket_offset") + sum(col("n_tokens")).over(wLocal) - col("n_tokens"))
      .select(col("id"), col("n_tokens"), col("cum_before"))
  }

  /** Fixed-length sequence cutting — the pretraining packing step
    * itself: documents concatenate into one global token stream in id
    * order, the stream is cut every `seqLen` tokens into training
    * sequences, and each document reports which sequences it lands in
    * and which of ITS tokens each sequence takes (a document crossing a
    * cut boundary spans two-plus sequences — exactly what a pretraining
    * packer does, no padding, no truncation loss). The map is what a
    * dataloader needs to assemble any sequence: every (doc, seq) overlap
    * row with the doc-local token range.
    *
    * Semantics are the same GLOBAL running sum as [[tokenBudgetShards]]
    * (doc offset = Σ tokens before it); the plan is the same two-phase
    * prefix sum — no corpus-wide window — plus a narrow generator
    * exploding each doc's ≤ 1 + n/seqLen covered sequence ids. The
    * DuckDB oracle states the naive global-window form; this plan must
    * reproduce it exactly.
    *
    * @return (idCol, seq_id, tok_start, tok_end, n_seq_tokens) —
    *         doc-local token positions, 1-based inclusive; seq_id is the
    *         0-based global sequence index. */
  def sequenceCuts(df: DataFrame, idCol: String, tokens: Column,
      seqLen: Long, chunkDocs: Long = 8192L): DataFrame = {
    require(seqLen > 0 && chunkDocs > 0)
    val offs = runningTokenOffsets(df, idCol, tokens, chunkDocs)
      .filter(col("n_tokens") > 0L)
    // explode_outer + null filter (house discipline: a bare explode lets
    // InferFiltersFromGenerate clone the generator into a size() filter)
    offs
      .select(col("id"), col("n_tokens"), col("cum_before").as("off"),
        // SQL `div` (IntegralDivide), not floor(a / b): the double
        // division rounds above 2^53 and the cut boundary would drift
        // off the oracle's exact `//` for non-power-of-two seqLen at
        // extreme offsets
        explode_outer(sequence(
          expr(s"cum_before div CAST($seqLen AS BIGINT)"),
          expr(s"(cum_before + n_tokens - 1) div CAST($seqLen AS BIGINT)")))
          .as("seq_id"))
      .filter(col("seq_id").isNotNull)
      .select(col("id").as(idCol), col("seq_id").cast("long").as("seq_id"),
        (greatest(lit(0L), col("seq_id") * seqLen - col("off")) + 1L)
          .as("tok_start"),
        (least(col("n_tokens") - 1L,
          (col("seq_id") + 1L) * seqLen - 1L - col("off")) + 1L).as("tok_end"))
      .withColumn("n_seq_tokens", col("tok_end") - col("tok_start") + 1L)
  }

  /** Domain-mixture resampling: keep each row with a per-domain
    * probability (`ratesPct`, percent, `defaultPct` for unlisted
    * domains), decided by content hash rather than `rand()` — the
    * deterministic form of the "re-balance the training mixture" step
    * (up-weight curated sources, down-weight crawl). A pure narrow
    * filter: no shuffle, reproducible, stable under re-partitioning, and
    * exact-duplicate contents always make the same keep/drop decision.
    * Use a salted `on` column (e.g. `concat(text, lit("#mix"))`) so the
    * decision channel is independent of [[assign]]'s split channel. */
  def mixtureSample(df: DataFrame, domain: Column, on: Column,
      ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    require((defaultPct +: ratesPct.values.toSeq).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val h = pmod(TextFunctions.polyHash(on), lit(100L))
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (dom, pct)) =>
      when(domain === dom, lit(pct)).otherwise(acc)
    }
    df.filter(h < rate)
  }

  /** Stratified deterministic sample: the `perStratum` rows of each
    * stratum with the smallest (contentHash, tieBreak) — a uniform
    * pseudo-random but reproducible choice. One shuffle on the strata
    * key. Note the trade: COARSER strata mean LARGER per-stratum work —
    * each stratum is one window partition, so a handful of huge strata
    * concentrates rows on few reducers. What keeps that safe is the
    * `rank <= k` filter: Spark pushes it below the sort as a
    * WindowGroupLimit (pinned in PlanAuditSpec), so every map task keeps
    * only `perStratum` rows per stratum and the reducer merges
    * (numMapTasks × perStratum) rows instead of sorting the full
    * stratum. Truly per-user-fine strata shift the cost the other way
    * (a huge strata-key exchange); pick strata for the sampling
    * semantics, not the plan — the group limit bounds both ends. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], on: Column,
      tieBreak: Column, perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(TextFunctions.polyHash(on), tieBreak)
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= perStratum)
  }

  /** CCNet-style per-stratum quantile bucketing: rank every row within
    * its stratum by `score` descending (ties broken by `tieBreak`) and
    * label it `head` / `middle` / `tail` by exact terciles of the
    * stratum size — the "keep the best-scoring third per language"
    * filter from perplexity-bucketed corpus curation (CCNet's
    * head/middle/tail split).
    *
    * Semantics are an exact GLOBAL per-stratum rank, but a stratum is a
    * language — a handful of enormous partitions at 100 TB — so the plan
    * must not sort whole strata on single reducers. Same two-phase shape
    * as [[tokenBudgetShards]]:
    *
    *  1. scores band into `bands` coarse buckets (`floor(score·bands)` —
    *     monotone in score, so band order refines score order);
    *  2. per-(stratum, band) counts aggregate map-side into a table of
    *     at most |strata|·bands rows; a window over THAT small table
    *     yields each band's higher-score prefix count and the stratum
    *     total;
    *  3. offsets broadcast back and a window PARTITIONED BY
    *     (stratum, band) ranks within bands — per-reducer work is one
    *     band of one stratum, 1/`bands` of the old partition, and the
    *     sort key spreads over |strata|·bands reducers instead of
    *     |strata|.
    *
    * Equal scores always share a band, so banded rank ≡ global rank
    * exactly (property-tested against the naive window). Assumes
    * `score` ∈ [0, 1] — scores outside only coarsen banding (floor
    * clamps into the end bands' key space), never change the output.
    *
    * Returns df's columns + (`stratum_rank`, `bucket`). */
  def quantileBuckets(df: DataFrame, strata: Seq[String], score: Column,
      tieBreak: Column, bands: Int = 256): DataFrame = {
    require(bands > 0, "bands must be positive")
    val sCols = strata.map(col)
    // Materialize the slim (row, score, band) table once: both passes
    // (band counting, final rank) read it, and the scorer — often a
    // heavyweight text expression — runs ONCE per row instead of once
    // per pass plus once inside join-key null filters. Callers pass a
    // projection that carries only what the output needs; this is the
    // stage boundary a production pipeline would checkpoint at anyway.
    val base = df.withColumn("__score", score)
      .withColumn("__band", floor(col("__score") * bands).cast("long"))
      .localCheckpoint()
    val bandCounts = base.groupBy(sCols :+ col("__band"): _*)
      .agg(count(lit(1)).as("__bc"))
    val wHigher = Window.partitionBy(sCols: _*)
      .orderBy(col("__band").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.partitionBy(sCols: _*)
    val offsets = bandCounts
      .withColumn("__offset", coalesce(sum(col("__bc")).over(wHigher), lit(0L)))
      .withColumn("__n", sum(col("__bc")).over(wTotal))
      .select(sCols :+ col("__band") :+ col("__offset") :+ col("__n"): _*)
    val wLocal = Window.partitionBy(sCols :+ col("__band"): _*)
      .orderBy(col("__score").desc, tieBreak)
    // NULL-SAFE offsets join: a null stratum value (or a null score ⇒
    // null band) forms its own group under Window.partitionBy and must
    // rank like any other — a plain equi-join would silently drop those
    // rows and diverge from the naive per-stratum window this operator
    // is property-tested against. Null bands sort last under the desc
    // band window (Spark desc = nulls last), exactly where null scores
    // land in the naive formulation.
    val joinCond = (strata :+ "__band").map(n =>
      col(s"__l.$n") <=> col(s"__r.$n")).reduce(_ && _)
    base.as("__l").join(broadcast(offsets).as("__r"), joinCond)
      .select(col("__l.*"), col("__r.__offset"), col("__r.__n"))
      .withColumn("stratum_rank", col("__offset") + row_number().over(wLocal))
      .withColumn("bucket",
        when(col("stratum_rank") * 3 <= col("__n"), lit("head"))
          .when(col("stratum_rank") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__score", "__band", "__offset", "__n")
  }

  /** Leakage-safe train/val/test assignment: rows assign by their
    * near-dup CLUSTER's canonical id, not their own content — every
    * member of a duplicate cluster lands in the SAME split, so a
    * near-copy of a training document can never leak into eval. (Plain
    * [[assign]] on content already co-assigns EXACT duplicates; only
    * cluster-level assignment co-assigns near-duplicates, the classic
    * eval-contamination hole.) `labels` is the (idCol, clusterCol)
    * output of [[Dedup.clusters]] over near-dup pairs; unlabeled rows
    * (singletons) are their own cluster. The join is id-keyed; the
    * assignment itself stays a narrow hash of the cluster id.
    *
    * @return df's columns + (`cluster_id`, `split`)
    */
  def clusterAssign(df: DataFrame, idCol: String, labels: DataFrame,
      clusterCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.join(labels.select(col(idCol), col(clusterCol).as("__cl")),
        Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("__cl"), col(idCol)))
      .drop("__cl")
      .withColumn("split",
        assign(concat(lit("c#"), col("cluster_id").cast("string")),
          trainPct, valPct))

  /** Token-budget allocation across domains — the data-recipe planning
    * step run BEFORE any sampling: given a total training token budget
    * and per-domain target mixture weights, how many tokens does each
    * domain contribute, how many epochs (repeats) does that imply, and
    * where does the recipe fall short because a domain is too small
    * even at the repeat cap (the Llama/Gopher-style "weights × budget
    * vs corpus size × max epochs" reconciliation).
    *
    * Exact integer arithmetic throughout, in overflow-safe split form
    * (the mx2/x19 discipline — no double rounding anywhere near a
    * floor):
    *  - `target = floor(wPpm·T / 10⁶)` computed as
    *    `wPpm·(T div 10⁶) + floor(wPpm·(T mod 10⁶)/10⁶)` — every
    *    intermediate ≤ ~10¹³ for T up to ~9·10¹² tokens/million;
    *  - `alloc = min(target, maxEpochs·n_d)`;
    *  - `epochs_milli = floor(alloc·1000 / n_d)` as
    *    `(alloc div n_d)·1000 + (alloc mod n_d)·1000 div n_d`.
    *
    * Plan: ONE map-side-combined count aggregate over a scan pruned to
    * (domain, tokens); the |domains|-row result broadcast-joins the
    * weight literals. Domains with zero tokens (or absent from
    * `weightsPpm`) drop — no defined epoch count. The corpus never
    * shuffles.
    *
    * @return (domain, n_tokens, w_ppm, target_tokens, alloc_tokens,
    *         deficit_tokens, epochs_milli)
    */
  def tokenBudgetAllocation(df: DataFrame, domain: Column, tokens: Column,
      weightsPpm: Map[String, Long], totalBudget: Long,
      maxEpochs: Int): DataFrame = {
    require(totalBudget > 0 && maxEpochs > 0,
      "budget and epoch cap must be positive")
    require(weightsPpm.values.forall(w => w >= 0 && w <= 1000000L),
      "weights are parts-per-million in [0, 1e6]")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(domain.as("domain"))
      .agg(sum(tokens.cast("long")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val weights = weightsPpm.toSeq.toDF("domain", "w_ppm")
    val tq = totalBudget / 1000000L
    val tr = totalBudget % 1000000L
    counts.join(broadcast(weights), Seq("domain"))
      .withColumn("target_tokens",
        col("w_ppm") * tq +
          floor((col("w_ppm") * tr) / lit(1000000.0)).cast("long"))
      .withColumn("alloc_tokens",
        least(col("target_tokens"), col("n_tokens") * maxEpochs))
      .withColumn("deficit_tokens",
        col("target_tokens") - col("alloc_tokens"))
      .withColumn("epochs_milli",
        expr("alloc_tokens DIV n_tokens") * 1000L +
          expr("alloc_tokens % n_tokens * 1000 DIV n_tokens"))
  }

  /** Temperature-weighted domain resampling (the UniMax / multilingual-
    * mixture rule: kept counts ∝ n_d^α): each domain keeps the
    * deterministic fraction `(n_min / n_d)^(1-α)`, so after filtering
    * the domain shares follow the α-tempered distribution with the
    * smallest domain kept whole — α = 1 keeps everything (natural
    * mixture), α = 0 equalizes every domain down to n_min, α = 0.5 is
    * the square-root tempering common in multilingual pretraining.
    *
    * The keep/drop decision is the same content-hash gate as
    * [[mixtureSample]] (`polyHash(on) mod 10⁶ < rate_ppm`) — pure,
    * reproducible, stable under re-partitioning. Rates quantize to
    * integer parts-per-million via one `floor`; for α = 0.5 the math is
    * a single IEEE `sqrt` (correctly rounded by every engine, so the
    * DuckDB oracle reproduces rates bit-for-bit). Other α use `pow`,
    * which carries a ≤1-ulp cross-engine caveat at floor boundaries.
    *
    * Scale shape: pass 1 aggregates per-domain counts — a map-side-
    * combined aggregate over a scan COLUMN-PRUNED to the domain column
    * alone; `n_min` derives from a window over the |domains|-row count
    * table; the tiny rate table then broadcast-joins back and the gate
    * is a narrow filter. The corpus itself never shuffles. Null-domain
    * rows have no defined rate and are dropped.
    *
    * @return df's columns + `rate_ppm` (kept rows only)
    */
  def temperatureMixture(df: DataFrame, domain: Column, on: Column,
      alpha: Double = 0.5): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      "alpha in [0, 1]: a hash-gate filter can only downsample (alpha > 1 would need upsampling)")
    // null-domain rows are dropped from the OUTPUT (no defined rate), so
    // they must not join the count table either — a null group smaller
    // than every real domain would otherwise define n_min and silently
    // decimate the whole corpus toward the size of an excluded group
    val counts = df.filter(domain.isNotNull)
      .groupBy(domain.as("__dom")).agg(count(lit(1)).as("__n"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ratio = min(col("__n")).over(wAll).cast("double") / col("__n").cast("double")
    val keepFrac = if (alpha == 0.5) sqrt(ratio) else pow(ratio, lit(1.0 - alpha))
    val rates = counts
      .select(col("__dom"), floor(keepFrac * lit(1e6)).cast("long").as("rate_ppm"))
    df.join(broadcast(rates), domain === col("__dom"))
      .filter(pmod(TextFunctions.polyHash(on), lit(1000000L)) < col("rate_ppm"))
      .drop("__dom")
  }
}
