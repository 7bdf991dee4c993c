package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Data-selection importance weighting (DSIR-style): score every
  * document by how much more likely its tokens are under a TARGET
  * domain's hashed unigram model than under the RAW corpus model —
  * `log w(doc) = Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)]`,
  * the log importance ratio of "Data Selection for Language Models via
  * Importance Resampling" (Xie et al., 2023) with hashed n-gram
  * features. Documents with positive `logw` look more like the curated
  * target than like the average of the crawl; downstream selection
  * keeps the top mass by weight.
  *
  * Scale shape, the reason this formulation survives 100 TB:
  *
  *  - features are HASHED buckets (`pmod(polyHash(token), buckets)`),
  *    so both models are fixed-size tables of `buckets` rows however
  *    large the corpus — ONE model-building aggregate (raw count +
  *    conditional target count in the same pass) combines map-side,
  *    totals derive from a window over the model table itself, and the
  *    finished model broadcasts;
  *  - the token stream is a generator explode (never materialized), the
  *    model joins are broadcast hash joins, and the only corpus-sized
  *    shuffle is the final per-document aggregate, keyed on the doc id;
  *  - per-bucket log ratios QUANTIZE to integer micro-nats
  *    (`floor(lr·10⁶)`) before the per-document sum, so the reduction
  *    is exact integer arithmetic — commutative, order-free (plain
  *    map-side-combining `sum`, no ordered-fold materialization), and
  *    bit-identical across engines. Raw double log ratios differ by an
  *    ulp between libm implementations, which an ordered float fold
  *    faithfully *accumulates* into visible drift; quantizing at the
  *    model (256 values, each ~2⁻³³ away from a floor boundary) kills
  *    the divergence at its source at a precision (10⁻⁶ nats/token) far
  *    below any selection decision.
  *
  * Both models are Laplace-smoothed over the bucket space
  * (`(c+1)/(T+buckets)`), so buckets unseen in the target still score —
  * a raw-only bucket just contributes a negative ratio. Null texts are
  * dropped (no tokens → no weight is the only honest answer).
  */
object Importance {

  /** Per-document DSIR log importance weights in micro-nats.
    *
    * @param df       corpus; one row per document
    * @param idCol    unique document id column name
    * @param textCol  whitespace-tokenized text column name
    * @param isTarget row predicate selecting the target-domain subset
    *                 (must be a pure function of the row)
    * @param buckets  hashed-feature space size (model table rows)
    * @return (idCol, logw_micro, n_tokens, target_like = logw_micro > 0)
    */
  def dsirLogWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val tok = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), isTarget.as("__tgt"),
        explode(split(col(textCol), " ")).as("__token"))
      .select(col("__id"), col("__tgt"),
        pmod(TextFunctions.polyHash(col("__token")), lit(buckets.toLong))
          .as("__bucket"))
    // BOTH models build from ONE pass over the token stream: raw counts
    // every token, target counts the target subset via a conditional
    // count in the same aggregate — `buckets` rows out, partials
    // map-side. Totals then derive from the counts with a window over
    // the 256-row model table (never a second corpus aggregate).
    val counts = tok.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__cr"),
        count(when(col("__tgt"), lit(1))).as("__ct"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val model = counts
      .withColumn("__tr", sum(col("__cr")).over(wAll))
      .withColumn("__tt", sum(col("__ct")).over(wAll))
      .select(col("__bucket"),
        floor((log((col("__ct") + 1L).cast("double") /
            (col("__tt") + buckets).cast("double"))
          - log((col("__cr") + 1L).cast("double") /
            (col("__tr") + buckets).cast("double"))) * lit(1e6))
          .cast("long").as("__lr"))
    tok.join(broadcast(model), Seq("__bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("__lr")).as("logw_micro"),
        count(lit(1)).as("n_tokens"))
      .select(col("__id").as(idCol), col("logw_micro"), col("n_tokens"),
        (col("logw_micro") > 0L).as("target_like"))
  }

  /** CCNet-style language-model quality scoring: a hashed-BIGRAM model
    * with unigram backoff, trained on the `isModel` subset (the "clean"
    * reference corpus — CCNet trains on Wikipedia), scores every
    * document's mean token log-likelihood; low scores flag gibberish,
    * boilerplate, and out-of-domain text the way CCNet's KenLM
    * perplexity buckets do.
    *
    * Per bigram (w₁ w₂) the score is the log-space interpolation
    * `λ·ln p_bi(bucket(w₁w₂)) + (1−λ)·ln p_uni(bucket(w₂))` with both
    * models Laplace-smoothed over their hashed bucket spaces
    * (`(c+1)/(T+buckets)`); per document the scores sum and normalize
    * by bigram count. Log-space interpolation (a weighted geometric
    * mean) rather than probability-space mixing is what lets BOTH
    * factors quantize to integer micro-nats AT THE MODEL — the [[Importance.dsirLogWeights]]
    * float-free trick: the corpus-wide reduction is exact integer math,
    * immune to cross-engine ln jitter.
    *
    * Scale shape (same discipline as DSIR):
    *
    *  - the model build is ONE pass over the model subset's bigram
    *    stream — a generator explode feeding a single GROUPING SETS
    *    aggregate that produces the bigram- and unigram-bucket counts
    *    together (Expand duplicates pre-aggregate rows, partials still
    *    combine map-side; one exchange of ≤ biBuckets + uniBuckets
    *    rows);
    *  - both models DENSIFY over their full bucket ranges
    *    (`spark.range`), so unseen buckets carry their smoothed value
    *    and the scoring joins are plain inner broadcast joins;
    *  - scoring is the corpus bigram explode (never materialized) →
    *    two broadcast probes → one id-keyed aggregate, the only
    *    corpus-sized shuffle.
    *
    * The backoff unigram model is built from the bigram stream's SECOND
    * tokens (every token except each document's first) — the
    * conditioned-position distribution of the same stream, one pass.
    * Documents with fewer than 2 tokens have no bigrams and drop out;
    * null texts likewise.
    *
    * @return (idCol, n_bigrams, logp_micro, avg_logp_micro)
    */
  def hashedBigramLogProb(df: DataFrame, idCol: String, textCol: String,
      isModel: Column, uniBuckets: Int = 256, biBuckets: Int = 4096,
      lambdaPct: Int = 70): DataFrame = {
    require(uniBuckets > 0 && biBuckets > 0, "bucket counts must be positive")
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambdaPct in [0, 100]")
    val lam = lambdaPct / 100.0
    val spark = df.sparkSession
    val pairs = TextFunctions.bind(split(col(textCol), " "), ts =>
      when(size(ts) >= 2,
        transform(sequence(lit(1), size(ts) - 1), i =>
          struct(
            pmod(TextFunctions.polyHash(
              concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))),
              lit(biBuckets.toLong)).as("bb"),
            pmod(TextFunctions.polyHash(element_at(ts, i + 1)),
              lit(uniBuckets.toLong)).as("ub"))))
        .otherwise(array().cast("array<struct<bb:bigint,ub:bigint>>")))
    // explode_outer + null filter, not a plain explode:
    // InferFiltersFromGenerate would clone the whole per-token hashing
    // expression into a `size(...) > 0` filter under the generate,
    // re-running it per row (the Decontaminate.shingleOverlap lesson)
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("__id"), isModel.as("__m"),
        explode_outer(pairs).as("__p"))
      .filter(col("__p").isNotNull)
      .select(col("__id"), col("__m"),
        col("__p.bb").as("__bb"), col("__p.ub").as("__ub"))

    // one model-building pass: grouping sets (bb) + (ub) over the model
    // subset's bigram stream — gid 1 = bigram-bucket rows, 2 = unigram.
    // The ≤ biBuckets+uniBuckets-row count table localCheckpoints so
    // BOTH model tables read the SAME materialized pass — un-pinned,
    // each model re-ran the whole model-subset explode+Expand (a third
    // corpus-shaped scan; the quantileBuckets/dd9 single-evaluation
    // lesson). Eager by design: building the operator runs the model
    // pass once, right here.
    val gs = base.filter(col("__m"))
      .groupingSets(Seq(Seq(col("__bb")), Seq(col("__ub"))),
        col("__bb"), col("__ub"))
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
      .localCheckpoint()
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    def model(bucketCol: String, buckets: Int, gid: Int, weight: Double,
        outCol: String): DataFrame =
      spark.range(buckets).select(col("id").as(bucketCol))
        .join(gs.filter(col("__gid") === gid)
          .select(col(s"__$bucketCol").as(bucketCol), col("__c")),
          Seq(bucketCol), "left")
        .withColumn("__cd", coalesce(col("__c"), lit(0L)))
        .withColumn("__t", sum(col("__cd")).over(wAll))
        .select(col(bucketCol),
          floor(lit(weight) * log((col("__cd") + 1L).cast("double") /
              (col("__t") + buckets).cast("double")) * lit(1e6))
            .cast("long").as(outCol))
    val biModel = model("bb", biBuckets, 1, lam, "__lrb")
    val uniModel = model("ub", uniBuckets, 2, 1.0 - lam, "__lru")

    base.select(col("__id"), col("__bb").as("bb"), col("__ub").as("ub"))
      .join(broadcast(biModel), Seq("bb"))
      .join(broadcast(uniModel), Seq("ub"))
      .groupBy(col("__id"))
      .agg(sum(col("__lrb") + col("__lru")).as("logp_micro"),
        count(lit(1)).as("n_bigrams"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("logp_micro"),
        (col("logp_micro").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_logp_micro"))
  }
}
