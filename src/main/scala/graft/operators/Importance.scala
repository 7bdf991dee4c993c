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
}
