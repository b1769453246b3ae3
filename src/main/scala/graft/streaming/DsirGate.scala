package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The serve half of DSIR data selection [Xie et al., NeurIPS 2023]:
  * a continuous ingest path scores each arriving document against a
  * FROZEN bucket-ratio table trained by the batch pass (x90/x92's
  * `dsirRatio`, staged once per dataset version) and gates on it —
  * train-once / serve-continuously, the same split the dedup family
  * runs (x01 historical pass vs the streaming fingerprint dedup).
  *
  * Stateless by construction: a document's score depends only on its
  * own text and the frozen model, so the gate is replay-idempotent
  * under at-least-once delivery with no state store at all — rescoring
  * a redelivered doc yields the identical row (exact integer
  * arithmetic, no RNG), and any keyed LWW sink collapses duplicates.
  * Called per micro-batch from `foreachBatch` (the DimRouter shape);
  * the ratio table is 4096 rows at any corpus size, so the join is a
  * broadcast and the fact stream never shuffles for it.
  */
object DsirGate {

  /** Hashed-bigram feature extraction — ONE definition shared by the
    * batch trainer (x90/x92 via `dsirMatrix`) and this gate, so the
    * streaming score provably featurizes identically to the model it
    * is served against. Input needs (doc_id, lang, text); output
    * (doc_id, lang, b, cnt). Docs with < 2 tokens have no features and
    * drop here (batch and gate agree: they are unscorable). */
  def bucketCounts(docs: DataFrame, nBuckets: Long): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    // One narrow pass: the native kernel hashes each bigram straight
    // off the md5 digest bytes and folds the per-doc counts in memory,
    // so the matrix needs NO corpus-wide (doc, bucket) shuffle and no
    // hex round-trip — the interpreted explode → md5 → conv → groupBy
    // chain it replaces was x90's single dominant job. Bit parity
    // pinned by DsirGateSpec and the x90/x92/x93 oracles.
    docs
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"), col("lang"),
        explode(GraftPlanBridge.col(graft.functions.DsirBucketCounts(
          GraftPlanBridge.expr(col("toks")), nBuckets))).as("bc"))
      .select(col("doc_id"), col("lang"),
        col("bc.b").as("b"), col("bc.cnt").as("cnt"))
  }

  /** Train the frozen per-bucket ratio table from ANY corpus — the
    * generic form of the fixture-bound x90 trainer
    * (`Extensions.dsirRatio`, whose target is hardwired to
    * lang = 'en'): `isTarget` marks the target-domain rows, everything
    * is the raw pool, and the output is the same DENSE B-row
    * (b, r_ppm) model [[score]] serves —
    * `r_ppm(b) = 1e6·(c_t+1)(N_r+B) ÷ (c_r+1)(N_t+B)` in exact
    * DECIMAL(38,0) arithmetic (DsirGateSpec pins bit-equality with
    * the x90 trainer on the fixture corpus, so the two definitions
    * cannot drift). Train-once / serve-continuously: stage this once
    * per dataset version, broadcast the 4096 rows forever after. */
  def trainRatio(docs: DataFrame, isTarget: Column,
                 nBuckets: Long = 4096L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // evaluate the target predicate against the CALLER's columns
    // before re-purposing `lang` as the per-row domain marker
    val marked = docs.withColumn("__t", isTarget)
      .withColumn("lang", when(col("__t"), "t").otherwise("r"))
    val buckets = spark.range(nBuckets).select($"id".as("b"))
      .join(
        bucketCounts(marked, nBuckets).groupBy($"b").agg(
          sum($"cnt").as("c_r0"),
          sum(when($"lang" === "t", $"cnt").otherwise(0L)).as("c_t0")),
        Seq("b"), "left")
      .select($"b", coalesce($"c_r0", lit(0L)).as("c_r"),
        coalesce($"c_t0", lit(0L)).as("c_t"))
    val totals = buckets.agg(sum($"c_r").as("n_r"), sum($"c_t").as("n_t"))
    buckets
      .crossJoin(broadcast(totals))
      .withColumn("r_ppm", expr(
        s"cast(1000000 as decimal(38,0)) * (c_t + 1) * (n_r + $nBuckets) div " +
        s"(cast(c_r + 1 as decimal(38,0)) * (n_t + $nBuckets))"))
      .select($"b", $"r_ppm")
  }

  /** Score a batch of documents against the frozen ratio table:
    * (doc_id, lang, n_bigrams, score_ppm). Exact integer mean of the
    * doc's per-bigram bucket ratios — identical bits to the batch
    * x92 apply over the same rows.
    *
    * The ratio table is DENSE by the trainer's contract
    * (`Extensions.dsirRatio` emits one row for every bucket in
    * [0, nBuckets), unseen buckets carrying the add-one-smoothed
    * default ratio), so this inner join loses nothing when a served
    * doc's bigrams hash to buckets the training corpus never produced
    * — exactly the serve-against-frozen-model scenario the gate exists
    * for. A sparse model would silently drop those features from both
    * sum and count and mislabel an all-unseen doc `unscorable`. */
  def score(docs: DataFrame, ratio: DataFrame,
            nBuckets: Long = 4096L): DataFrame =
    bucketCounts(docs, nBuckets)
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        expr("sum(cnt * r_ppm) div sum(cnt)").as("score_ppm"))

  /** ONE scored-with-reason frame carrying both sides of the gate:
    * (doc_id, lang, n_bigrams, score_ppm, reason) where `reason` is
    * NULL for accepted docs, `low_score` below the threshold and
    * `unscorable` for docs with < 2 tokens (n_bigrams/score_ppm NULL).
    * A caller wiring both sides per micro-batch (the CurationPipeline
    * side-output shape) should compute THIS once — persist it or hand
    * it to the [[accepted]]/[[rejected]] overloads below — so one
    * featurize + broadcast-join pass feeds both outputs instead of
    * each side re-running the pipeline. */
  def scored(docs: DataFrame, ratio: DataFrame, minScorePpm: Long,
             nBuckets: Long = 4096L): DataFrame =
    docs.select(col("doc_id"), col("lang"))
      .join(score(docs, ratio, nBuckets)
          .select(col("doc_id"), col("n_bigrams"), col("score_ppm")),
        Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("score_ppm").isNull, "unscorable")
          .when(col("score_ppm") < minScorePpm, "low_score"))

  /** Accepted half of a precomputed [[scored]] frame. */
  def accepted(scoredFrame: DataFrame): DataFrame =
    scoredFrame.filter(col("reason").isNull)
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("score_ppm"))

  /** Rejected half of a precomputed [[scored]] frame:
    * (doc_id, lang, reason) — `low_score` or `unscorable`. Unscorable
    * docs (< 2 tokens) reject with their own reason — nothing drops
    * silently (the CurationPipeline side-output contract). */
  def rejected(scoredFrame: DataFrame): DataFrame =
    scoredFrame.filter(col("reason").isNotNull)
      .select(col("doc_id"), col("lang"), col("reason"))

  /** Gate: accepted stream (score ≥ minScorePpm). Convenience
    * one-sided form; a caller consuming BOTH sides should go through
    * [[scored]] once instead. */
  def accepted(docs: DataFrame, ratio: DataFrame, minScorePpm: Long,
               nBuckets: Long = 4096L): DataFrame =
    accepted(scored(docs, ratio, minScorePpm, nBuckets))

  /** Rejected stream with reasons — convenience one-sided form of
    * [[rejected]] over [[scored]]. */
  def rejected(docs: DataFrame, ratio: DataFrame, minScorePpm: Long,
               nBuckets: Long = 4096L): DataFrame =
    rejected(scored(docs, ratio, minScorePpm, nBuckets))
}
