package graft.streaming

import org.apache.spark.sql.DataFrame
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
  def bucketCounts(docs: DataFrame, nBuckets: Long): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 2)
      .select(col("doc_id"), col("lang"),
        explode(zip_with(
          slice(col("toks"), lit(1), col("n") - lit(1)),
          slice(col("toks"), lit(2), col("n") - lit(1)),
          (a, b) => concat_ws(" ", a, b))).as("g"))
      .withColumn("b",
        pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets)))
      .groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Score a batch of documents against the frozen ratio table:
    * (doc_id, lang, n_bigrams, score_ppm). Exact integer mean of the
    * doc's per-bigram bucket ratios — identical bits to the batch
    * x92 apply over the same rows. */
  def score(docs: DataFrame, ratio: DataFrame,
            nBuckets: Long = 4096L): DataFrame =
    bucketCounts(docs, nBuckets)
      .join(broadcast(ratio), Seq("b"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        expr("sum(cnt * r_ppm) div sum(cnt)").as("score_ppm"))

  /** Gate: accepted stream (score ≥ minScorePpm). Unscorable docs
    * (< 2 tokens) are rejected with their own reason — nothing drops
    * silently (the CurationPipeline side-output contract). */
  def accepted(docs: DataFrame, ratio: DataFrame, minScorePpm: Long,
               nBuckets: Long = 4096L): DataFrame =
    score(docs, ratio, nBuckets).filter(col("score_ppm") >= minScorePpm)

  /** Rejected stream with reasons: `low_score` or `unscorable`. */
  def rejected(docs: DataFrame, ratio: DataFrame, minScorePpm: Long,
               nBuckets: Long = 4096L): DataFrame = {
    val scored = score(docs, ratio, nBuckets)
    docs.select(col("doc_id"), col("lang"))
      .join(scored.select(col("doc_id"), col("score_ppm")),
        Seq("doc_id"), "left")
      .filter(col("score_ppm").isNull || col("score_ppm") < minScorePpm)
      .withColumn("reason",
        when(col("score_ppm").isNull, "unscorable").otherwise("low_score"))
      .select(col("doc_id"), col("lang"), col("reason"))
  }
}
