package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus curation — the x25 batch pipeline as a continuous
  * ingest path: quality gates run as pushed-down narrow filters, then
  * content-fingerprint dedup via the built-in watermark-bounded
  * streaming dedup (state is one fingerprint per in-flight window, NOT
  * the whole corpus — the property that keeps continuous dedup viable
  * at 100 TB/day; historical dedup stays a batch x01 pass over the
  * lake). Rejections flow to their own sink like the reference's dirty
  * side output (BaseLogApp.java:46-62), so nothing is silently dropped.
  *
  * Input schema: (ts TIMESTAMP, doc_id LONG, lang STRING, text STRING).
  */
object CurationPipeline {

  private def withQuality(docs: DataFrame, langs: Seq[String],
                          minToks: Int): DataFrame =
    docs
      .withColumn("n_toks", size(split(col("text"), " ")))
      // coalesce to false: a NULL lang/text makes both gate predicates
      // NULL, and a NULL filter drops the row from clean AND rejected —
      // the silent loss the side output exists to prevent
      .withColumn("ok_lang", coalesce(col("lang").isin(langs: _*), lit(false)))
      .withColumn("ok_len", coalesce(col("n_toks") >= minToks, lit(false)))

  /** Accepted stream: quality-gated, first copy per normalized-content
    * fingerprint within the watermark horizon. `keep` names extra
    * input columns to carry through (e.g. `text` for a downstream
    * stage that re-reads the content — the [[StreamingFunnel]] shape). */
  def clean(docs: DataFrame, langs: Seq[String], minToks: Int,
            watermark: String, keep: Seq[String] = Nil): DataFrame =
    withQuality(docs, langs, minToks)
      .filter(col("ok_lang") && col("ok_len"))
      .withColumn("fingerprint", graft.queries.Q.normFingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select((Seq("ts", "doc_id", "lang", "n_toks", "fingerprint") ++ keep)
        .map(col): _*)

  /** Rejected stream (dirty side output analogue): every gated-out doc
    * with the reason attached. Duplicates are NOT here — they are
    * dropped by dedup state, which cannot re-emit them. */
  def rejected(docs: DataFrame, langs: Seq[String],
               minToks: Int): DataFrame =
    withQuality(docs, langs, minToks)
      .filter(!col("ok_lang") || !col("ok_len"))
      .select(col("doc_id"), col("lang"),
        when(!col("ok_lang"), "lang").otherwise("too_short").as("reason"))
}
