package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared MinHash+LSH machinery — word-trigram shingles, one md5 per
  * shingle folded to a 60-bit int, K XOR-seeded minhashes, B banded
  * keys — used by the batch near-dup pipeline (queries.Extensions x02/
  * x28/x36/x37) and the continuous form (streaming.StreamingNearDup).
  * One definition so the streaming detector provably buckets exactly
  * like the batch pass: a pair the batch pipeline would pair can never
  * be missed by the stream for hashing reasons.
  *
  * Everything here is a NARROW MAP over the doc grain — band
  * generation never shuffles, so it runs identically inside a
  * micro-batch and a 100 TB batch scan; only the downstream candidate
  * join (batch) or keyed state lookup (streaming) is wide.
  */
object MinHash {
  val K = 8 // minhash functions
  val B = 4 // bands (rows per band r = K/B = 2)

  /** Fixed 60-bit XOR seeds (golden-ratio multiples). */
  val Seeds: Seq[Long] =
    (0 until K).map(i => (0x9E3779B97F4A7C15L * (i + 1)) & 0x0FFFFFFFFFFFFFFFL)

  /** Word-trigram shingle builder over a `toks` array column — zip_with
    * over shifted slices, with greatest(size-2, 0) bounds so 0/1/2-token
    * docs yield an empty array instead of descending sequence crashes.
    * (See Extensions.shingleHashes for the full performance rationale.) */
  val TrigramExpr: String =
    "zip_with(zip_with(" +
    "slice(toks, 1, greatest(size(toks) - 2, 0)), " +
    "slice(toks, 2, greatest(size(toks) - 2, 0)), (x, y) -> concat(x, '_', y)), " +
    "slice(toks, 3, greatest(size(toks) - 2, 0)), (x, y) -> concat(x, '_', y))"

  /** Per-doc packed distinct shingle-hash array: (doc_id, hs ARRAY<LONG>).
    * Docs with no shingle (under 3 tokens) are dropped — they have no
    * minhash signature. Runs on the native fused
    * [[graft.functions.ShingleHashes]] expression (one token pass, one
    * md5 per distinct shingle, no hex round-trip) — bit parity with
    * [[TrigramExpr]]'s interpreted chain is pinned by MinHashSigSpec. */
  def shingleHashes(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val carried = carry.map(col)
    docs
      .select(col(idCol).as("doc_id") +:
        split(lower(col(textCol)), " ").as("toks") +: carried: _*)
      .select(col("doc_id") +: GraftPlanBridge.col(graft.functions.ShingleHashes(
        GraftPlanBridge.expr(col("toks")))).as("hs") +: carried: _*)
      .filter(size(col("hs")) > 0)
  }

  /** K XOR-permuted minhashes folded into B banded keys per doc —
    * (doc_id, band, k1, k2), one row per band. The K minima come from
    * ONE pass over the hash array ([[graft.functions.MinHashSig]])
    * instead of K array_min(transform(...)) walks. */
  def bands(hs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.GraftPlanBridge
    val carried = carry.map(col)
    val sig = hs.select(col("doc_id") +: GraftPlanBridge.col(
      graft.functions.MinHashSig(GraftPlanBridge.expr(col("hs")), Seeds))
      .as("sig") +: carried: _*)
    sig.select(col("doc_id") +: explode(array(
      (0 until B).map(b => struct(lit(b).as("band"),
        col("sig").getItem(2 * b).as("k1"),
        col("sig").getItem(2 * b + 1).as("k2"))): _*)).as("bb") +: carried: _*)
      .select(col("doc_id") +: col("bb.band").as("band") +:
        col("bb.k1").as("k1") +: col("bb.k2").as("k2") +: carried: _*)
  }

  /** docs → band-key rows in one call (the streaming entry point).
    * `carry` names extra columns to pass through untouched (e.g. an
    * event-time column for TTL'd streaming state). */
  def bandRows(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text",
               carry: Seq[String] = Nil): DataFrame =
    bands(shingleHashes(docs, idCol, textCol, carry), carry)
}
