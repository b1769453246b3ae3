package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash near-duplicate detection over media columns — the
  * public average-hash (aHash) shape: a fixed-size luminance plane per
  * record ([[Multimodal.luminancePlane]]; a real decoder yields an 8×8
  * grayscale downscale), one bit per cell thresholded at the plane
  * MEAN, near-dups = pairs within a small Hamming distance of the
  * packed bit hash.
  *
  * Built for the 100 TB shape like every dedup operator here:
  *  - hashing is a NARROW MAP (the threshold compare `g(i)·cells > n`
  *    is integer-exact — no double mean, so the SQL oracle matches
  *    bit-for-bit);
  *  - candidates come from a BANDED equi-join, never all-pairs: the
  *    64-bit hash splits into `nBands` contiguous bands, and by
  *    pigeonhole two hashes within Hamming distance `maxHamming <
  *    nBands` agree EXACTLY on at least one band — so the band join
  *    has full recall at the threshold (a spec-pinned guarantee, not a
  *    probabilistic one like MinHash banding);
  *  - oversized band buckets (boilerplate media) degrade to star pairs
  *    through [[Blocking.cappedBandPairs]] instead of |bucket|² —
  *    identical output while every bucket holds ≤ cap records;
  *  - Hamming verification runs only on surviving candidates, as a
  *    static per-band `bit_count(xor)` sum over the attached hash
  *    arrays — no re-scan, no explode.
  */
object PHash {

  /** Per-record packed aHash bands from luminance planes: one row of
    * (doc_id, bv) where `bv(j)` packs plane cells `[j·w, (j+1)·w)` as
    * bits (bit i of band j = cell `j·w+i` strictly above the plane
    * mean — ties BELOW, matching `cnt·cells > n`). A pure map: the
    * whole 64-term threshold compare is statically unrolled, no
    * higher-order functions on the hot path. */
  /** The packed band-value expressions over `g`/`n` columns — shared by
    * the whole-record hash ([[bandedHashes]]) and the per-frame hash
    * ([[frameHashKeys]]). Band j packs plane cells `[j·w, (j+1)·w)` as
    * bits (bit i = cell strictly above the plane mean — ties BELOW,
    * i.e. `cnt·cells > n`, integer-exact so SQL oracles match bit-for-
    * bit). */
  private def bandVals(nBands: Int): IndexedSeq[org.apache.spark.sql.Column] = {
    val cells = 64
    require(cells % nBands == 0, s"$nBands bands must divide $cells cells")
    val w = cells / nBands
    require(w <= 62, "band wider than a positive long")
    (0 until nBands).map { j =>
      (0 until w).map { i =>
        when(element_at(col("g"), j * w + i + 1).cast("long") * cells >
          col("n"), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
  }

  def bandedHashes(planes: Dataset[MediaPlane], nBands: Int = 4): DataFrame =
    planes.toDF().select(col("doc_id"), array(bandVals(nBands): _*).as("bv"))

  /** The whole-record aHash band occupancy rows WITH event time —
    * (doc_id, band, k1, k2 = 0, eventTime), the
    * [[graft.streaming.StreamingNearDup.fromBandRowsWithTtl]] input
    * shape for the TTL'd image detector. Same [[bandVals]] packing as
    * [[bandedHashes]], so timed and untimed keys are bit-identical. */
  def bandRowsWithTime(planes: Dataset[MediaPlaneT],
                       nBands: Int = 4): DataFrame =
    planes.toDF()
      .select(col("doc_id"), col("eventTime"),
        posexplode(array(bandVals(nBands): _*)))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("k1"), lit(0L).as("k2"), col("eventTime"))

  /** Near-duplicate pairs (doc_a < doc_b) within `maxHamming` of the
    * 64-bit aHash, with the exact distance attached. `maxHamming <
    * nBands` is REQUIRED — it is what makes the banded candidate join
    * exact (pigeonhole: ≤ maxHamming differing bits cannot touch all
    * `nBands` bands). Plan shape: map (hash) → banded equi-join
    * (capped) → broadcast-scale verify join → filter. */
  def neardupPairs(planes: Dataset[MediaPlane], maxHamming: Int = 3,
                   nBands: Int = 4,
                   cap: Int = Blocking.DefaultBlockCap): DataFrame = {
    require(maxHamming < nBands,
      s"maxHamming=$maxHamming needs at least ${maxHamming + 1} bands " +
      s"for exact banded recall (got $nBands)")
    val hs = bandedHashes(planes, nBands)
    val bands = hs.select(col("doc_id"), posexplode(col("bv")))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("k1"),
        lit(0L).as("k2"))
    val cand = Blocking.cappedBandPairs(bands, cap)
    val hamming = (0 until nBands).map(j =>
        bit_count(element_at(col("ba"), j + 1)
          .bitwiseXOR(element_at(col("bb"), j + 1))))
      .reduce(_ + _).cast("long")
    cand
      .join(hs.select(col("doc_id").as("doc_a"), col("bv").as("ba")), "doc_a")
      .join(hs.select(col("doc_id").as("doc_b"), col("bv").as("bb")), "doc_b")
      .withColumn("hamming", hamming)
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Per-frame perceptual-hash keys for the VIDEO near-dup path: each
    * frame's 64-bit aHash packed as two 32-bit-range longs
    * `(k1, k2) = (b0·2¹⁶ + b1, b2·2¹⁶ + b3)` — two keys instead of one
    * so the SQL oracle never multiplies past 2⁶³, and exactly the
    * `(k1, k2)` shape [[Blocking.cappedBandPairs]] buckets on. DISTINCT
    * per doc: the video's fingerprint is its SET of frame hashes, which
    * is what makes the match shift-invariant (a re-cut or prepended
    * intro moves frame indices but not their hashes). */
  def frameHashKeys(planes: Dataset[FramePlane]): DataFrame = {
    val bv = bandVals(nBands = 4)
    planes.toDF()
      .select(col("doc_id"),
        (bv(0) * 65536L + bv(1)).as("k1"),
        (bv(2) * 65536L + bv(3)).as("k2"))
      .distinct()
  }

  /** The per-frame 16-bit band-bucket occupancy rows
    * (doc_id, band ∈ 0..3, k1 = bucket value, k2 = 0) — the candidate
    * key scheme [[videoNeardupPairs]] blocks on, WITHOUT the per-doc
    * distinct. The streaming twin needs this shape: a stateful
    * dedup aggregation cannot precede the anchor state operator in
    * one streaming query, and duplicate occupancy rows are harmless
    * there — they can only re-emit a candidate pair the edge
    * journal's pk dedup absorbs, never change connectivity. Batch
    * callers keep using [[frameHashKeys]] + [[videoNeardupPairs]],
    * whose distinct trims the band join's input. Pure narrow map. */
  def frameBucketRows(planes: Dataset[FramePlane]): DataFrame = {
    val bv = bandVals(nBands = 4)
    planes.toDF()
      .select(col("doc_id"),
        (bv(0) * 65536L + bv(1)).as("k1"),
        (bv(2) * 65536L + bv(3)).as("k2"))
      .select(col("doc_id"),
        posexplode(array(
          shiftright(col("k1"), 16), col("k1").bitwiseAND(65535L),
          shiftright(col("k2"), 16), col("k2").bitwiseAND(65535L))))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("k1"), lit(0L).as("k2"))
  }

  /** [[frameBucketRows]] WITH each frame's record event time —
    * (doc_id, band, k1, k2, eventTime), the
    * [[graft.streaming.StreamingNearDup.fromBandRowsWithTtl]] input
    * shape for the TTL'd VIDEO detector. Same [[bandVals]] packing and
    * 16-bit slicing, so timed and untimed bucket keys are
    * bit-identical for the same frame. */
  def frameBucketRowsWithTime(planes: Dataset[FramePlaneT]): DataFrame = {
    val bv = bandVals(nBands = 4)
    planes.toDF()
      .select(col("doc_id"), col("eventTime"),
        (bv(0) * 65536L + bv(1)).as("k1"),
        (bv(2) * 65536L + bv(3)).as("k2"))
      .select(col("doc_id"), col("eventTime"),
        posexplode(array(
          shiftright(col("k1"), 16), col("k1").bitwiseAND(65535L),
          shiftright(col("k2"), 16), col("k2").bitwiseAND(65535L))))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("k1"), lit(0L).as("k2"), col("eventTime"))
  }

  /** Video near-duplicate pairs (doc_a < doc_b) by HAMMING-TOLERANT
    * mutual frame coverage. Exact frame-hash equality is the wrong
    * match unit — per-frame noise (a lossy re-encode) flips a couple of
    * threshold-adjacent aHash bits in most frames, so two copies of the
    * same video would share almost no exact hashes. Instead two frames
    * MATCH when their 64-bit aHashes are within `maxHamming`, and two
    * videos near-dup by mutual coverage `cover_ppm = 1e6·(mA+mB)/
    * (nA+nB)`, where mA = |a's distinct frame hashes with a
    * ≤ maxHamming match in b| (symmetrically mB), nA/nB the
    * distinct-hash counts.
    *
    * Plan shape — the same contract as every dedup operator here:
    *  - `(k1, k2)` pack the 4 aHash bands bit-aligned, so frame hamming
    *    is `bit_count(k1a⊕k1b) + bit_count(k2a⊕k2b)` — no arrays on the
    *    candidate path;
    *  - CANDIDATE doc pairs come from the 16-bit band buckets through
    *    [[Blocking.cappedBandPairs]] (pigeonhole: two frames within
    *    `maxHamming < 4` agree exactly on some band, so their docs
    *    share that bucket — full recall at the threshold; boilerplate
    *    buckets degrade to star pairs, never |bucket|²);
    *  - VERIFICATION runs only on candidates, against attached per-doc
    *    hash-set arrays (bounded by frame count): the coverage counts
    *    are exact regardless of bucket caps or collisions. */
  def videoNeardupPairs(planes: Dataset[FramePlane],
                        maxHamming: Int = 3,
                        minCoverPpm: Long = 500000L,
                        cap: Int = Blocking.DefaultBlockCap): DataFrame = {
    require(maxHamming < 4,
      s"maxHamming=$maxHamming needs more than the 4 bands the two-key " +
      "packing carries for exact banded recall")
    val fh = frameHashKeys(planes) // distinct (doc_id, k1, k2)
    // per-doc distinct band-bucket memberships — bit-aligned slices
    val buckets = fh.select(col("doc_id"),
        posexplode(array(
          shiftright(col("k1"), 16), col("k1").bitwiseAND(65535L),
          shiftright(col("k2"), 16), col("k2").bitwiseAND(65535L))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("k1"),
        lit(0L).as("k2"))
      .distinct()
    val cand = Blocking.cappedBandPairs(buckets, cap)
    val sets = fh.groupBy(col("doc_id"))
      .agg(collect_set(struct(col("k1"), col("k2"))).as("fs"))
    // coverage counts via the compiled kernel — ONE fused O(|fa|·|fb|)
    // pass per candidate pair (the equivalent size(filter(exists))
    // HOF form evaluates interpreted and walks the cross product twice;
    // at the ×10 media-scale probe's 3.7M candidates its pre-JIT first
    // run paid 60 s vs 5.5 s steady — see functions.HammingCoverCounts)
    val cover = org.apache.spark.sql.GraftPlanBridge.col(
      graft.functions.HammingCoverCounts(
        org.apache.spark.sql.GraftPlanBridge.expr(col("fa")),
        org.apache.spark.sql.GraftPlanBridge.expr(col("fb")),
        maxHamming))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("fs").as("fa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("fs").as("fb")), "doc_b")
      .withColumn("__cov", cover)
      .withColumn("cover_ppm",
        round(lit(1e6) * (col("__cov.ma") + col("__cov.mb")) /
          (size(col("fa")) + size(col("fb")))).cast("long"))
      .filter(col("cover_ppm") >= minCoverPpm)
      .select(col("doc_a"), col("doc_b"), col("cover_ppm"))
  }
}
