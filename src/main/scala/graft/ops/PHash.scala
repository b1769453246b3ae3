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
  def bandedHashes(planes: Dataset[MediaPlane], nBands: Int = 4): DataFrame = {
    val cells = 64
    require(cells % nBands == 0, s"$nBands bands must divide $cells cells")
    val w = cells / nBands
    require(w <= 62, "band wider than a positive long")
    def bandVal(j: Int) =
      (0 until w).map { i =>
        when(element_at(col("g"), j * w + i + 1).cast("long") * cells >
          col("n"), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
    planes.toDF().select(col("doc_id"),
      array((0 until nBands).map(j => bandVal(j)): _*).as("bv"))
  }

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
}
