package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One fixed-length "audio" window's spectral feature: `f` packs the
  * window's top-two energy bands (`p1 * bands + p2`). */
final case class AudioFeature(doc_id: Long, t: Int, f: Int)

/** Audio landmark fingerprinting over media columns — the public
  * constellation-hash shape (Wang, "An Industrial-Strength Audio Search
  * Algorithm", ISMIR 2003): decode to a per-window spectral feature
  * sequence, pair each window's feature with the features of the next
  * `fanout` windows into landmark hashes `(f1, f2, Δt)`, and match
  * recordings by the number of landmark hashes they share. Landmarks
  * are TIME-DELTA keyed, so a shared segment matches wherever it sits
  * in either recording — the property positional checksums (x14's
  * frame sha256) lack.
  *
  * Decode is the documented STUB (no audio libs in this container): a
  * real build runs an FFT per window and takes the top spectrogram
  * peaks; the stub takes the top-two byte-class histogram bins of each
  * `window`-byte slice — like a real spectrum it is position-invariant
  * within the window and content-discriminative across windows, which
  * is all the downstream constellation machinery needs. Partition-local
  * (`mapPartitions`), no shuffle, real batch shape.
  *
  * 100 TB shape:
  *  - feature extraction is a narrow map over the media column;
  *  - landmark pairing is a per-key window (`lead` over doc_id) — one
  *    keyed shuffle, no self-join;
  *  - candidate pairs come from the landmark-hash inverted index
  *    (equi-join on `lh`, capped per bucket via
  *    [[Blocking.cappedBandPairs]] — never all-pairs);
  *  - the shared-landmark count verifies on candidates only, against
  *    per-doc fingerprint SETS whose size is bounded by media length.
  */
object AudioFingerprint {

  /** Stub "FFT": per `window`-byte slice, histogram byte values into
    * `bands` classes and keep the top-two bins (count desc, bin asc;
    * a single-bin window repeats its top bin). Trailing partial
    * windows are dropped — their histogram mass differs, so their
    * features would never be comparable across recordings anyway. */
  def windowFeatures(ds: Dataset[MediaIn], window: Int = 32,
                     bands: Int = 64): Dataset[AudioFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec/FFT setup would go here (once, not per row)
      it.flatMap { r =>
        val nWin = r.media.length / window
        (0 until nWin).iterator.map { t =>
          AudioFeature(r.doc_id, t, windowFeature(r.media, t, window, bands))
        }
      }
    }
  }

  /** One window's packed feature `p1 * bands + p2`: top-two OCCUPIED
    * histogram bins, count desc / bin asc — the same order the SQL
    * oracle's row_number ranks (its histogram only contains occupied
    * bins, so zero-count bins must never place here either); a
    * single-bin window repeats its top bin. Shared by the batch
    * feature table ([[windowFeatures]]) and the in-row landmark path
    * ([[landmarkRows]]) so the two routes cannot drift. */
  private def windowFeature(m: Array[Byte], t: Int, window: Int,
                            bands: Int): Int = {
    val hist = new Array[Int](bands)
    var i = t * window
    val end = i + window
    while (i < end) { hist((m(i) & 0xFF) % bands) += 1; i += 1 }
    var p1 = -1; var p2 = -1
    var b = 0
    while (b < bands) {
      val c = hist(b)
      if (c > 0) {
        if (p1 < 0 || c > hist(p1)) { p2 = p1; p1 = b }
        else if (p2 < 0 || c > hist(p2)) p2 = b
      }
      b += 1
    }
    if (p2 < 0) p2 = p1
    p1 * bands + p2
  }

  /** Per-doc DISTINCT landmark hash rows (doc_id, lh) computed IN-ROW
    * — same bits as `landmarks(windowFeatures(ds))` (spec-pinned), but
    * as a single narrow map with NO shuffle: every window of a
    * recording lives in that recording's one input row, so the
    * lead-pairing that the batch route prices as a keyed window runs
    * locally over the row's feature array. This is the shape the
    * STREAMING twin needs — window functions are not allowed upstream
    * of a streaming state operator — and the cheaper plan at any
    * scale when the media column is row-complete (the batch route
    * exists for pre-extracted feature tables). */
  def landmarkRows(ds: Dataset[MediaIn], window: Int = 32,
                   bands: Int = 64, fanout: Int = 3): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec/FFT setup would go here (once, not per row)
      it.flatMap { r =>
        landmarkSet(r.media, window, bands, fanout).map(lh => (r.doc_id, lh))
      }
    }.toDF("doc_id", "lh")
  }

  /** [[landmarkRows]] WITH the record's event time carried onto every
    * landmark row — (doc_id, lh, eventTime), the input the TTL'd
    * streaming AUDIO detector banding rides
    * ([[graft.streaming.StreamingMediaNearDup.audioWithTtl]]). Same
    * [[landmarkSet]] computation, so timed and untimed fingerprints
    * are bit-identical for the same blob. */
  def landmarkRowsWithTime(ds: Dataset[MediaInT], window: Int = 32,
                           bands: Int = 64, fanout: Int = 3): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition codec/FFT setup would go here (once, not per row)
      it.flatMap { r =>
        landmarkSet(r.media, window, bands, fanout)
          .map(lh => (r.doc_id, lh, r.eventTime))
      }
    }.toDF("doc_id", "lh", "eventTime")
  }

  /** One blob's DISTINCT landmark hash set, computed in-row — the
    * shared core of [[landmarkRows]] and [[landmarkRowsWithTime]]
    * (one definition, the two routes cannot drift). */
  private def landmarkSet(m: Array[Byte], window: Int, bands: Int,
                          fanout: Int): Iterator[Long] = {
    val fSpace = bands.toLong * bands
    val nWin = m.length / window
    val f = new Array[Int](nWin)
    var t = 0
    while (t < nWin) {
      f(t) = windowFeature(m, t, window, bands)
      t += 1
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Long]
    var a = 0
    while (a < nWin) {
      var dt = 1
      while (dt <= fanout && a + dt < nWin) {
        out += (f(a).toLong * fSpace + f(a + dt)) * (fanout + 1) + dt
        dt += 1
      }
      a += 1
    }
    out.iterator
  }

  /** Landmark hashes: each window's feature paired with the next
    * `fanout` windows' features, `lh = (f1 * bands² + f2) * (fanout+1)
    * + Δt`. DISTINCT per doc — the fingerprint is a set. The pairing is
    * `lead` over a per-doc window: keyed shuffle on doc_id, linear. */
  def landmarks(feats: Dataset[AudioFeature], fanout: Int = 3,
                bands: Int = 64): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("t"))
    val fSpace = bands.toLong * bands
    val withLeads = feats.toDF().select(
      col("doc_id") +: (1 to fanout).map(dt =>
        when(lead(col("f"), dt).over(w).isNotNull,
          (col("f").cast("long") * fSpace + lead(col("f"), dt).over(w)) *
            (fanout + 1) + dt).as(s"lh$dt")): _*)
    (1 to fanout).map(dt =>
        withLeads.select(col("doc_id"), col(s"lh$dt").as("lh")))
      .reduce(_.unionByName(_))
      .filter(col("lh").isNotNull)
      .distinct()
  }

  /** STOP-LANDMARK removal — the IDF analogue of Shazam's hash-entropy
    * pruning: a landmark carried by more than `maxDf` recordings says
    * nothing about any pair of them (a ubiquitous motif, silence, a
    * station jingle), it only inflates every shared count and turns its
    * inverted-index bucket into a hotspot. Dropping it from EVERY
    * fingerprint (not just from candidate generation) keeps the match
    * semantics symmetric and — when `maxDf ≤ [[Blocking.DefaultBlockCap]]`
    * — bounds every bucket by construction, so the capped join's
    * degrade path never fires and the match is exact at any corpus
    * size. One window count over the `lh` partitioning the downstream
    * join shuffles on anyway. */
  def rareLandmarks(lms: DataFrame, maxDf: Long): DataFrame =
    lms.withColumn("__df",
        count(lit(1)).over(Window.partitionBy(col("lh"))))
      .filter(col("__df") <= maxDf)
      .drop("__df")

  /** Matching pairs (doc_a < doc_b, `n_shared` = |shared landmark
    * set| ≥ `minShared`). Candidates ride the landmark inverted index
    * (capped equi-join); verification recomputes the exact shared count
    * from the attached per-doc fingerprint sets, so bucket caps and
    * hash-space collisions can only drop or add CANDIDATES, never
    * corrupt a reported count. */
  def matchPairs(lms: DataFrame, minShared: Long = 8,
                 cap: Int = Blocking.DefaultBlockCap): DataFrame = {
    val cand = Blocking.cappedBandPairs(
      lms.select(col("doc_id"), lit(0).as("band"),
        col("lh").as("k1"), lit(0L).as("k2")), cap)
    val sets = lms.groupBy(col("doc_id"))
      .agg(collect_set(col("lh")).as("fs"))
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("fs").as("fa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("fs").as("fb")), "doc_b")
      .withColumn("n_shared", size(array_intersect(col("fa"), col("fb"))).cast("long"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_a"), col("doc_b"), col("n_shared"))
  }
}
