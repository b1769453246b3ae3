package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.ops.{AudioFingerprint, MediaIn, Multimodal, PHash}

/** Continuous near-duplicate detection over MEDIA columns — the
  * streaming twin of the batch x87 (image pHash) / x88 (audio
  * landmark) / x89 (video frame-set) family, completing for the
  * multimodal pillar what [[StreamingNearDup]] + [[StreamingClusters]]
  * give text: dedup-at-ingest feeding the same edge journal and the
  * same star-contraction labels. Reference analogue: the continuous
  * DIM/DWD pipeline shape (app/dim/DimApp.java:93-99) — a keyed
  * stateful stage between parse and sink.
  *
  * All three detectors are one composition: a NARROW per-record map
  * producing banded key occupancy rows (stub decode, real plumbing —
  * the [[graft.ops.Multimodal]] contract), then
  * [[StreamingNearDup.fromBandRows]] — the ONE shared anchor state
  * machine (first occupant of a bucket anchors it; later arrivals emit
  * star candidates; state is one long per occupied bucket). Shared
  * machinery means every delivery/replay/label property proven for the
  * text twin holds here by construction, and the spec only has to pin
  * the per-modality key schemes.
  *
  * Candidate semantics vs the batch queries: the anchors emit the
  * STAR of each bucket (anchor ↔ each later arrival) where the batch
  * side emits all under-cap pairs — identical CONNECTIVITY per bucket,
  * so journaled components equal a batch recompute exactly
  * (StreamingMediaClustersSpec pins streamed labels ≡ batch-mode
  * detector labels, and that every batch-VERIFIED pair — x87 hamming,
  * x88 shared-landmark — lands inside one streamed cluster: banded
  * recall is pigeonhole-exact for pHash, df-bounded for landmarks).
  * Production verifies candidates downstream against the media store
  * (hamming / shared-count on candidate pairs only), exactly like the
  * text twin's exact-Jaccard note.
  *
  * Scale shape per modality (all: state ∝ live bucket diversity, not
  * event volume; one keyed shuffle on the band key):
  *  - image: 4 occupancy rows per record (the 16-bit aHash bands);
  *  - video: 4 rows per FRAME — no per-doc distinct (a stateful dedup
  *    cannot precede the state operator in one streaming query);
  *    duplicate rows only re-emit candidates the journal's pk dedup
  *    absorbs;
  *  - audio: one row per distinct landmark hash, computed in-row with
  *    no shuffle ([[AudioFingerprint.landmarkRows]]). The batch side's
  *    stop-landmark df-pruning is a global-corpus refinement a stream
  *    cannot price per event; a hot landmark bucket degrades to star
  *    emission (O(1) per arrival) structurally, and downstream
  *    verification owns precision either way.
  */
object StreamingMediaNearDup {

  /** Default watermark lateness for the TTL'd routes — the same small
    * nonzero bound [[BounceDetector]] defaults to. Rows arriving
    * later than this behind the max observed event time are DROPPED
    * before the anchor state op (quiet recall loss past the bound);
    * deployments pick their own lateness trade-off by passing
    * `watermarkDelay` explicitly. A zero default would silently drop
    * EVERY out-of-order record. */
  val DefaultWatermarkDelay = "2 seconds"

  /** Image route: media blobs → luminance planes (stub decode) →
    * 4×16-bit aHash band keys → anchor state. Matches x87's candidate
    * key scheme exactly ([[PHash.bandedHashes]]). */
  def image(media: Dataset[MediaIn], nBands: Int = 4): Dataset[DupCandidate] = {
    import media.sparkSession.implicits._
    val bands = PHash.bandedHashes(Multimodal.luminancePlane(media), nBands)
      .select(col("doc_id"), posexplode(col("bv")))
      .select(col("doc_id"), col("pos").cast("int").as("band"),
        col("col").as("k1"), lit(0L).as("k2"))
    StreamingNearDup.fromBandRows(bands.as[DocBand])
  }

  /** Image route with the TTL'd reingest-window semantics — the
    * bounded-state form a 100 TB/day deployment runs: a bucket's
    * anchor is forgotten once the WATERMARK passes its last sighting +
    * `ttl`, so state tracks the LIVE window's hash diversity, not the
    * corpus's history (the same contract as the text twin's
    * [[StreamingNearDup.withTtl]]). Unlike the text twin, the
    * WATERMARK is assigned HERE, on the band rows: the stub-decode
    * typed map mints a fresh `eventTime` attribute, so an upstream
    * `withWatermark` does not propagate through it (Spark tracks the
    * marker per attribute, and the state op requires it on ITS input
    * column). [[videoWithTtl]] / [[audioWithTtl]] assign theirs the
    * same way. Records later than `watermarkDelay` behind the max
    * observed event time are dropped before the state op
    * ([[DefaultWatermarkDelay]]). */
  def imageWithTtl(media: Dataset[graft.ops.MediaInT],
                   ttl: java.time.Duration,
                   watermarkDelay: String = DefaultWatermarkDelay,
                   nBands: Int = 4): Dataset[DupCandidate] = {
    import media.sparkSession.implicits._
    val bands = PHash.bandRowsWithTime(
        Multimodal.luminancePlaneT(media), nBands)
      .withWatermark("eventTime", watermarkDelay)
    StreamingNearDup.fromBandRowsWithTtl(bands.as[DocBandT], ttl)
  }

  /** Video route: media blobs → per-frame planes → per-frame 16-bit
    * band buckets ([[PHash.frameBucketRows]] — x89's candidate key
    * scheme) → anchor state. Shift-invariant like the batch query:
    * a shared segment collides wherever it sits in either stream. */
  def video(media: Dataset[MediaIn]): Dataset[DupCandidate] = {
    import media.sparkSession.implicits._
    val bands = PHash.frameBucketRows(Multimodal.framePlanes(media))
    StreamingNearDup.fromBandRows(bands.as[DocBand])
  }

  /** Video route with the TTL'd reingest-window semantics — the
    * bounded-state form that closes the last 100 TB/day hazard for
    * this modality: a frame-hash bucket's anchor is forgotten once
    * the WATERMARK passes its last sighting + `ttl`, so state tracks
    * the LIVE window's frame-hash diversity instead of the corpus's
    * full history, and a re-cut re-ingested after the window
    * re-anchors fresh. Watermark is assigned HERE, on the timed band
    * rows (the stub-decode typed map mints a fresh `eventTime`
    * attribute — same wrinkle as [[imageWithTtl]]); rows later than
    * `watermarkDelay` are dropped before the state op. */
  def videoWithTtl(media: Dataset[graft.ops.MediaInT],
                   ttl: java.time.Duration,
                   watermarkDelay: String = DefaultWatermarkDelay)
      : Dataset[DupCandidate] = {
    import media.sparkSession.implicits._
    val bands = PHash.frameBucketRowsWithTime(Multimodal.framePlanesT(media))
      .withWatermark("eventTime", watermarkDelay)
    StreamingNearDup.fromBandRowsWithTtl(bands.as[DocBandT], ttl)
  }

  /** Audio route: media blobs → in-row constellation landmark hashes
    * ([[AudioFingerprint.landmarkRows]], no shuffle) → one bucket per
    * landmark (x88's inverted-index key) → anchor state. */
  def audio(media: Dataset[MediaIn], window: Int = 32, bands: Int = 64,
            fanout: Int = 3): Dataset[DupCandidate] = {
    import media.sparkSession.implicits._
    val rows = AudioFingerprint.landmarkRows(media, window, bands, fanout)
      .select(col("doc_id"), lit(0).as("band"), col("lh").as("k1"),
        lit(0L).as("k2"))
    StreamingNearDup.fromBandRows(rows.as[DocBand])
  }

  /** Audio route with the TTL'd reingest-window semantics — a landmark
    * bucket's anchor is forgotten once the WATERMARK passes its last
    * sighting + `ttl`, bounding state to the live window's landmark
    * diversity (the unbounded accretion the untimed [[audio]] route
    * accepts is the one thing a continuous 100 TB/day deployment
    * cannot). Watermark is assigned on the timed landmark rows (the
    * in-row typed map mints `eventTime` fresh — same contract as
    * [[imageWithTtl]]/[[videoWithTtl]]); rows later than
    * `watermarkDelay` are dropped before the state op. */
  def audioWithTtl(media: Dataset[graft.ops.MediaInT],
                   ttl: java.time.Duration,
                   watermarkDelay: String = DefaultWatermarkDelay,
                   window: Int = 32, bands: Int = 64, fanout: Int = 3)
      : Dataset[DupCandidate] = {
    import media.sparkSession.implicits._
    val rows = AudioFingerprint
      .landmarkRowsWithTime(media, window, bands, fanout)
      .select(col("doc_id"), lit(0).as("band"), col("lh").as("k1"),
        lit(0L).as("k2"), col("eventTime"))
      .withWatermark("eventTime", watermarkDelay)
    StreamingNearDup.fromBandRowsWithTtl(rows.as[DocBandT], ttl)
  }
}
