package graft

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{AudioFingerprint, MediaIn, Multimodal, PHash}
import graft.streaming.{DupCandidate, StreamingClusters, StreamingMediaNearDup}

/** End-to-end streaming MEDIA dedup clustering — the multimodal twin
  * of [[StreamingClustersSpec]]: media blobs → per-modality banded
  * anchors ([[StreamingMediaNearDup]] image/video/audio) →
  * [[StreamingClusters]] edge journal → labels-on-read. Pins, per
  * modality:
  *  1. streamed labels ≡ a batch recompute through the same detector
  *     (arrival-order anchors vs min-doc anchors — different star
  *     centers, identical connectivity, identical component minima);
  *  2. every batch-VERIFIED pair (x87 hamming / x89 coverage / x88
  *     shared-landmark) lands inside ONE streamed cluster — banded
  *     recall survives the streaming re-expression;
  *  3. at-least-once re-delivery leaves labels unchanged.
  * Plus the audio in-row landmark path's bit-parity with the batch
  * window/lead route it replaces on the streaming side.
  */
class StreamingMediaClustersSpec extends AnyFunSuite with Matchers
    with SparkFixture {

  private def blob(text: String): Array[Byte] =
    text.getBytes(StandardCharsets.US_ASCII)

  /** ≥64-byte ASCII "media": near-dups share the byte-trigram
    * histogram (tiny tail edits), unrelated blobs have disjoint
    * character distributions. */
  private val baseA =
    Seq.tabulate(40)(i => s"aa${i % 7}bb").mkString(" ")           // ~200 B
  private val baseB =
    Seq.tabulate(40)(i => s"zz${i % 5}qq").mkString(" ")
  private def unrelated(id: Long): MediaIn =
    MediaIn(id, blob(Seq.tabulate(40)(j => f"x${(id * 31 + j * 7) % 97}%02d")
      .mkString("~")))

  private def labelMap(store: String): Map[Long, Long] = {
    val l = StreamingClusters.labels(spark, store)
    val m = l.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    l.unpersist()
    m
  }

  /** Stream `batches` through `detector`, journaling candidates; then
    * assert labels ≡ batch recompute through the same detector over
    * the union, and that replaying the last batch changes nothing. */
  private def pinTwin(
      detector: Dataset[MediaIn] => Dataset[DupCandidate],
      batches: Seq[Seq[MediaIn]], tag: String): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val store = Files.createTempDirectory(s"media-$tag").toString + "/edges"
    val chk = Files.createTempDirectory(s"media-$tag-chk").toString
    val mem = MemoryStream[MediaIn]
    val q = detector(mem.toDS()).toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch(StreamingClusters.updateBatch(store) _)
      .start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = labelMap(store)

    // batch recompute: same detector, batch mode (full corpus in one
    // call per bucket) → star contraction — must give the same labels
    val all = batches.flatten.toDS()
    val batchLabels = {
      val edges = detector(all).toDF()
        .select($"keeperId".as("a"), $"dupId".as("b"))
      val l = graft.ops.ConnectedComponents.starContraction(edges)
      val m = l.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      l.unpersist()
      m
    }
    streamed shouldBe batchLabels

    // at-least-once re-delivery of the last batch: journal overwrites
    // itself, labels frozen
    val replay = detector(batches.last.toDS()).toDF()
    StreamingClusters.updateBatch(store)(replay,
      batchId = batches.size - 1L)
    labelMap(store) shouldBe streamed
    streamed
  }

  /** Every verified (doc_a, doc_b) pair must share a streamed label. */
  private def pinVerifiedCoCluster(pairs: Array[(Long, Long)],
                                   labels: Map[Long, Long]): Unit = {
    pairs should not be empty // a vacuous recall pin proves nothing
    pairs.foreach { case (a, b) =>
      labels.getOrElse(a, a) shouldBe labels.getOrElse(b, b)
    }
  }

  test("image twin: streamed pHash labels equal batch recompute; " +
       "x87-verified pairs co-cluster; replay is a no-op") {
    val s = spark
    import s.implicits._
    val b1 = Seq(MediaIn(0, blob(baseA)), MediaIn(1, blob(baseA + " t1")),
      unrelated(7))
    val b2 = Seq(MediaIn(2, blob(baseA + " t2")), MediaIn(8, blob(baseB)),
      MediaIn(9, blob(baseB + " e")))
    val labels = pinTwin(StreamingMediaNearDup.image(_), Seq(b1, b2), "img")
    // near-identical blobs collide in every aHash band → {0,1,2} one
    // cluster (min id 0), {8,9} another
    labels.getOrElse(1L, -1L) shouldBe 0L
    labels.getOrElse(2L, -1L) shouldBe 0L
    labels.getOrElse(9L, -1L) shouldBe 8L
    labels.keySet should not contain 7L

    val verified = PHash
      .neardupPairs(Multimodal.luminancePlane((b1 ++ b2).toDS()),
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pinVerifiedCoCluster(verified, labels)
  }

  test("video twin: streamed frame-bucket labels equal batch recompute; " +
       "x89-verified pairs co-cluster — including a shifted re-cut") {
    val s = spark
    import s.implicits._
    // ≥3 frames each (frameBytes = 100); doc 11 = doc 10 with a
    // PREPENDED intro (frame hashes shift position but not value —
    // the shift-invariance x89 exists for)
    val movie = baseA + " " + baseB + " " + baseA + " tailtailtail"
    val b1 = Seq(MediaIn(10, blob(movie)),
      MediaIn(11, blob("intro! " + movie)), unrelated(17))
    val b2 = Seq(MediaIn(12, blob(movie + " extra")), unrelated(18))
    val labels = pinTwin(StreamingMediaNearDup.video(_), Seq(b1, b2), "vid")
    labels.getOrElse(11L, -1L) shouldBe 10L

    val verified = PHash
      .videoNeardupPairs(Multimodal.framePlanes((b1 ++ b2).toDS()),
        maxHamming = 3, minCoverPpm = 500000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pinVerifiedCoCluster(verified, labels)
  }

  test("imageWithTtl: media anchors expire with the watermark and " +
       "re-ingest re-anchors — bounded state for the 100 TB window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    val mem = MemoryStream[graft.ops.MediaInT]
    val q = StreamingMediaNearDup
      .imageWithTtl(mem.toDS(), java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("mediattl_out")
      .outputMode("append").start()
    try {
      // inside the window: doc 1 flags against anchor 0
      mem.addData(graft.ops.MediaInT(0, blob(baseA), ts(0)))
      q.processAllAvailable()
      mem.addData(graft.ops.MediaInT(1, blob(baseA + " t"), ts(5)))
      q.processAllAvailable()
      // unrelated traffic drives the watermark past lastSeen + ttl
      mem.addData(graft.ops.MediaInT(50, unrelated(50).media, ts(60)))
      q.processAllAvailable()
      mem.addData(graft.ops.MediaInT(51, unrelated(51).media, ts(61)))
      q.processAllAvailable()
      // after the window: doc 2 re-anchors (no flag against expired 0),
      // doc 3 then flags against 2
      mem.addData(graft.ops.MediaInT(2, blob(baseA), ts(62)))
      q.processAllAvailable()
      mem.addData(graft.ops.MediaInT(3, blob(baseA + " u"), ts(63)))
      q.processAllAvailable()
    } finally q.stop()
    // restrict to the baseA family: the unrelated watermark-driver
    // blobs can legitimately band-collide with each other (dense aHash
    // buckets — all-zero bands — the very effect x87's cap handles);
    // candidates are unverified by design
    val fam = Set(0L, 1L, 2L, 3L)
    val pairs = s.table("mediattl_out").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2))
      .filter(p => fam(p._1) || fam(p._2)).toSet
    // (0,1) inside the window; (2,3) after re-anchor — and nothing
    // across the expired window (no (0,2)/(0,3)/(1,2)/(1,3))
    pairs shouldBe Set((0L, 1L), (2L, 3L))
  }

  /** Shared TTL pin for the timed media routes: detection inside the
    * reingest window, anchor expiry once unrelated traffic drives the
    * watermark past lastSeen + ttl, and a fresh re-anchor after — the
    * bounded-state contract per modality. Asserts over family×family
    * pairs only (candidates are unverified by design; dense stub-hash
    * buckets can legitimately collide across unrelated blobs). */
  private def pinTtlWindow(
      detector: Dataset[graft.ops.MediaInT] => Dataset[DupCandidate],
      blobs: Long => Array[Byte], queryName: String): Unit = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    val mem = MemoryStream[graft.ops.MediaInT]
    val q = detector(mem.toDS())
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append").start()
    try {
      // inside the window: doc 1 flags against anchor 0
      mem.addData(graft.ops.MediaInT(0, blobs(0), ts(0)))
      q.processAllAvailable()
      mem.addData(graft.ops.MediaInT(1, blobs(1), ts(5)))
      q.processAllAvailable()
      // unrelated traffic drives the watermark past lastSeen + ttl
      mem.addData(graft.ops.MediaInT(50, unrelated(50).media, ts(60)))
      q.processAllAvailable()
      mem.addData(graft.ops.MediaInT(51, unrelated(51).media, ts(61)))
      q.processAllAvailable()
      // after the window: doc 2 re-anchors (no flag against expired 0),
      // doc 3 then flags against 2
      mem.addData(graft.ops.MediaInT(2, blobs(2), ts(62)))
      q.processAllAvailable()
      mem.addData(graft.ops.MediaInT(3, blobs(3), ts(63)))
      q.processAllAvailable()
    } finally q.stop()
    val fam = Set(0L, 1L, 2L, 3L)
    val pairs = s.table(queryName).as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2))
      .filter(p => fam(p._1) && fam(p._2)).toSet
    // (0,1) inside the window; (2,3) after re-anchor — and nothing
    // across the expired window (no (0,2)/(0,3)/(1,2)/(1,3))
    pairs shouldBe Set((0L, 1L), (2L, 3L))
  }

  test("videoWithTtl: frame-bucket anchors expire with the watermark " +
       "and re-ingest re-anchors — bounded state for the 100 TB window") {
    // ≥3 full frames (frameBytes = 100); suffix edits keep every
    // shared frame byte-identical → identical bucket keys
    val movie = baseA + " " + baseB + " " + baseA + " tailtailtail"
    pinTtlWindow(
      StreamingMediaNearDup.videoWithTtl(_, java.time.Duration.ofMinutes(10)),
      id => blob(if (id <= 1) movie + ("!" * id.toInt)
                 else movie + " cut" + ("!" * (id.toInt - 2))),
      "vidttl_out")
  }

  test("audioWithTtl: landmark anchors expire with the watermark and " +
       "re-ingest re-anchors — bounded state for the 100 TB window") {
    pinTtlWindow(
      StreamingMediaNearDup.audioWithTtl(_, java.time.Duration.ofMinutes(10)),
      id => blob(if (id <= 1) baseA * 3 + ("!" * (32 * id.toInt))
                 else baseA * 3 + " post" + ("!" * (32 * (id.toInt - 2)))),
      "audttl_out")
  }

  test("audio twin: in-row landmarkRows ≡ batch landmarks(windowFeatures) " +
       "bit-for-bit; streamed labels equal batch recompute; x88-matched " +
       "pairs co-cluster") {
    val s = spark
    import s.implicits._
    val b1 = Seq(MediaIn(20, blob(baseA * 3)),
      MediaIn(21, blob("pre " + baseA * 3)), unrelated(27))
    val b2 = Seq(MediaIn(22, blob(baseA * 3 + " post")), unrelated(28))
    val corpus = (b1 ++ b2).toDS()

    // the two landmark routes must agree exactly, per doc
    val inRow = AudioFingerprint.landmarkRows(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaWindow = AudioFingerprint
      .landmarks(AudioFingerprint.windowFeatures(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    inRow shouldBe viaWindow

    val labels = pinTwin(StreamingMediaNearDup.audio(_), Seq(b1, b2), "aud")
    labels.getOrElse(21L, -1L) shouldBe 20L

    // x88's verified matches (stop-landmarks pruned, shared-count
    // threshold) ride landmark buckets the stream also keys on →
    // every matched pair co-clusters
    val lms = AudioFingerprint.landmarks(
      AudioFingerprint.windowFeatures(corpus))
    val verified = AudioFingerprint
      .matchPairs(AudioFingerprint.rareLandmarks(lms, maxDf = 16L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pinVerifiedCoCluster(verified, labels)
  }
}
