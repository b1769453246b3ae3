package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{AudioFingerprint, MediaIn, Multimodal, PHash}

/** Pins the audio landmark fingerprint (x88) and the video frame-set
  * near-dup (x89):
  *  - SHIFT-INVARIANCE — the property both operators exist for: a
  *    recording embedded at a different offset still matches (x14's
  *    positional checksums provably do not survive this);
  *  - bit-for-bit parity with independent driver-side references of
  *    the full pipelines (including the top-two tie order the SQL
  *    oracle's row_number ranking implies);
  *  - single-frame edit robustness for the video path;
  *  - bucket-locality: no cartesian product, oversized buckets degrade
  *    to star pairs through the cap.
  */
class MediaNearDupSpec extends AnyFunSuite with Matchers with SparkFixture {

  /** Deterministic pseudo-random binary blobs — the ops layer works on
    * raw bytes (only the SQL oracle needs ASCII). */
  private def blob(seed: Long, n: Int): Array[Byte] = {
    val r = new java.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  // ------------------------------------------------------------------
  // independent references
  // ------------------------------------------------------------------

  /** Reference window features: top-two occupied bins by (count desc,
    * bin asc) — sort-based, unlike the operator's single-pass scan. */
  private def refFeatures(bytes: Array[Byte], window: Int = 32,
                          bands: Int = 64): Seq[Int] =
    (0 until bytes.length / window).map { t =>
      val hist = new Array[Int](bands)
      for (i <- t * window until (t + 1) * window)
        hist((bytes(i) & 0xFF) % bands) += 1
      val occupied = (0 until bands).filter(hist(_) > 0)
        .sortBy(b => (-hist(b), b))
      val p1 = occupied.head
      val p2 = if (occupied.size > 1) occupied(1) else p1
      p1 * bands + p2
    }

  private def refLandmarks(bytes: Array[Byte]): Set[Long] = {
    val f = refFeatures(bytes)
    (for {
      t <- f.indices; dt <- 1 to 3 if t + dt < f.size
    } yield (f(t).toLong * 4096L + f(t + dt)) * 4L + dt).toSet
  }

  /** Reference mutual-coverage score in ppm: frames match within
    * hamming ≤ 3 (the banded join is pigeonhole-exact there, so plain
    * all-pairs hamming IS the expected semantics). */
  private def refCoverPpm(fa: Set[(Long, Long)], fb: Set[(Long, Long)]): Long = {
    def ham(x: (Long, Long), y: (Long, Long)) =
      java.lang.Long.bitCount(x._1 ^ y._1) + java.lang.Long.bitCount(x._2 ^ y._2)
    val ma = fa.count(x => fb.exists(y => ham(x, y) <= 3))
    val mb = fb.count(y => fa.exists(x => ham(x, y) <= 3))
    math.round(1e6 * (ma + mb) / (fa.size + fb.size))
  }

  /** Reference per-frame aHash keys (k1, k2) — the integer
    * mean-threshold over the frame's byte-trigram plane. */
  private def refFrameKeys(bytes: Array[Byte], frameBytes: Int = 100): Set[(Long, Long)] =
    (0 until bytes.length / frameBytes).map { idx =>
      val g = new Array[Int](64)
      for (i <- idx * frameBytes until (idx + 1) * frameBytes - 2)
        g(((bytes(i) & 0xFF) * 961 + (bytes(i + 1) & 0xFF) * 31 +
          (bytes(i + 2) & 0xFF)) % 64) += 1
      val n = frameBytes - 2
      val bits = (0 until 64).map(c => if (g(c).toLong * 64 > n) 1L else 0L)
      def band(j: Int) = (0 until 16).map(i => bits(j * 16 + i) << i).sum
      (band(0) * 65536L + band(1), band(2) * 65536L + band(3))
    }.toSet

  // ------------------------------------------------------------------
  // audio (x88)
  // ------------------------------------------------------------------

  test("audio: landmark set matches the independent reference exactly " +
       "(window features, top-two tie order, (f1,f2,dt) packing)") {
    val s = spark
    import s.implicits._
    val docs = Seq(1L -> blob(1, 700), 2L -> blob(2, 333), 3L -> blob(3, 64))
    val got = AudioFingerprint.landmarks(AudioFingerprint.windowFeatures(
        docs.map { case (id, b) => MediaIn(id, b) }.toDS()))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, b) =>
      got.getOrElse(id, Set.empty[Long]) shouldBe refLandmarks(b)
    }
  }

  test("audio: SHIFT-INVARIANCE — a recording with a prepended segment " +
       "(window-aligned offset) shares the original's ENTIRE landmark " +
       "set; positional frame checksums (x14) share nothing") {
    val s = spark
    import s.implicits._
    val a = blob(10, 640)
    val b = blob(99, 160) ++ a // same content, 5 windows later
    val ds = Seq(MediaIn(1L, a), MediaIn(2L, b)).toDS()
    val lms = AudioFingerprint.landmarks(AudioFingerprint.windowFeatures(ds))
    val pairs = AudioFingerprint.matchPairs(lms, minShared = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.length shouldBe 1
    pairs.head._1 shouldBe 1L
    pairs.head._2 shouldBe 2L
    pairs.head._3 shouldBe refLandmarks(a).size.toLong // full containment

    // the contrast: x14's positional checksums all diverge at this shift
    val frames = Multimodal.sampleFrames(ds, frameBytes = 100, stride = 1)
      .collect().groupBy(_.doc_id)
    frames(1L).map(_.checksum).toSet
      .intersect(frames(2L).map(_.checksum).toSet) shouldBe empty
  }

  test("audio: unrelated recordings stay below the threshold, and the " +
       "plan is bucket-local (no cartesian, oversized buckets cap to " +
       "star pairs)") {
    val s = spark
    import s.implicits._
    val unrelated = (0L until 20L).map(i => MediaIn(i, blob(1000 + i, 640)))
    val lms = AudioFingerprint.landmarks(
      AudioFingerprint.windowFeatures(unrelated.toDS()))
    val q = AudioFingerprint.matchPairs(lms, minShared = 8)
    val plan = q.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    q.count() shouldBe 0L

    // 100 identical recordings: every landmark bucket holds all 100
    // docs > cap 64 — the capped join yields the 99 star pairs, with
    // n_shared still the EXACT full fingerprint size (verification is
    // independent of the candidate route)
    val clones = (0L until 100L).map(i => MediaIn(i, blob(7, 640))).toDS()
    val cl = AudioFingerprint.landmarks(AudioFingerprint.windowFeatures(clones))
    val pairs = AudioFingerprint.matchPairs(cl, minShared = 8).collect()
    pairs.length shouldBe 99
    val full = refLandmarks(blob(7, 640)).size.toLong
    pairs.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getLong(2) shouldBe full
    }
  }

  test("audio: STOP-LANDMARK removal drops a ubiquitous landmark from " +
       "EVERY fingerprint (maxDf bound) — rare segment matches survive, " +
       "the common motif stops inflating counts and bounds its bucket") {
    val s = spark
    import s.implicits._
    val motif = blob(500, 320)   // a "station jingle" in every recording
    val seg = blob(501, 320)     // a rare shared segment (2 carriers)
    val docs = (0L until 20L).map { i =>
      val tail = if (i < 2) seg else blob(600 + i, 320)
      MediaIn(i, motif ++ tail)
    }
    val lms = AudioFingerprint.landmarks(
      AudioFingerprint.windowFeatures(docs.toDS()))
    val rare = AudioFingerprint.rareLandmarks(lms, maxDf = 16)
    // every landmark the motif generates sits in >= 20 fingerprints →
    // gone; the segment's landmarks (2 carriers) survive
    val motifLms = refLandmarks(motif)
    val kept = rare.collect().map(_.getLong(1)).toSet
    kept.intersect(motifLms) shouldBe empty
    kept should not be empty
    // and only the true segment pair matches now
    val pairs = AudioFingerprint.matchPairs(rare, minShared = 8).collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((0L, 1L))
  }

  // ------------------------------------------------------------------
  // video (x89)
  // ------------------------------------------------------------------

  test("video: frame-hash keys match the independent reference " +
       "bit-for-bit (per-frame trigram plane, integer mean-threshold, " +
       "two-key packing)") {
    val s = spark
    import s.implicits._
    val docs = Seq(1L -> blob(21, 1050), 2L -> blob(22, 499))
    val got = PHash.frameHashKeys(Multimodal.framePlanes(
        docs.map { case (id, b) => MediaIn(id, b) }.toDS()))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, b) =>
      got.getOrElse(id, Set.empty[(Long, Long)]) shouldBe refFrameKeys(b)
    }
  }

  test("video: RE-CUT invariance and RE-ENCODE robustness — prepended " +
       "frames and per-frame one-byte noise both stay above the Jaccard " +
       "threshold; the noisy copy shares ZERO positional checksums (x14)") {
    val s = spark
    import s.implicits._
    val a = blob(30, 1000)            // 10 frames
    val recut = blob(31, 200) ++ a    // 2 whole prepended frames
    // "re-encode": every frame perturbed by one byte (3 of 98 trigrams
    // move) — the per-frame noise a lossy transcode leaves behind
    val reenc = a.clone()
    for (f <- 0 until 10) reenc(f * 100 + 37) =
      (reenc(f * 100 + 37) ^ 0x5A).toByte
    val ds = Seq(MediaIn(1L, a), MediaIn(2L, recut), MediaIn(3L, reenc)).toDS()
    val pairs = PHash.videoNeardupPairs(Multimodal.framePlanes(ds))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    // re-cut: fingerprint of a ⊆ fingerprint of recut — all of a's
    // hashes match by identity; expected score from the reference
    val fa = refFrameKeys(a); val fr = refFrameKeys(recut)
    fa.subsetOf(fr) shouldBe true
    pairs((1L, 2L)) shouldBe refCoverPpm(fa, fr)
    pairs((1L, 2L)) should be >= 500000L

    // re-encode: hamming-tolerant matching holds most frames through
    // the per-frame noise (exact hash equality would hold almost none
    // — threshold-adjacent bits flip), and the operator reports
    // exactly the reference score
    val fe = refFrameKeys(reenc)
    fa.intersect(fe).size should be < fa.size // exact equality DOES break
    pairs.contains((1L, 3L)) shouldBe true
    pairs((1L, 3L)) shouldBe refCoverPpm(fa, fe)
    pairs((1L, 3L)) should be >= 500000L

    // the contrast x89 exists for: the SAME noisy pair is invisible to
    // positional checksums — every frame's sha256 diverged
    val frames = Multimodal.sampleFrames(ds, frameBytes = 100, stride = 1)
      .collect().groupBy(_.doc_id)
    frames(1L).map(_.checksum).toSet
      .intersect(frames(3L).map(_.checksum).toSet) shouldBe empty
  }

  test("video: the coverage kernel really COMPILES and matches a " +
       "brute-force reference — CODEGEN_ONLY with fallback disabled, " +
       "random hash sets, both directions") {
    val s = spark
    import s.implicits._
    val conf = s.conf
    val keys = Seq("spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
      "spark.sql.codegen.fallback" -> "false")
    val saved = keys.map { case (k, _) => k -> conf.getOption(k) }
    keys.foreach { case (k, v) => conf.set(k, v) }
    try {
      val rnd = new java.util.Random(77)
      def hashSet(n: Int): Seq[(Long, Long)] =
        Seq.fill(n)((rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 20).toLong))
      val rows = (0 until 40).map { i =>
        val base = hashSet(3 + rnd.nextInt(5))
        // overlap: perturb a few bits of some elements of base
        val other = base.map { case (k1, k2) =>
          if (rnd.nextBoolean()) (k1 ^ (1L << rnd.nextInt(16)), k2)
          else (k1, k2 ^ (1L << rnd.nextInt(16)))
        } ++ hashSet(rnd.nextInt(3))
        (i, base, other)
      }
      // repartition(1) so ConvertToLocalRelation cannot fold the
      // projection interpreted before CODEGEN_ONLY engages
      val df = rows.toDF("id", "fa", "fb").repartition(1)
      import org.apache.spark.sql.GraftPlanBridge
      // tuples arrive as struct<_1, _2> — the kernel requires only two
      // LongType fields, whatever their names
      val q = df.select($"id", GraftPlanBridge.col(
        graft.functions.HammingCoverCounts(
          GraftPlanBridge.expr($"fa"),
          GraftPlanBridge.expr($"fb"), 3)).as("cov"))
      def ham(x: (Long, Long), y: (Long, Long)) =
        java.lang.Long.bitCount(x._1 ^ y._1) +
          java.lang.Long.bitCount(x._2 ^ y._2)
      val got = q.collect()
        .map(r => r.getInt(0) ->
          (r.getStruct(1).getInt(0), r.getStruct(1).getInt(1))).toMap
      // after execution AQE's final plan shows the compiled span
      // ("*(n)" is WholeStageCodegenExec's tree-string rendering)
      q.queryExecution.executedPlan.toString should include regex
        """\*\(\d+\) Project"""
      rows.foreach { case (id, fa, fb) =>
        val ma = fa.count(x => fb.exists(y => ham(x, y) <= 3))
        val mb = fb.count(y => fa.exists(x => ham(x, y) <= 3))
        got(id) shouldBe (ma, mb)
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("video: bucket-locality — no cartesian product; 100 identical " +
       "videos collapse to 99 star pairs at jaccard 1e6") {
    val s = spark
    import s.implicits._
    val clones = (0L until 100L).map(i => MediaIn(i, blob(40, 1000))).toDS()
    val q = PHash.videoNeardupPairs(Multimodal.framePlanes(clones))
    val plan = q.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    val pairs = q.collect()
    pairs.length shouldBe 99
    pairs.foreach { r =>
      r.getLong(0) shouldBe 0L
      r.getLong(2) shouldBe 1000000L
    }
  }
}
