package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.MinHash
import graft.streaming.StreamingNearDup

/** Top-level for the Spark encoder. */
case class NdDoc(doc_id: Long, text: String)

/** Timed variant for the TTL tests. */
case class NdDocT(doc_id: Long, text: String, eventTime: java.sql.Timestamp)

/** Continuous near-dup detection: the streaming detector must agree
  * with the batch x02 band semantics (same MinHash module), keep-first
  * across micro-batches, and emit nothing for singleton buckets. */
class StreamingNearDupSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val base = Seq.tabulate(40)(i => s"tok${i % 13} word$i").mkString(" ")
  private val near = base.replace("word20", "changed20")
  private def unrelated(i: Int): String =
    Seq.tabulate(30)(j => s"u${i}t$j distinct$i$j").mkString(" ")

  test("streamed candidates = batch band collisions; keep-first across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val mem = MemoryStream[NdDoc]
    val q = StreamingNearDup(mem.toDF()).writeStream
      .format("memory").queryName("nd_out").outputMode("append").start()
    try {
      // batch 1: the future keeper + two unrelated docs → no candidates
      mem.addData(NdDoc(0, base), NdDoc(4, unrelated(4)), NdDoc(5, unrelated(5)))
      q.processAllAvailable()
      val afterB1 = s.table("nd_out").as[(Long, Long, Int)].collect()
      afterB1 shouldBe empty

      // batch 2: a near-dup of doc 0 and one more unrelated doc — the
      // dup must be flagged against the batch-1 anchor (keep-first,
      // state carried across micro-batches)
      mem.addData(NdDoc(1, near), NdDoc(6, unrelated(6)))
      q.processAllAvailable()
      // batch 3: another copy — still anchored to doc 0, not doc 1
      mem.addData(NdDoc(2, base))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = s.table("nd_out").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    streamed should contain((0L, 1L))
    streamed should contain((0L, 2L))
    streamed.map(_._1) shouldBe Set(0L) // every candidate anchored to the first arrival

    // agreement with the batch pipeline: every streamed candidate is a
    // batch band collision over the same corpus (no false hashing), and
    // every batch collision involving the anchor is streamed (no missed
    // dups). Dup-vs-dup pairs — (1,2) here — are deliberately absent:
    // the detector implements keep-first dedup, not all-pairs mining.
    val corpus = Seq(NdDoc(0, base), NdDoc(1, near), NdDoc(2, base),
      NdDoc(4, unrelated(4)), NdDoc(5, unrelated(5)), NdDoc(6, unrelated(6))).toDF()
    val bands = MinHash.bandRows(corpus)
    val batchPairs = bands.as("a").join(bands.as("b"),
        $"a.band" === $"b.band" && $"a.k1" === $"b.k1" && $"a.k2" === $"b.k2" &&
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct()
      .as[(Long, Long)].collect().toSet
    streamed.subsetOf(batchPairs) shouldBe true
    batchPairs.filter(_._1 == 0L) shouldBe streamed
  }

  test("batch mode reproduces the same candidates in one pass") {
    val s = spark
    import s.implicits._
    val corpus = Seq(NdDoc(0, base), NdDoc(1, near), NdDoc(2, base),
      NdDoc(4, unrelated(4))).toDF()
    val got = StreamingNearDup(corpus).collect()
      .map(c => (c.keeperId, c.dupId)).toSet
    got shouldBe Set((0L, 1L), (0L, 2L))
  }

  test("negative doc ids (content-hash ids) anchor and persist like any " +
       "other — no sign-sentinel blindness") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // the StreamBench `clusters` topology keys docs by xxhash64(text),
    // which is signed — ~half the corpus gets a negative id. A sign
    // sentinel for "bucket empty" made those docs invisible to dedup
    // (re-anchored every row, never persisted state); this pins the fix
    val mem = MemoryStream[NdDoc]
    val q = StreamingNearDup(mem.toDF()).writeStream
      .format("memory").queryName("nd_neg_out").outputMode("append").start()
    try {
      // batch 1: a negative-id future keeper, alone in its buckets
      mem.addData(NdDoc(-50, base), NdDoc(7, unrelated(7)))
      q.processAllAvailable()
      s.table("nd_neg_out").collect() shouldBe empty
      // batch 2: a negative-id copy — must flag against the PERSISTED
      // negative anchor from batch 1, not silently re-anchor
      mem.addData(NdDoc(-10, base))
      q.processAllAvailable()
      // batch 3: a positive-id copy — same anchor
      mem.addData(NdDoc(3, base))
      q.processAllAvailable()
    } finally q.stop()

    val pairs = s.table("nd_neg_out").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    pairs shouldBe Set((-50L, -10L), (-50L, 3L))
  }

  test("withTtl: negative anchors persist across batches too") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    val mem = MemoryStream[NdDocT]
    val docs = mem.toDF().withWatermark("eventTime", "0 seconds")
    val q = StreamingNearDup.withTtl(docs, java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("ndttl_neg_out")
      .outputMode("append").start()
    try {
      mem.addData(NdDocT(-9, base, ts(0)))
      q.processAllAvailable()
      mem.addData(NdDocT(-4, base, ts(1)))
      q.processAllAvailable()
    } finally q.stop()

    s.table("ndttl_neg_out").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet shouldBe Set((-9L, -4L))
  }

  test("withTtl: anchors expire with the watermark and re-ingest re-anchors") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // offset from epoch: a row at exactly the initial watermark (0)
    // would be dropped as late before it ever reaches state
    def ts(min: Long) = new java.sql.Timestamp((60 + min) * 60000L)
    val mem = MemoryStream[NdDocT]
    val docs = mem.toDF().withWatermark("eventTime", "0 seconds")
    val q = StreamingNearDup.withTtl(docs, java.time.Duration.ofMinutes(10))
      .writeStream.format("memory").queryName("ndttl_out")
      .outputMode("append").start()
    try {
      // inside the window: doc 1 flags against anchor 0
      mem.addData(NdDocT(0, base, ts(0)))
      q.processAllAvailable()
      mem.addData(NdDocT(1, base, ts(5)))
      q.processAllAvailable()
      // unrelated traffic drives the watermark far past lastSeen+ttl
      // (5min + 10min << 60min) → the bucket's anchor times out
      mem.addData(NdDocT(50, unrelated(50), ts(60)))
      q.processAllAvailable()
      mem.addData(NdDocT(51, unrelated(51), ts(61)))
      q.processAllAvailable()
      // re-ingest after the window: doc 2 must NOT flag against the
      // expired anchor — it becomes the bucket's fresh keeper...
      mem.addData(NdDocT(2, base, ts(62)))
      q.processAllAvailable()
      // ...and doc 3 then flags against doc 2, not doc 0
      mem.addData(NdDocT(3, base, ts(63)))
      q.processAllAvailable()
    } finally q.stop()

    val pairs = s.table("ndttl_out").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    pairs shouldBe Set((0L, 1L), (2L, 3L))
  }

  test("replayWithTtl (x95's harness): the reingest window BINDS both " +
       "ways vs an unbounded replay of the same day-batched feed — a " +
       "cross-window pair is excluded by expiry, and post-expiry " +
       "re-anchoring emits pairs under the NEW keeper") {
    val s = spark
    import s.implicits._
    import graft.streaming.IngestDoc

    def day(d: Int, hour: Int = 12) = new java.sql.Timestamp(
      java.time.Instant.parse(f"2024-01-$d%02dT$hour%02d:00:00Z")
        .toEpochMilli)
    // one bucket family (identical text → all 4 bands collide) spread
    // across a 5-day reingest window, with unrelated traffic advancing
    // the watermark between sightings
    val batches = Seq(
      Seq(IngestDoc(1, base, day(1)), IngestDoc(2, base, day(1))),
      Seq(IngestDoc(50, unrelated(50), day(7))),  // watermark driver
      Seq(IngestDoc(51, unrelated(51), day(9))),  // the firing batch
      Seq(IngestDoc(10, base, day(15))),          // post-expiry reingest
      Seq(IngestDoc(11, base, day(16))))          // in-window vs NEW keeper
    def pairSet(name: String, ttl: java.time.Duration): Set[(Long, Long)] =
      StreamingNearDup.replayWithTtl(s, batches, ttl, name)
        .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet

    val bounded = pairSet("ndreplay_ttl", java.time.Duration.ofDays(5))
    val unbounded = pairSet("ndreplay_unb", java.time.Duration.ofDays(10000))
    // unbounded: everything anchors to the first-ever occupant
    unbounded shouldBe Set((1L, 2L), (1L, 10L), (1L, 11L))
    // bounded: day-7 traffic's watermark (entering the day-9 batch)
    // passes day-1 + 5d while the bucket is silent → the anchor
    // expires; doc 10 re-anchors FRESH (pair (1,10) excluded), and doc
    // 11 — one day later, inside the new window — pairs under keeper
    // 10, a pair the unbounded route never emits
    bounded shouldBe Set((1L, 2L), (10L, 11L))
    (unbounded -- bounded) should contain((1L, 10L))   // window excludes
    (bounded -- unbounded) should contain((10L, 11L))  // window re-keys
  }

  test("whitespace-free docs are invisible to detection; word-splitting " +
       "them restores it (the hollow-workload trap)") {
    val s = spark
    import s.implicits._
    // MinHash shingles are WORD trigrams: a compact JSON line is one
    // token → zero shingles → the doc is dropped before banding. Fed
    // raw, even near-identical templated lines produce NO band rows
    // and NO candidates — a pipeline that looks busy but detects
    // nothing (exactly what StreamBench's clusters topology measured
    // until its labels consultation surfaced clusters_found=0).
    val compact = Seq.tabulate(6)(i =>
      NdDoc(i.toLong, s"""{"mid":"m1","page_id":"home","ts":$i}"""))
    MinHash.bandRows(compact.toDF()).count() shouldBe 0L
    StreamingNearDup(compact.toDF()).count() shouldBe 0L

    // the bench-side cure: punctuation-split into word tokens — the
    // same templated lines now shingle, band, and collide
    val split = compact.map(d =>
      d.copy(text = d.text.replaceAll("[\\p{Punct}]+", " ")))
    MinHash.bandRows(split.toDF()).count() should be > 0L
    val cands = StreamingNearDup(split.toDF())
      .collect().map(c => (c.keeperId, c.dupId)).toSet
    cands should not be empty
    // keep-first within a batch sorts by doc_id, so each bucket's
    // keeper is its lowest occupant: every candidate has keeper < dup
    all(cands.map(c => c._1 < c._2)) shouldBe true
  }
}
