package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.MinHash

/** One (doc, LSH band) occupancy row — MinHash.bandRows output. */
final case class DocBand(doc_id: Long, band: Int, k1: Long, k2: Long)

/** A streamed near-dup candidate: `dupId` collided with the bucket
  * whose first occupant was `keeperId` (band identifies which of the B
  * bands fired; the same pair may fire in several). */
final case class DupCandidate(keeperId: Long, dupId: Long, band: Int)

/** LSH bucket identity — the state key. Top-level: a nested case class
  * cannot get a Spark encoder. */
final case class BandKey(band: Int, k1: Long, k2: Long)

/** A band row carrying its event time — [[StreamingNearDup.withTtl]]'s
  * input shape. */
final case class DocBandT(doc_id: Long, band: Int, k1: Long, k2: Long,
                          eventTime: java.sql.Timestamp)

/** TTL'd bucket state: the keeper + when the bucket last saw traffic. */
final case class BucketAnchor(anchor: Long, lastSeenMs: Long)

/** One ingested document with its event time —
  * [[StreamingNearDup.replayWithTtl]]'s input row. */
final case class IngestDoc(doc_id: Long, text: String,
                           eventTime: java.sql.Timestamp)

/** Continuous MinHash+LSH near-dup detection — the streaming form of
  * the batch x02 pipeline, for dedup-at-ingest: every incoming doc is
  * shingled/minhashed/banded by the SAME [[graft.ops.MinHash]] map the
  * batch pass uses, then each of its B band keys is probed against
  * keyed state. First occupant of a bucket becomes its keeper; every
  * later arrival is emitted as a (keeper, dup) candidate — x01's
  * keep-first rule, applied in arrival order.
  *
  * Scale shape: band generation is a narrow map (zero shuffle); the
  * state lookup shuffles on the band key exactly like the batch band
  * equi-join, and state is ONE long per occupied bucket — proportional
  * to corpus signature diversity, not event volume — and [[withTtl]]
  * bounds it further to the LIVE reingest window via event-time state
  * expiry. Production would verify candidates with the exact-Jaccard
  * join against the doc store, downstream of the detection this
  * operator owns. Reference
  * analogue: the keyed ValueState dedup shape of
  * DwdTrafficUniqueVisitorDetail.java:57-80, keyed by LSH bucket
  * instead of device id.
  */
object StreamingNearDup {

  private def process(key: BandKey, rows: Iterator[DocBand],
                      state: GroupState[Long]): Iterator[DupCandidate] = {
    // arrival order within a micro-batch is nondeterministic; sort so
    // "first doc in the bucket" is stable under replay
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val out = Seq.newBuilder[DupCandidate]
    // explicit presence, never a sign sentinel: doc ids are arbitrary
    // Longs (content-hash ids are ~half negative), so an "anchor < 0
    // means unset" encoding would silently re-anchor every negative-id
    // bucket and never persist its state
    var anchor: Option[Long] = state.getOption
    sorted.foreach { r =>
      anchor match {
        case None =>
          anchor = Some(r.doc_id)
        case Some(a) =>
          if (r.doc_id != a) out += DupCandidate(a, r.doc_id, key.band)
      }
    }
    anchor.foreach(state.update)
    out.result().iterator
  }

  /** The shared anchor state machine over ANY banded key scheme:
    * (doc_id, band, k1, k2) occupancy rows → (keeper, dup) candidates.
    * This is the seam the media twins ride
    * ([[StreamingMediaNearDup]] feeds pHash / frame-bucket / landmark
    * band rows through it), so every detector — text MinHash, image
    * aHash, video frame sets, audio constellations — shares ONE
    * spec-pinned state shape: first occupant anchors the bucket,
    * later arrivals emit star candidates, state is one long per
    * occupied bucket. Works on a streaming or batch Dataset (batch:
    * one call per bucket with the full corpus, which reproduces the
    * batch candidate semantics). */
  def fromBandRows(bands: Dataset[DocBand]): Dataset[DupCandidate] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(r => BandKey(r.band, r.k1, r.k2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(process)
  }

  /** docs (doc_id LONG, text STRING) → DupCandidate stream via the
    * MinHash LSH banding (the text detector). */
  def apply(docs: DataFrame): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    fromBandRows(MinHash.bandRows(docs).as[DocBand])
  }

  private def processTtl(ttlMs: Long)(
      key: BandKey, rows: Iterator[DocBandT],
      state: GroupState[BucketAnchor]): Iterator[DupCandidate] = {
    if (state.hasTimedOut) {
      // reingest window closed: forget the anchor — the next occupant
      // of this bucket starts a fresh window as its keeper
      state.remove()
      return Iterator.empty
    }
    val sorted = rows.toSeq.sortBy(_.doc_id)
    val out = Seq.newBuilder[DupCandidate]
    // same explicit-presence rule as [[process]]: the Option carries
    // "bucket occupied", so negative (content-hash) anchors round-trip
    var st: Option[BucketAnchor] = state.getOption
    sorted.foreach { r =>
      st match {
        case None =>
          st = Some(BucketAnchor(r.doc_id, r.eventTime.getTime))
        case Some(a) =>
          if (r.doc_id != a.anchor)
            out += DupCandidate(a.anchor, r.doc_id, key.band)
          if (r.eventTime.getTime > a.lastSeenMs)
            st = Some(a.copy(lastSeenMs = r.eventTime.getTime))
      }
    }
    st.foreach { a =>
      state.update(a)
      // expire when the WATERMARK passes lastSeen + ttl; clamp above
      // the current watermark (setting a timeout at-or-before it is
      // an error when a straggler arrives inside an already-past
      // window)
      state.setTimeoutTimestamp(
        math.max(a.lastSeenMs + ttlMs, state.getCurrentWatermarkMs() + 1))
    }
    out.result().iterator
  }

  /** The TTL'd anchor state machine over ANY banded key scheme —
    * [[fromBandRows]]'s bounded-state sibling, and the seam the media
    * twins' TTL routes ride ([[StreamingMediaNearDup.imageWithTtl]]).
    * `bands` must carry its event time WITH a watermark already
    * assigned upstream. */
  def fromBandRowsWithTtl(bands: Dataset[DocBandT],
                          ttl: java.time.Duration): Dataset[DupCandidate] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(r => BandKey(r.band, r.k1, r.k2))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(processTtl(ttl.toMillis))
  }

  /** TTL'd variant — the reingest-window semantics the production
    * deployment wants: a bucket's keeper is forgotten once the
    * WATERMARK passes its last sighting + `ttl`, so state stays
    * proportional to the signature diversity of the live window
    * instead of the corpus's full history, and a document re-ingested
    * after the window re-anchors as a fresh keeper instead of being
    * flagged against a years-old one. `docs` must carry an event-time
    * column named `eventTime` WITH a watermark already assigned
    * (`withWatermark("eventTime", …)`) — the same contract as
    * [[BounceDetector]]'s timers; event-time timeout keeps expiry
    * deterministic under replay (a processing-time TTL would re-expire
    * differently on every recovery). */
  def withTtl(docs: DataFrame, ttl: java.time.Duration): Dataset[DupCandidate] = {
    import docs.sparkSession.implicits._
    fromBandRowsWithTtl(
      MinHash.bandRows(docs, carry = Seq("eventTime")).as[DocBandT], ttl)
  }

  /** DETERMINISTIC replay harness for the TTL'd detector — the seam
    * that puts the expiry semantics under a cross-engine oracle (x95)
    * instead of only a spec pin. Feeds `batches` (event-time-ascending
    * groups, e.g. one per calendar day) through [[withTtl]] one
    * micro-batch each, with Spark's no-data micro-batches DISABLED for
    * the run: timers then fire only inside data batches, so watermark
    * and timeout sequencing become a pure function of the input — the
    * rule a SQL oracle can replay exactly. (With no-data batches on,
    * whether an expiry lands before or after the next feed depends on
    * a trigger race; determinism is the point of the harness.)
    * Watermark delay is 0: the watermark entering batch i is the max
    * event time over batches < i, so a bucket's anchor expires at the
    * first batch where that running max passes lastSeen + ttl while
    * the bucket is silent. Returns the memory-sink table of emitted
    * [[DupCandidate]]s (callers dedup — the same pair may fire on
    * several days). `sinkName` must be session-unique per call. */
  def replayWithTtl(spark: org.apache.spark.sql.SparkSession,
                    batches: Seq[Seq[IngestDoc]],
                    ttl: java.time.Duration,
                    sinkName: String,
                    statePartitions: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.getOption(key)
    // State-partition count is a DATA-VOLUME knob, not a host-core one:
    // the stream's stateful exchange (and so its per-micro-batch state
    // store count) is fixed at query start from shuffle.partitions, and
    // every micro-batch pays one task launch + one state-store commit
    // PER PARTITION regardless of rows. A replay of bounded day-batches
    // under the session default (32 here) spends most of its wall on
    // empty-partition bookkeeping; callers size it to their replay
    // volume (x95 derives it from total ingest rows) and a continuous
    // deployment sizes it to throughput. Restored after start() — the
    // value is captured into the query's offset log at start.
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(key, "false")
    statePartitions.foreach(p => spark.conf.set(partsKey, p.toString))
    try {
      val mem = MemoryStream[IngestDoc]
      val chk = java.nio.file.Files
        .createTempDirectory("neardup_ttl_replay").toString
      val q = withTtl(mem.toDF().withWatermark("eventTime", "0 seconds"),
          ttl)
        .toDF().writeStream.format("memory").queryName(sinkName)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start()
      spark.conf.set(partsKey, prevParts)
      try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
      finally q.stop()
      spark.table(sinkName)
    } finally {
      spark.conf.set(partsKey, prevParts)
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
