package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** W2 — bounce (user-jump) detection: the reference's 2-event CEP
  * pattern with timeout (DwdTrafficUserJumpDetail.java:88-136) as an
  * explicit state machine over `flatMapGroupsWithState` with
  * event-time timeout — Spark has no CEP library, and this is the
  * idiomatic replacement (SURVEY.md §2.5 W2).
  *
  * Semantics per device (mid):
  *   - a session-entry event (last_page_id IS NULL) becomes "pending";
  *   - a following event within `gapMs`:
  *       · another entry  → the pending event was a bounce (emit,
  *                          reason "next_entry"); the new entry becomes
  *                          pending — the CEP strict-`next` match arm;
  *       · a normal page  → not a bounce; pending cleared;
  *   - no event within `gapMs` (event-time timer driven by the
  *     watermark) → the pending event was a bounce (emit, reason
  *     "timeout") — the CEP `within` timeout side-output arm.
  *
  * Both arms emit on one path, so the reference's union of matched +
  * timeout streams (line 136) is unnecessary here.
  *
  * State per key is one pending timestamp; the watermark bounds how
  * long it can live, so state size is O(active sessions) at any scale.
  * Late events beyond the watermark are dropped (W4 — the documented
  * lateness contract; the reference's monotonous watermarks imply the
  * same).
  */
object BounceDetector {

  val DefaultGapMs = 10000L

  def process(gapMs: Long)(mid: String, events: Iterator[PageLog],
                           state: GroupState[Long]): Iterator[Bounce] = {
    // Unlike windowed aggregations, fMGWS does NOT pre-filter
    // watermark-late input rows — with a disordered multi-partition
    // source (a real Kafka topic; FileTopic's unordered segment
    // listing) a batch can deliver events far behind the watermark.
    // The W4 contract (late events beyond the watermark are dropped)
    // is therefore enforced HERE; without it a late entry would leave
    // a pending whose pending+gap timer lies behind the watermark,
    // which fMGWS rejects outright. Batch mode has no watermark —
    // nothing is late.
    val wm =
      try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => Long.MinValue }
    val out = Seq.newBuilder[Bounce]
    if (state.hasTimedOut) {
      // Timer fired: the watermark passed pending+gap with no follow-up.
      state.getOption.foreach(p => out += Bounce(mid, p, "timeout"))
      state.remove()
    } else {
      var pending = state.getOption
      events.toSeq.filter(e => wm == Long.MinValue || e.ts >= wm)
        .sortBy(e => (e.ts, e.pageId)).foreach { e =>
        val isEntry = e.lastPageId.isEmpty
        pending match {
          case Some(p) if e.ts - p <= gapMs =>
            if (isEntry) { out += Bounce(mid, p, "next_entry"); pending = Some(e.ts) }
            else pending = None
          case Some(p) =>
            out += Bounce(mid, p, "timeout")
            pending = if (isEntry) Some(e.ts) else None
          case None =>
            if (isEntry) pending = Some(e.ts)
        }
      }
      pending match {
        case Some(p) if wm != Long.MinValue && wm >= p + gapMs =>
          // The watermark already passed pending+gap (the key went
          // quiet while other partitions advanced event time): the
          // timeout verdict is ALREADY decided — no qualifying
          // follow-up can arrive, any candidate would be late. Emit
          // now rather than registering a timer in the past (which
          // fMGWS rejects).
          out += Bounce(mid, p, "timeout")
          state.remove()
        case Some(p) =>
          state.update(p)
          state.setTimeoutTimestamp(p + gapMs)
        case None =>
          state.remove()
      }
    }
    out.result().iterator
  }

  /** `ds` must carry a watermark on `eventTime` when streaming — the
    * watermark is what drives the timeout timers. */
  def apply(ds: Dataset[PageLog], gapMs: Long = DefaultGapMs,
            watermarkDelay: String = "2 seconds"): Dataset[Bounce] = {
    import ds.sparkSession.implicits._
    val withWm =
      if (ds.isStreaming) ds.withWatermark("eventTime", watermarkDelay)
      else ds
    withWm
      .groupByKey(_.mid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(gapMs))
  }
}
