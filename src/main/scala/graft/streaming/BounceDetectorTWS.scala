package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** W2 again, on Spark 4's `transformWithState` — the same bounce state
  * machine as [[BounceDetector]] (fMGWS), re-expressed with the new
  * operator's explicit event-time timers and a state-store-native
  * `ValueState`, so the hardest streaming piece runs on the RocksDB
  * state-store path a 100×-state deployment needs (the same pairing
  * A1 already has in [[DedupDaily]]/[[DedupDailyTWS]], cross-checked
  * in `StreamingStateSpec`).
  *
  * Semantics are identical to [[BounceDetector.process]]:
  *   - entry event (last_page_id IS NULL) → pending;
  *   - follow-up within `gapMs`: entry → emit(next_entry) + re-pend;
  *     normal page → clear;
  *   - follow-up after `gapMs` (seen inline) or watermark passing
  *     pending+gap with no follow-up (timer) → emit(timeout).
  *
  * Timer discipline: exactly one live timer per key, kept equal to
  * pending+gap — re-registration deletes the stale timer first
  * (`listTimers`), and `handleExpiredTimer` double-checks the fire
  * against current state so a timer raced by an in-batch update can
  * never emit a stale bounce. State per key is one long; the watermark
  * bounds its lifetime, so state size is O(active sessions).
  */
class BounceProcessor(gapMs: Long)
    extends StatefulProcessor[String, PageLog, Bounce] {

  @transient private var pending: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    pending = getHandle.getValueState[Long]("pendingEntryTs",
      Encoders.scalaLong, TTLConfig.NONE)

  private def retime(newPending: Option[Long]): Unit = {
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    newPending match {
      case Some(p) =>
        pending.update(p)
        getHandle.registerTimer(p + gapMs)
      case None =>
        pending.clear()
    }
  }

  override def handleInputRows(mid: String, rows: Iterator[PageLog],
                               timers: TimerValues): Iterator[Bounce] = {
    // Same disorder hardening as [[BounceDetector.process]]: a
    // multi-partition source can deliver rows behind the watermark, so
    // the W4 late-drop contract is enforced in the operator, and a
    // pending whose pending+gap the watermark already passed emits its
    // (already decided) timeout verdict now instead of registering a
    // timer in the past. Watermark 0 = not yet advanced.
    val wm = timers.getCurrentWatermarkInMs()
    val out = Seq.newBuilder[Bounce]
    var p = if (pending.exists()) Some(pending.get()) else None
    rows.toSeq.filter(e => wm <= 0 || e.ts >= wm)
      .sortBy(e => (e.ts, e.pageId)).foreach { e =>
      val isEntry = e.lastPageId.isEmpty
      p match {
        case Some(prev) if e.ts - prev <= gapMs =>
          if (isEntry) { out += Bounce(mid, prev, "next_entry"); p = Some(e.ts) }
          else p = None
        case Some(prev) =>
          out += Bounce(mid, prev, "timeout")
          p = if (isEntry) Some(e.ts) else None
        case None =>
          if (isEntry) p = Some(e.ts)
      }
    }
    p match {
      case Some(prev) if wm > 0 && wm >= prev + gapMs =>
        out += Bounce(mid, prev, "timeout")
        retime(None)
      case _ =>
        retime(p)
    }
    out.result().iterator
  }

  override def handleExpiredTimer(mid: String, timers: TimerValues,
                                  expired: ExpiredTimerInfo): Iterator[Bounce] = {
    // Fire only if the timer still describes the CURRENT pending entry.
    if (pending.exists() && pending.get() + gapMs == expired.getExpiryTimeInMs()) {
      val p = pending.get()
      pending.clear()
      Iterator.single(Bounce(mid, p, "timeout"))
    } else Iterator.empty
  }
}

object BounceDetectorTWS {
  /** Streaming only (TimeMode.EventTime — batch has no watermark to
    * drive the timers; batch classification stays with
    * [[BounceDetector]]'s fMGWS form). */
  def apply(ds: Dataset[PageLog], gapMs: Long = BounceDetector.DefaultGapMs,
            watermarkDelay: String = "2 seconds"): Dataset[Bounce] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("eventTime", watermarkDelay)
      .groupByKey(_.mid)
      .transformWithState(new BounceProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
