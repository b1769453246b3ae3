package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A1 again, on Spark 4's `transformWithState` (the successor to
  * flatMapGroupsWithState): same per-device last-visit-date state as
  * [[DedupDaily]], but with the new operator's state-store-native
  * `ValueState` handle and a state TTL — the piece the old API lacked
  * that matters most at 100 TB (device churn would otherwise grow state
  * without bound; here idle devices expire after `ttl`).
  *
  * Requires the RocksDB state store provider when streaming
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...RocksDBStateStoreProvider`), which is how a production deploy
  * runs large state anyway.
  */
class DedupDailyProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[String, PageLog, PageLog] {

  @transient private var lastDate: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttlConf =
      if (ttl == null) TTLConfig.NONE
      else TTLConfig(ttl)
    lastDate = getHandle.getValueState[String](
      "lastVisitDate", Encoders.STRING, ttlConf)
  }

  override def handleInputRows(mid: String, rows: Iterator[PageLog],
                               timers: TimerValues): Iterator[PageLog] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts, e.pageId))
    var last = if (lastDate.exists()) lastDate.get() else null
    val out = Seq.newBuilder[PageLog]
    sorted.foreach { e =>
      val d = Dates.toDate(e.ts)
      if (last == null || last != d) { out += e; last = d }
    }
    if (last != null) lastDate.update(last)
    out.result().iterator
  }
}

object DedupDailyTWS {
  /** `ttl` > state TTL for idle devices; wall-clock TTL requires the
    * ProcessingTime time mode, whose trigger loop never quiesces — so
    * production streams pass a TTL, while tests/replays (which drain
    * with processAllAvailable) use `ttl = null` → TimeMode.None. */
  def apply(ds: Dataset[PageLog],
            ttl: java.time.Duration = null): Dataset[PageLog] = {
    import ds.sparkSession.implicits._
    val timeMode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_.mid)
      .transformWithState(new DedupDailyProcessor(ttl),
        timeMode, OutputMode.Append())
  }
}
