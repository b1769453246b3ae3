package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A2 again, on Spark 4's `transformWithState` (the successor to
  * flatMapGroupsWithState): same per-device first-visit-date state and
  * repair rules as [[VisitorFlagRepair]] — the fMGWS twin is the
  * executable spec, cross-checked in StreamingStateSpec — but with the
  * new operator's state-store-native `ValueState` handle and an
  * optional state TTL, the piece the old API lacked that matters most
  * at 100 TB: device churn grows first-visit state without bound, and
  * a TTL ages out devices idle past the retention window (a device
  * returning after expiry re-enters the is_new=1-and-no-state arm,
  * which is the semantically right call for a visitor gone longer than
  * the attribution window).
  *
  * Requires the RocksDB state store provider when streaming
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...RocksDBStateStoreProvider`), which is how a production deploy
  * runs large state anyway.
  */
class VisitorFlagRepairProcessor(ttl: java.time.Duration)
    extends StatefulProcessor[String, PageLog, PageLog] {

  @transient private var firstDate: ValueState[String] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val ttlConf =
      if (ttl == null) TTLConfig.NONE
      else TTLConfig(ttl)
    firstDate = getHandle.getValueState[String](
      "firstVisitDate", Encoders.STRING, ttlConf)
  }

  override def handleInputRows(mid: String, rows: Iterator[PageLog],
                               timers: TimerValues): Iterator[PageLog] = {
    val sorted = rows.toSeq.sortBy(e => (e.ts, e.pageId))
    var first = if (firstDate.exists()) firstDate.get() else null
    val out = sorted.map { e =>
      val cur = Dates.toDate(e.ts)
      if (e.isNew == "1") {
        if (first == null) { first = cur; e }
        else if (first != cur) e.copy(isNew = "0")
        else e
      } else {
        if (first == null) first = Dates.yesterday(cur)
        e
      }
    }
    if (first != null) firstDate.update(first)
    out.iterator
  }
}

object VisitorFlagRepairTWS {
  /** `ttl` > state TTL for idle devices; wall-clock TTL requires the
    * ProcessingTime time mode, whose trigger loop never quiesces — so
    * production streams pass a TTL, while tests/replays (which drain
    * with processAllAvailable) use `ttl = null` → TimeMode.None. */
  def apply(ds: Dataset[PageLog],
            ttl: java.time.Duration = null): Dataset[PageLog] = {
    import ds.sparkSession.implicits._
    val timeMode = if (ttl == null) TimeMode.None() else TimeMode.ProcessingTime()
    ds.groupByKey(_.mid)
      .transformWithState(new VisitorFlagRepairProcessor(ttl),
        timeMode, OutputMode.Append())
  }
}
