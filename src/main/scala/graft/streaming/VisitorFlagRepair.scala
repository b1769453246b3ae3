package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A2 — new/returning-visitor flag repair (BaseLogApp.java:66-96):
  * keyed state holds the device's first-visit date.
  *
  *   - is_new=1 and no state        → genuinely new: store today, keep 1
  *   - is_new=1 and state ≠ today   → stale client flag: rewrite to 0
  *   - is_new=1 and state = today   → still the first day: keep 1
  *   - is_new=0 and no state        → old visitor predating the state
  *                                    store: backfill state = yesterday
  *
  * Same scale shape as DedupDaily: one date string per active device.
  */
object VisitorFlagRepair {

  def process(mid: String, events: Iterator[PageLog],
              state: GroupState[String]): Iterator[PageLog] = {
    val sorted = events.toSeq.sortBy(e => (e.ts, e.pageId))
    var first = state.getOption.orNull
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
    if (first != null) state.update(first)
    out.iterator
  }

  def apply(ds: Dataset[PageLog]): Dataset[PageLog] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.mid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(process)
  }
}
