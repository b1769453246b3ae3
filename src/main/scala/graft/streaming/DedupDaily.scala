package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A1 — per-key daily distinct (UV dedup), the incremental form of the
  * reference's keyed `ValueState<last_visit_date>` filter
  * (DwdTrafficUniqueVisitorDetail.java:57-80): emit a record iff its
  * event date differs from the stored date, then store the date.
  *
  * State is one short string per key — at 100 TB keys shard across the
  * shuffle (hash on mid) and the state store holds |active devices|
  * entries, independent of event volume. Works on both streaming and
  * batch Datasets (batch: each key's full history arrives in one call).
  */
object DedupDaily {

  def process(mid: String, events: Iterator[PageLog],
              state: GroupState[String]): Iterator[PageLog] = {
    // Iterator order within a micro-batch is not time-ordered; sort so
    // "first event of the day" is deterministic.
    val sorted = events.toSeq.sortBy(e => (e.ts, e.pageId))
    var last = state.getOption.orNull
    val out = Seq.newBuilder[PageLog]
    sorted.foreach { e =>
      val d = Dates.toDate(e.ts)
      if (last == null || last != d) { out += e; last = d }
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  def apply(ds: Dataset[PageLog]): Dataset[PageLog] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.mid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(process)
  }
}
