package graft.streaming

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

/** The page-log record the reference's DWD layer keys everything on
  * (mid/last_page_id/page_id/ts — app/dwd/BaseLogApp.java:64-126,
  * DwdTrafficUserJumpDetail.java:88-106). `eventTime` mirrors `ts` as a
  * Timestamp so Structured Streaming watermarks apply directly.
  */
final case class PageLog(
    mid: String,
    pageId: String,
    lastPageId: Option[String],
    ts: Long,
    isNew: String,
    eventTime: Timestamp)

object PageLog {
  def apply(mid: String, pageId: String, lastPageId: Option[String],
            ts: Long, isNew: String = "0"): PageLog =
    PageLog(mid, pageId, lastPageId, ts, isNew, new Timestamp(ts))
}

/** A detected bounce: the session-entry event that no qualifying
  * follow-up reached within the gap (DwdTrafficUserJumpDetail.java:
  * 112-133 — both the matched and the timeout flavor). */
final case class Bounce(mid: String, ts: Long, reason: String)

object Dates {
  /** Reference's DateFormatUtil.toDate (epoch millis → yyyy-MM-dd); we
    * pin UTC instead of inheriting the JVM's zone. */
  def toDate(tsMillis: Long): String =
    Instant.ofEpochMilli(tsMillis).atZone(ZoneOffset.UTC).toLocalDate.toString

  def yesterday(date: String): String =
    LocalDate.parse(date).minusDays(1).toString
}
