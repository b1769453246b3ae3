package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.PageLog

/** W1 (watermarks), W3 (windows incl. session windows), W4 (late-data
  * drop) in their native Structured Streaming form: tumbling-window
  * aggregation with append-mode emission gated by the watermark, the
  * built-in session_window, and a late event observedly dropped. */
class StreamingWindowSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("tumbling window agg emits closed windows only; late data beyond watermark is dropped") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[PageLog]
    val counts = mem.toDS()
      .withWatermark("eventTime", "5 seconds")
      .groupBy(window($"eventTime", "10 seconds").as("w"), $"mid")
      .agg(count(lit(1)).as("n"))
      .select($"w.start".cast("long").as("w_start"), $"mid", $"n")
    val q = counts.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,10): 2 events for m1; [10,20): 1 event for m1
      mem.addData(Seq(PageLog("m1", "a", None, 1000L),
                      PageLog("m1", "b", None, 4000L),
                      PageLog("m1", "c", None, 12000L)))
      q.processAllAvailable()
      // nothing emitted yet: watermark (12s - 5s = 7s) hasn't passed 10s
      s.table("win_out").count() shouldBe 0
      // advance watermark past window [0,10) end...
      mem.addData(Seq(PageLog("m2", "d", None, 30000L)))
      q.processAllAvailable()
      q.processAllAvailable()
      val afterClose = s.table("win_out").as[(Long, String, Long)].collect().toSet
      afterClose should contain(0L, "m1", 2L)
      // ...then send an event INTO the closed [0,10) window: watermark
      // is 25s, the event is 6s late beyond it → dropped, count stays 2
      mem.addData(Seq(PageLog("m1", "late", None, 2000L)))
      q.processAllAvailable()
      mem.addData(Seq(PageLog("m2", "e", None, 60000L)))
      q.processAllAvailable()
      q.processAllAvailable()
      val finalRows = s.table("win_out").as[(Long, String, Long)].collect().toSet
      finalRows.filter(r => r._1 == 0L && r._2 == "m1").map(_._3) shouldBe Set(2L)
    } finally q.stop()
  }

  test("streaming windowed heavy hitters: sketch state, append-on-close, batch-parity tie-break") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[PageLog]
    val out = graft.streaming.Jobs.windowedHeavyHitters(
      mem.toDF(), "eventTime", "pageId", "10 seconds", "5 seconds",
      k = 3, capacity = 8)
    val q = out.writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Append).start()
    try {
      // window [0,10): a×3, b×2, c×1, d×1 → top-3 "a,b,c" (c beats d
      // on the term tie-break at cnt=1), n=7 — the w16 oracle's rule
      mem.addData(Seq(
        PageLog("m1", "a", None, 1000L), PageLog("m1", "a", None, 2000L),
        PageLog("m1", "a", None, 3000L), PageLog("m1", "b", None, 4000L),
        PageLog("m2", "b", None, 5000L), PageLog("m2", "c", None, 6000L),
        PageLog("m2", "d", None, 7000L)))
      q.processAllAvailable()
      // watermark (7s - 5s) hasn't passed the window end: nothing out
      s.table("hh_out").count() shouldBe 0
      mem.addData(Seq(PageLog("m3", "z", None, 30000L)))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = s.table("hh_out").as[(Long, Long, String)].collect().toSet
      rows shouldBe Set((0L, 7L, "a,b,c"))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: built-in streaming dedup, state bounded by watermark") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[PageLog]
    val deduped = mem.toDS()
      .withWatermark("eventTime", "10 seconds")
      .dropDuplicatesWithinWatermark("mid", "pageId")
    val q = deduped.writeStream.format("memory").queryName("ddw_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Seq(PageLog("m1", "home", None, 1000L),
                      PageLog("m1", "home", None, 2000L),    // dup within watermark
                      PageLog("m1", "cart", None, 3000L)))
      q.processAllAvailable()
      s.table("ddw_out").count() shouldBe 2
      // watermark must advance in its OWN batch (it moves at batch
      // boundaries) so the (m1, home) state expires first...
      mem.addData(Seq(PageLog("m9", "wm", None, 400000L)))
      q.processAllAvailable()
      // ...then the same key re-emits as a fresh record
      mem.addData(Seq(PageLog("m1", "home", None, 500000L)))
      q.processAllAvailable()
      q.processAllAvailable()
      s.table("ddw_out").as[PageLog].collect()
        .count(e => e.mid == "m1" && e.pageId == "home") shouldBe 2
    } finally q.stop()
  }

  test("session_window merges events within the gap and splits across it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[PageLog]
    val sessions = mem.toDS()
      .withWatermark("eventTime", "2 seconds")
      .groupBy(session_window($"eventTime", "10 seconds").as("sw"), $"mid")
      .agg(count(lit(1)).as("n"))
      .select($"mid", $"n",
        ($"sw.end".cast("long") - $"sw.start".cast("long")).as("span_s"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append).start()
    try {
      // one session: 0s,4s,8s (gaps < 10s) — then a new session at 60s
      mem.addData(Seq(PageLog("m1", "a", None, 0L),
                      PageLog("m1", "b", None, 4000L),
                      PageLog("m1", "c", None, 8000L),
                      PageLog("m1", "d", None, 60000L)))
      q.processAllAvailable()
      mem.addData(Seq(PageLog("m9", "wm", None, 200000L)))  // close everything
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = s.table("sess_out").as[(String, Long, Long)].collect()
        .filter(_._1 == "m1").sortBy(_._2)
      rows should have length 2
      rows.map(_._2) shouldBe Seq(1L, 3L)       // 1-event session + 3-event session
      // 3-event session spans 8s of events + 10s gap tail = 18s
      rows.find(_._2 == 3L).get._3 shouldBe 18L
    } finally q.stop()
  }
}
