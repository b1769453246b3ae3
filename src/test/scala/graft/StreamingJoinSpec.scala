package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.PageLog

/** The two join shapes the warehouse's streaming layer lives on:
  * stream⋈static (dim enrichment — the DIM layer's whole purpose) and
  * stream⋈stream with event-time bounds (sessionizing two feeds). */
class StreamingJoinSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("stream-static broadcast join enriches events with dim attributes per micro-batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dim = Seq(("m1", "android"), ("m2", "ios")).toDF("mid", "os")
    val mem = MemoryStream[PageLog]
    val enriched = mem.toDS().toDF()
      .join(broadcast(dim), Seq("mid"), "left")
      .select($"mid", $"pageId", $"os")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(Seq(PageLog("m1", "home", None, 1000L),
                      PageLog("m3", "home", None, 2000L)))   // no dim row
      q.processAllAvailable()
      val rows = s.table("enrich_out").as[(String, String, Option[String])]
        .collect().sortBy(_._1)
      rows shouldBe Array(("m1", "home", Some("android")),
                          ("m3", "home", None))
    } finally q.stop()
  }

  test("stream-stream interval join: click joins its impression within the window, watermark bounds state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val impressions = MemoryStream[(String, java.sql.Timestamp)]
    val clicks = MemoryStream[(String, java.sql.Timestamp)]
    val imp = impressions.toDS().toDF("ad_id", "imp_time")
      .withWatermark("imp_time", "10 seconds")
    val clk = clicks.toDS().toDF("ad_id2", "click_time")
      .withWatermark("click_time", "10 seconds")
    val joined = imp.join(clk,
      expr("""ad_id = ad_id2 AND
              click_time >= imp_time AND
              click_time <= imp_time + interval 30 seconds"""))
      .select($"ad_id", $"imp_time".cast("long").as("imp_s"),
              $"click_time".cast("long").as("clk_s"))
    val q = joined.writeStream.format("memory").queryName("ss_join_out")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      impressions.addData(Seq(("adA", ts(10)), ("adB", ts(20))))
      clicks.addData(Seq(("adA", ts(25)),     // within 30s of adA@10 → joins
                         ("adB", ts(60))))    // 40s after adB@20 → outside window
      q.processAllAvailable()
      impressions.addData(Seq(("adC", ts(200))))  // advance both watermarks
      clicks.addData(Seq(("adC", ts(201))))
      q.processAllAvailable()
      q.processAllAvailable()
      val rows = s.table("ss_join_out").as[(String, Long, Long)].collect().toSet
      rows should contain(("adA", 10L, 25L))
      rows should contain(("adC", 200L, 201L))
      rows.map(_._1) should not contain "adB"
    } finally q.stop()
  }
}
