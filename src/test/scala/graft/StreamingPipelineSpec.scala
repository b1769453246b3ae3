package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Sources

/** End-to-end DWD pipeline in streaming form (BaseLogApp semantics over
  * a file source): NDJSON in → parse-or-divert (P2) → 5-way split (M2)
  * with display explode (M3) → per-stream parquet sinks out of one
  * foreachBatch — the multiplexing shape SURVEY §3.2 maps out. */
class StreamingPipelineSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val logSchema = StructType(Seq(
    StructField("mid", StringType),
    StructField("page_id", StringType),
    StructField("last_page_id", StringType),
    StructField("ts", LongType),
    StructField("err", StringType),
    StructField("start", StringType),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("pos", IntegerType), StructField("item", StringType)))))))

  test("file stream -> parse -> 5-way split -> parquet sinks, dirty rows diverted") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("dwd_in").toString
    val out = Files.createTempDirectory("dwd_out").toString
    val chk = Files.createTempDirectory("dwd_chk").toString
    val lines = Seq(
      """{"mid":"m1","page_id":"home","ts":1000,"displays":[{"pos":0,"item":"a"},{"pos":1,"item":"b"}]}""",
      """{"mid":"m1","page_id":"cart","last_page_id":"home","ts":2000}""",
      """{"mid":"m2","start":"cold","ts":1500}""",
      """{"mid":"m3","err":"boom","ts":1700}""",
      """this is not json at all""")
    Files.write(Paths.get(s"$in/batch0.txt"), String.join("\n", lines: _*).getBytes)

    // schema-on-read parse of the raw line stream; from_json null marks dirty
    val raw = s.readStream.schema(StructType(Seq(StructField("value", StringType))))
      .option("wholetext", "false").text(in)

    val q = raw.writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val b = batch.cache()
        try {
          val streams = graft.streaming.Jobs.baseLogSplit(b.toDF(), logSchema)
          streams.dirty.write.mode("append").parquet(s"$out/dirty")
          streams.err.select(col("mid"), col("err"), col("ts"))
            .write.mode("append").parquet(s"$out/err")
          streams.start.select(col("mid"), col("start"), col("ts"))
            .write.mode("append").parquet(s"$out/start")
          streams.page.select(col("mid"), col("page_id"), col("last_page_id"), col("ts"))
            .write.mode("append").parquet(s"$out/page")
          streams.display.write.mode("append").parquet(s"$out/display")
        } finally { b.unpersist(); () }
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    s.read.parquet(s"$out/dirty").count() shouldBe 1
    s.read.parquet(s"$out/err").as[(String, String, Long)].collect() shouldBe
      Array(("m3", "boom", 1700L))
    s.read.parquet(s"$out/start").as[(String, String, Long)].collect() shouldBe
      Array(("m2", "cold", 1500L))
    s.read.parquet(s"$out/page").count() shouldBe 2
    // explode denormalizes parent fields onto each display element
    val disp = s.read.parquet(s"$out/display")
      .as[(String, String, Long, Int, String)].collect().sortBy(_._4)
    disp shouldBe Array(("m1", "home", 1000L, 0, "a"), ("m1", "home", 1000L, 1, "b"))
  }

  test("Jobs.uniqueVisitorDetail = entry filter + daily dedup composition") {
    val s = spark
    import s.implicits._
    val day = 86400000L
    val events = Seq(
      graft.streaming.PageLog("m1", "home", None, 1000L),          // entry, day 0 → kept
      graft.streaming.PageLog("m1", "cart", Some("home"), 2000L),  // not entry → dropped
      graft.streaming.PageLog("m1", "home", None, 3000L),          // entry, same day → deduped
      graft.streaming.PageLog("m1", "home", None, day + 1L),       // entry, day 1 → kept
      graft.streaming.PageLog("m2", "home", Some("x"), 500L))      // never enters
    val uv = graft.streaming.Jobs.uniqueVisitorDetail(s.createDataset(events))
      .collect().map(e => (e.mid, e.ts)).sorted
    uv shouldBe Seq(("m1", 1000L), ("m1", day + 1L))
  }
}
