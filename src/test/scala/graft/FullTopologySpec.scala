package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.{Jobs, PageLog, TableProcess}

/** The whole reference deployment as ONE wired topology — the four
  * applications (BaseLogApp, DwdTrafficUniqueVisitorDetail,
  * DwdTrafficUserJumpDetail, DimApp) running against shared storage the
  * way the reference chains them through Kafka topics: the log split's
  * `page` output directory IS the input stream of both downstream DWD
  * jobs. Two micro-batches end-to-end, golden outputs for every sink,
  * including the event-time-timeout bounce that only fires once the
  * second batch advances the watermark. */
class FullTopologySpec extends AnyFunSuite with Matchers with SparkFixture {

  private val logSchema = StructType(Seq(
    StructField("mid", StringType),
    StructField("page_id", StringType),
    StructField("last_page_id", StringType),
    StructField("ts", LongType),
    StructField("err", StringType),
    StructField("start", StringType),
    StructField("displays", ArrayType(StructType(Seq(
      StructField("pos", IntegerType), StructField("item", StringType)))))))

  test("four-job topology: split -> {UV dedup, bounce CEP} + CDC dim routing") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("topo").toString
    def dir(n: String) = { Files.createDirectories(Paths.get(s"$root/$n")); s"$root/$n" }
    val logIn = dir("log_in"); val out = dir("out")

    // ---- batch 1 (ts around 1-2s) and batch 2 (ts around 100s) ----
    val batch1 = Seq(
      """{"mid":"m1","page_id":"home","ts":1000,"displays":[{"pos":0,"item":"a"},{"pos":1,"item":"b"}]}""",
      """{"mid":"m1","page_id":"cart","last_page_id":"home","ts":2000}""",
      """{"mid":"m2","page_id":"home","ts":1500}""",
      """{"mid":"m3","err":"boom","ts":1700}""",
      """{"mid":"m4","start":"cold","ts":1800}""",
      """not json""")
    val batch2 = Seq(
      """{"mid":"m5","page_id":"home","ts":100000}""",
      """{"mid":"m5","page_id":"home","ts":100005}""")

    // ---- job 1: BaseLogApp — split the raw line stream ----
    val raw = s.readStream
      .schema(StructType(Seq(StructField("value", StringType)))).text(logIn)
    val splitQ = raw.writeStream
      .option("checkpointLocation", dir("chk_split"))
      .foreachBatch { (b: Dataset[Row], _: Long) =>
        val cached = b.cache()
        try {
          val st = Jobs.baseLogSplit(cached.toDF(), logSchema)
          st.dirty.write.mode("append").parquet(s"$out/dirty")
          st.err.select($"mid", $"err", $"ts").write.mode("append").parquet(s"$out/err")
          st.start.select($"mid", $"start", $"ts").write.mode("append").parquet(s"$out/start")
          st.page.select($"mid", $"page_id", $"last_page_id", $"ts")
            .write.mode("append").parquet(s"$out/page")
          st.display.write.mode("append").parquet(s"$out/display")
        } finally { cached.unpersist(); () }
      }.start()

    Files.write(Paths.get(s"$logIn/b1.txt"), String.join("\n", batch1: _*).getBytes)
    splitQ.processAllAvailable()
    Files.write(Paths.get(s"$logIn/b2.txt"), String.join("\n", batch2: _*).getBytes)
    splitQ.processAllAvailable()
    splitQ.stop()

    // ---- jobs 2+3: the page DIRECTORY is the downstream topic ----
    val pageSchema = StructType(Seq(
      StructField("mid", StringType), StructField("page_id", StringType),
      StructField("last_page_id", StringType), StructField("ts", LongType)))
    def pageStream: Dataset[PageLog] = s.readStream
      .schema(pageSchema).option("maxFilesPerTrigger", 1).parquet(s"$out/page")
      .select($"mid", $"page_id".as("pageId"), $"last_page_id".as("lastPageId"),
        $"ts", lit("0").as("isNew"), timestamp_millis($"ts").as("eventTime"))
      .as[PageLog]

    val uvQ = Jobs.uniqueVisitorDetail(pageStream).writeStream
      .option("checkpointLocation", dir("chk_uv"))
      .outputMode("append")
      .foreachBatch { (b: Dataset[PageLog], _: Long) =>
        b.write.mode("append").parquet(s"$out/uv"); () }
      .start()
    val jumpQ = Jobs.userJumpDetail(pageStream).writeStream
      .option("checkpointLocation", dir("chk_jump"))
      .outputMode("append")
      .foreachBatch { (b: Dataset[graft.streaming.Bounce], _: Long) =>
        b.write.mode("append").parquet(s"$out/bounce"); () }
      .start()
    try { uvQ.processAllAvailable(); jumpQ.processAllAvailable() }
    finally { uvQ.stop(); jumpQ.stop() }

    // ---- job 4: DimApp — CDC stream routed to upserted dim tables ----
    val cdcIn = dir("cdc_in")
    val cdcSchema = StructType(Seq(
      StructField("source_table", StringType), StructField("id", LongType),
      StructField("name", StringType), StructField("v", LongType)))
    val config = Seq(
      TableProcess("user_info", "dim_user", "id,name", "id"),
      TableProcess("sku_info", "dim_sku", "id", "id"))
    val dimQ = Jobs.dimApp(
      s.readStream.schema(cdcSchema).option("maxFilesPerTrigger", 1).json(cdcIn),
      _ => config, s"$out/dim", "v", dir("chk_dim"),
      catalogDb = Some("graft_dim_topo"))
    Files.write(Paths.get(s"$cdcIn/c1.json"),
      ("""{"source_table":"user_info","id":1,"name":"x","v":1}""" + "\n" +
       """{"source_table":"sku_info","id":7,"name":"s","v":1}""").getBytes)
    dimQ.processAllAvailable()
    Files.write(Paths.get(s"$cdcIn/c2.json"),
      ("""{"source_table":"user_info","id":1,"name":"y","v":2}""" + "\n" +
       """{"source_table":"user_info","id":2,"name":"z","v":1}""").getBytes)
    dimQ.processAllAvailable()
    dimQ.stop()

    // ---- golden asserts, every sink ----
    s.read.parquet(s"$out/dirty").count() shouldBe 1
    s.read.parquet(s"$out/err").as[(String, String, Long)].collect() shouldBe
      Array(("m3", "boom", 1700L))
    s.read.parquet(s"$out/start").as[(String, String, Long)].collect() shouldBe
      Array(("m4", "cold", 1800L))
    s.read.parquet(s"$out/page").count() shouldBe 5
    s.read.parquet(s"$out/display").count() shouldBe 2

    // UV: one row per (device, day) across both batches, entries only
    val uv = s.read.parquet(s"$out/uv").as[PageLog].collect()
      .map(e => (e.mid, e.ts)).sorted
    uv shouldBe Seq(("m1", 1000L), ("m2", 1500L), ("m5", 100000L))

    // bounces: m2's lone entry times out once batch 2's watermark passes
    // 1500+gap; m5's first entry bounces on the strict-next second entry.
    // m1's entry is followed by a normal page within the gap: no bounce.
    // m5's second entry stays pending (watermark never reaches it).
    val bounces = s.read.parquet(s"$out/bounce")
      .as[graft.streaming.Bounce].collect().map(b => (b.mid, b.ts, b.reason)).sorted
    bounces shouldBe Seq(("m2", 1500L, "timeout"), ("m5", 100000L, "next_entry"))

    // dims: last-writer-wins by version, config-driven projection
    val dimUser = s.read.parquet(s"$out/dim/dim_user")
      .select("id", "name").as[(Long, String)].collect().sorted
    dimUser shouldBe Seq((1L, "y"), (2L, "z"))
    s.read.parquet(s"$out/dim/dim_sku").select("id").as[Long].collect() shouldBe Array(7L)
    // K4 through the app entry point: dims are catalog tables by name
    s.sql("SELECT name FROM graft_dim_topo.dim_user WHERE id = 1")
      .as[String].collect() shouldBe Array("y")
  }
}
