package graft

import java.nio.file.Files
import org.apache.spark.sql.{Dataset, Row}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.DimStore
import graft.streaming.FileTopic

/** The Kafka round-trip without a broker (S1/K1/K2): FileTopic
  * reproduces the reference transport's at-least-once contract on both
  * ends (duplicate producer publishes after "lost acks", consumer
  * redelivery across restarts), and the spec asserts the K2 claim —
  * exactly-once EFFECTS come from the idempotent LWW sink, not from the
  * transport. Reference: utils/MyKafkaUtil.java:52-87 (producer with
  * retries, no idempotence), app/func/DimSinkFunction.java:13-33 (the
  * keyed upsert absorbing redelivery). */
class StreamingTransportSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def rec(id: Long, name: String, ver: Long): String =
    s"""{"id":$id,"name":"$name","ver":$ver}"""

  test("at-least-once transport + idempotent LWW sink = exactly-once effects") {
    val s = spark
    import s.implicits._
    val topic = Files.createTempDirectory("topic").toString
    val dim = Files.createTempDirectory("dimtx").toString + "/dim_user"
    val chk = Files.createTempDirectory("chk").toString

    def startConsumer() =
      FileTopic.stream(s, topic)
        .selectExpr("from_json(value, 'id LONG, name STRING, ver LONG') AS r")
        .where("r IS NOT NULL AND r.id IS NOT NULL")
        .selectExpr("r.id AS id", "r.name AS name", "r.ver AS ver")
        .writeStream
        .option("checkpointLocation", chk)
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          DimStore.upsert(s, dim, batch, "id", "ver")
          ()
        }
        .start()

    // epoch 1: publish, then "lose the ack" and retry the same publish —
    // the log now carries every record twice (at-least-once, not once)
    val epoch1 = Seq(rec(1, "alice", 10), rec(2, "bob", 10))
    FileTopic.produce(topic, epoch1)
    FileTopic.produce(topic, epoch1)
    val q1 = startConsumer()
    try q1.processAllAvailable() finally q1.stop()

    // epoch 2 arrives while the consumer is DOWN (restart redelivery
    // path), again duplicated by a producer retry; id=1 is updated
    val epoch2 = Seq(rec(1, "alice-v2", 20), rec(3, "carol", 10))
    FileTopic.produce(topic, epoch2)
    FileTopic.produce(topic, epoch2)
    val q2 = startConsumer()
    try q2.processAllAvailable() finally q2.stop()

    // the transport really was at-least-once: 8 deliveries, 4 distinct
    FileTopic.replay(s, topic).count() shouldBe 8
    FileTopic.replay(s, topic).distinct().count() shouldBe 4

    // ...but the EFFECTS are exactly-once: one row per key, latest wins
    val got = DimStore.read(s, dim).select("id", "name", "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    got shouldBe Seq((1L, "alice-v2", 20L), (2L, "bob", 10L), (3L, "carol", 10L))

    // full-log reprocessing from offset zero (fresh checkpoint, same
    // sink) converges to the same state: the LWW merge is idempotent
    // under total replay, not just incremental redelivery
    val chk2 = Files.createTempDirectory("chk2").toString
    val q3 = FileTopic.stream(s, topic)
      .selectExpr("from_json(value, 'id LONG, name STRING, ver LONG') AS r")
      .where("r IS NOT NULL AND r.id IS NOT NULL")
      .selectExpr("r.id AS id", "r.name AS name", "r.ver AS ver")
      .writeStream
      .option("checkpointLocation", chk2)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        DimStore.upsert(s, dim, batch, "id", "ver")
        ()
      }
      .start()
    try q3.processAllAvailable() finally q3.stop()
    DimStore.read(s, dim).select("id", "name", "ver")
      .as[(Long, String, Long)].collect().sortBy(_._1) shouldBe got
  }

  test("staged produce: retry duplicates dedup to one segment per partition, " +
       "publish order follows partition index, torn attempts are invisible") {
    val s = spark
    import s.implicits._
    val topic = Files.createTempDirectory("ft_staged").toString
    // three partitions, written out of order; partition 1 staged TWICE
    // (a task retry after a speculative kill) with identical content
    FileTopic.produceStaged(topic, 2, Iterator("c1", "c2"))
    FileTopic.produceStaged(topic, 0, Iterator("a1", "a2"))
    FileTopic.produceStaged(topic, 1, Iterator("b1"))
    FileTopic.produceStaged(topic, 1, Iterator("b1"))
    // plus torn debris of a killed attempt: a .tmp that never renamed
    Files.writeString(java.nio.file.Paths.get(topic)
      .resolve(".seg-p00001-deadbeef.stage.tmp"), "b1-trunc")
    FileTopic.publishStaged(topic) shouldBe 3
    // exactly one visible segment per partition, duplicates gone
    val segs = java.nio.file.Files.list(java.nio.file.Paths.get(topic))
      .toArray.map(_.toString).filter(_.endsWith(".txt")).sorted
    segs.length shouldBe 3
    // mod-times strictly ascend with partition index (file-source
    // replay order == event-time order for range-partitioned input)
    val times = segs.map(p =>
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(p)).toMillis)
    times.sorted.toSeq shouldBe times.toSeq
    // content round-trips complete and deduped
    FileTopic.replay(s, topic).as[String].collect().sorted shouldBe
      Array("a1", "a2", "b1", "c1", "c2")
  }

  test("staged produce: partition indexes past the 5-digit pad width " +
       "group and order correctly (regex parse, numeric sort)") {
    val s = spark
    import s.implicits._
    val topic = Files.createTempDirectory("ft_wide").toString
    // an index the %05d pad WIDENS to 6 digits, duplicated by a retry —
    // a fixed-width prefix key would mis-group these
    FileTopic.produceStaged(topic, 123456, Iterator("z1"))
    FileTopic.produceStaged(topic, 123456, Iterator("z1"))
    FileTopic.produceStaged(topic, 7, Iterator("a1"))
    FileTopic.publishStaged(topic) shouldBe 2
    val segs = java.nio.file.Files.list(java.nio.file.Paths.get(topic))
      .toArray.map(_.toString).filter(_.endsWith(".txt"))
    segs.length shouldBe 2
    // numeric order: part 7 publishes before part 123456
    val byTime = segs.sortBy(p => java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(p)).toMillis)
    byTime.head should include("seg-p00007")
    byTime.last should include("seg-p123456")
    FileTopic.replay(s, topic).as[String].collect().sorted shouldBe
      Array("a1", "z1")
  }

  private def visibleSegs(dir: String): Seq[String] = {
    val d = java.nio.file.Paths.get(dir)
    if (!Files.isDirectory(d)) Nil
    else {
      val l = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(n => !n.startsWith(".") && n.endsWith(".txt")).toVector.sorted
      } finally l.close()
    }
  }

  test("cross-sink atomic publish: a crash between sink writes exposes " +
       "nothing anywhere; a marked batch completes before any later one; " +
       "replay dedupes to exactly-once visible segments") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("fanout").toString
    val dirs = Seq("dirty", "err", "start", "page", "display").map(n => s"$base/$n")
    val manifests = s"$base/_batches"

    // crash BETWEEN sink writes: batch 0 staged into only 3 of 5
    // topics, never committed — NOTHING is visible in ANY topic (the
    // exact failure the reference's five independent producer sends
    // cannot contain)
    dirs.take(3).zipWithIndex.foreach { case (d, i) =>
      FileTopic.produceStagedBatch(d, 0L, 0, Iterator(s"b0-$i")) }
    dirs.foreach(d => visibleSegs(d) shouldBe empty)

    // the replayed batch (foreachBatch redelivery) stages ALL topics —
    // same deterministic content — and publishes; the earlier partial
    // attempt's copies dedupe away
    dirs.zipWithIndex.foreach { case (d, i) =>
      FileTopic.produceStagedBatch(d, 0L, 0, Iterator(s"b0-$i")) }
    FileTopic.publishBatch(manifests, 0L, dirs) shouldBe true
    dirs.foreach(d => visibleSegs(d).size shouldBe 1)

    // crash AFTER the marker, before any flip: batch 1 staged
    // everywhere, marker present, flips never ran — still invisible
    // (readers never see a half-flipped batch ahead of its healing)
    dirs.zipWithIndex.foreach { case (d, i) =>
      FileTopic.produceStagedBatch(d, 1L, 0, Iterator(s"b1-$i")) }
    Files.writeString(java.nio.file.Paths.get(manifests)
      .resolve(f"b${1L}%020d.commit"), dirs.mkString("\n"))
    dirs.foreach(d => visibleSegs(d).size shouldBe 1)

    // the NEXT batch's publish completes batch 1 first, then commits
    // batch 2: topics go 1 -> 3 visible segments, never a torn 2
    dirs.zipWithIndex.foreach { case (d, i) =>
      FileTopic.produceStagedBatch(d, 2L, 0, Iterator(s"b2-$i")) }
    FileTopic.publishBatch(manifests, 2L, dirs) shouldBe true
    dirs.foreach(d => visibleSegs(d).size shouldBe 3)

    // republish of an already-committed batch is a detected no-op
    FileTopic.publishBatch(manifests, 1L, dirs) shouldBe false
    dirs.foreach(d => visibleSegs(d).size shouldBe 3)

    // content round-trips once per batch per topic
    dirs.zipWithIndex.foreach { case (d, i) =>
      FileTopic.replay(s, d).as[String].collect().sorted shouldBe
        Array(s"b0-$i", s"b1-$i", s"b2-$i")
    }
  }

  test("startBaseLogSplitAtomic: the 5-way split lands all-or-nothing per " +
       "micro-batch, split semantics intact") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types._
    val logSchema = StructType(Seq(
      StructField("mid", StringType),
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("ts", LongType),
      StructField("err", StringType),
      StructField("start", StringType),
      StructField("displays", ArrayType(StructType(Seq(
        StructField("pos", IntegerType), StructField("item", StringType)))))))
    val in = Files.createTempDirectory("fanout_in").toString
    val base = Files.createTempDirectory("fanout_out").toString
    val chk = Files.createTempDirectory("fanout_chk").toString
    FileTopic.produce(in, Seq(
      """{"mid":"m1","page_id":"home","ts":1000,"displays":[{"pos":0,"item":"a"},{"pos":1,"item":"b"}]}""",
      """{"mid":"m1","page_id":"cart","last_page_id":"home","ts":2000}""",
      """{"mid":"m2","start":"cold","ts":1500}""",
      """{"mid":"m3","err":"boom","ts":1700}""",
      """this is not json at all"""))
    val q = graft.streaming.Jobs.startBaseLogSplitAtomic(
      FileTopic.stream(s, in), logSchema, base, chk)
    try q.processAllAvailable() finally q.stop()

    FileTopic.replay(s, s"$base/dirty").count() shouldBe 1
    FileTopic.replay(s, s"$base/err").count() shouldBe 1
    FileTopic.replay(s, s"$base/start").count() shouldBe 1
    FileTopic.replay(s, s"$base/page").count() shouldBe 2
    FileTopic.replay(s, s"$base/display").count() shouldBe 2
    // display records carry the denormalized parent fields (M3)
    val disp = FileTopic.replay(s, s"$base/display")
      .selectExpr("from_json(value, 'mid STRING, page_id STRING, ts LONG, pos INT, item STRING') AS r")
      .selectExpr("r.mid", "r.page_id", "r.pos", "r.item")
      .as[(String, String, Int, String)].collect().sortBy(_._3)
    disp shouldBe Array(("m1", "home", 0, "a"), ("m1", "home", 1, "b"))
    // every visible segment belongs to a batch whose commit marker
    // exists: visibility implies the cross-sink commit
    val markers = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(s"$base/_batches"))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".commit"))
          .map(_.stripPrefix("b").stripSuffix(".commit").toLong).toSet
      } finally l.close()
    }
    Seq("dirty", "err", "start", "page", "display").foreach { n =>
      visibleSegs(s"$base/$n").foreach { seg =>
        markers should contain(seg.take(21).stripPrefix("b").toLong)
      }
    }
  }

  test("cross-sink publish model fuzz: random crash points (partial stage, " +
       "marker-no-flip, replays) always converge to marked-batches-only, " +
       "exactly once, in every topic") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    val base = Files.createTempDirectory("fanout_fuzz").toString
    val dirs = (0 until 5).map(i => s"$base/t$i")
    val manifests = s"$base/_batches"
    Files.createDirectories(java.nio.file.Paths.get(manifests))
    var committed = Set.empty[Long]
    def stage(b: Long, subset: Seq[String]): Unit =
      subset.foreach(d =>
        FileTopic.produceStagedBatch(d, b, 0, Iterator(s"batch$b")))
    (0L until 12L).foreach { b =>
      rnd.nextInt(4) match {
        case 0 => // crash mid-staging, then full replay + publish
          stage(b, dirs.take(1 + rnd.nextInt(4)))
          stage(b, dirs)
          FileTopic.publishBatch(manifests, b, dirs)
          committed += b
        case 1 => // crash after marker, before flips (healed later)
          stage(b, dirs)
          Files.writeString(java.nio.file.Paths.get(manifests)
            .resolve(f"b$b%020d.commit"), dirs.mkString("\n"))
          committed += b
        case 2 => // normal publish, then a replayed duplicate publish
          stage(b, dirs)
          FileTopic.publishBatch(manifests, b, dirs) shouldBe true
          stage(b, dirs)
          FileTopic.publishBatch(manifests, b, dirs) shouldBe false
          committed += b
        case 3 => // crash mid-staging, NEVER replayed (abandoned batch)
          stage(b, dirs.take(1 + rnd.nextInt(4)))
      }
    }
    FileTopic.recoverBatches(manifests, dirs)
    // invariant: every topic shows exactly the committed batches, once
    dirs.foreach { d =>
      val got = FileTopic.replay(s, d).as[String].collect().sorted
      got shouldBe committed.map(b => s"batch$b").toArray.sorted
    }
  }

  test("marker retention: the manifest dir stays O(retention) over a long " +
       "stream, visible segments unaffected") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("fanout_prune").toString
    val dir = s"$base/topic"
    val manifests = s"$base/_batches"
    val nBatches = FileTopic.MarkerRetention + 150
    (0 until nBatches).foreach { b =>
      FileTopic.produceStagedBatch(dir, b.toLong, 0, Iterator(s"batch$b"))
      FileTopic.publishBatch(manifests, b.toLong, Seq(dir))
    }
    val markerCount = {
      val l = java.nio.file.Files.list(java.nio.file.Paths.get(manifests))
      try {
        import scala.jdk.CollectionConverters._
        l.iterator().asScala.count(_.getFileName.toString.endsWith(".commit"))
      } finally l.close()
    }
    markerCount shouldBe FileTopic.MarkerRetention
    // every batch's segment is still visible — pruning touches history
    // markers, never data
    FileTopic.replay(s, dir).count() shouldBe nBatches.toLong
  }

  test("startBaseLogSplitAtomic: a mid-stream restart (same checkpoint) " +
       "converges — replayed batches dedupe, later batches continue") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.types._
    val logSchema = StructType(Seq(
      StructField("mid", StringType), StructField("page_id", StringType),
      StructField("last_page_id", StringType), StructField("ts", LongType),
      StructField("err", StringType), StructField("start", StringType),
      StructField("displays", ArrayType(StructType(Seq(
        StructField("pos", IntegerType), StructField("item", StringType)))))))
    val in = Files.createTempDirectory("fanout_rs_in").toString
    val base = Files.createTempDirectory("fanout_rs_out").toString
    val chk = Files.createTempDirectory("fanout_rs_chk").toString
    def page(m: String, ts: Long) =
      s"""{"mid":"$m","page_id":"home","ts":$ts}"""
    // two segments; maxFilesPerTrigger=1 → one micro-batch per segment
    FileTopic.produce(in, Seq(page("m1", 1000L)))
    FileTopic.produce(in, Seq(page("m2", 2000L)))
    def start() = graft.streaming.Jobs.startBaseLogSplitAtomic(
      FileTopic.stream(s, in, maxFilesPerTrigger = Some(1)),
      logSchema, base, chk)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    FileTopic.replay(s, s"$base/page").count() shouldBe 2
    // down between epochs; a third segment arrives, then restart on the
    // SAME checkpoint — the query resumes past the committed batches
    FileTopic.produce(in, Seq(page("m3", 3000L)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = FileTopic.replay(s, s"$base/page")
      .selectExpr("from_json(value, 'mid STRING, ts LONG') AS r")
      .selectExpr("r.mid").as[String].collect().sorted
    got shouldBe Array("m1", "m2", "m3") // no loss, no duplication
  }

  test("S4 HTTP log endpoint: POSTed lines land in the topic and flow " +
       "through the split pipeline; a retried POST is at-least-once") {
    val s = spark
    import s.implicits._
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val topic = Files.createTempDirectory("http_topic").toString
    val srv = graft.streaming.HttpLogEndpoint.start(topic)
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val client = HttpClient.newHttpClient()
      def post(body: String) = client.send(
        HttpRequest.newBuilder(java.net.URI.create(s"$base/applog"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
      // liveness (the reference's `test` controller)
      client.send(
        HttpRequest.newBuilder(java.net.URI.create(s"$base/ping")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body() shouldBe "pong"
      val batch =
        """{"mid":"m1","page_id":"home","ts":1000}""" + "\n" +
        """not json"""
      post(batch).statusCode() shouldBe 200
      // a client that lost the ack retries the whole POST:
      // at-least-once into the log, same as a producer resend
      post(batch).statusCode() shouldBe 200
      post("""{"mid":"m2","start":"cold","ts":1500}""").statusCode() shouldBe 200
      FileTopic.replay(s, topic).count() shouldBe 5
      // the normal pipeline consumes the endpoint-fed topic
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("mid", StringType), StructField("page_id", StringType),
        StructField("last_page_id", StringType), StructField("ts", LongType),
        StructField("err", StringType), StructField("start", StringType),
        StructField("displays", ArrayType(StructType(Seq(
          StructField("pos", IntegerType), StructField("item", StringType)))))))
      val st = graft.streaming.Jobs.baseLogSplit(
        FileTopic.replay(s, topic), schema)
      st.dirty.count() shouldBe 2   // the duplicated non-json line
      st.page.count() shouldBe 2    // m1 twice (at-least-once)
      st.start.count() shouldBe 1
    } finally srv.stop(0)
  }

  test("a malformed record in the log is diverted, not poisonous (P2 over transport)") {
    val s = spark
    import s.implicits._
    val topic = Files.createTempDirectory("topicd").toString
    val dim = Files.createTempDirectory("dimtxd").toString + "/dim_user"
    val chk = Files.createTempDirectory("chkd").toString
    val dirty = Files.createTempDirectory("dirty").toString

    FileTopic.produce(topic,
      Seq(rec(1, "alice", 10), "not json at all", """{"half":true"""))
    val q = FileTopic.stream(s, topic)
      .selectExpr("value",
        "from_json(value, 'id LONG, name STRING, ver LONG') AS r")
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val clean = batch.where("r IS NOT NULL AND r.id IS NOT NULL")
          .selectExpr("r.id AS id", "r.name AS name", "r.ver AS ver")
        DimStore.upsert(s, dim, clean, "id", "ver")
        // side-output: dirty rows keep their raw payload for triage
        batch.where("r IS NULL OR r.id IS NULL").select("value")
          .write.mode("overwrite").parquet(s"$dirty/batch_$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    DimStore.read(s, dim).count() shouldBe 1
    s.read.parquet(s"$dirty/batch_*").as[String].collect().sorted shouldBe
      Array("not json at all", """{"half":true""")
  }
}
