package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.{DsirGate, StreamingFunnel}

/** One funnel doc — top-level for the Spark encoder. */
case class FunnelDoc(ts: java.sql.Timestamp, doc_id: Long, lang: String,
                     text: String)

/** The streaming curation funnel ([[StreamingFunnel]]) must reproduce
  * the batch x93 stage semantics on a replayed fixture: gates + exact
  * keep-first, near-dup cluster drop (one survivor per component),
  * DSIR gate against the same frozen model — per-stage counts equal a
  * batch recompute through the same definitions. Plus: the generic
  * [[DsirGate.trainRatio]] trainer is bit-identical to the x90
  * fixture-bound trainer, so the staged model the funnel serves cannot
  * drift from the oracle-pinned one. */
class StreamingFunnelSpec extends AnyFunSuite with Matchers
    with SparkFixture {

  private val base = Seq.tabulate(40)(i => s"tok${i % 13} word$i").mkString(" ")
  private val near = base.replace("word20", "changed20")
  private def unrelated(i: Int): String =
    Seq.tabulate(30)(j => s"u${i}t$j distinct$i$j").mkString(" ")
  private val targetText =
    Seq.tabulate(20)(j => s"targetword phrase$j").mkString(" ")

  test("stream ≡ batch per-stage counts on a replayed fixture; the " +
       "frozen model gates identically at ingest") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ts(i: Int) = new java.sql.Timestamp(3600000L + i * 1000L)

    // the corpus: every funnel stage has work to do —
    //  1: keeper (en)            2: near-dup of 1 → cluster-dropped
    //  3: exact dup of 1 → dedup 4: unrelated singleton (en)
    //  5: lang-rejected (de)     6: length-rejected (2 tokens)
    //  7,8: target-rich docs → DSIR-accepted (8 near-dups 7)
    val docs = Seq(
      FunnelDoc(ts(0), 1L, "en", base),
      FunnelDoc(ts(1), 2L, "en", near),
      FunnelDoc(ts(2), 3L, "en", base),
      FunnelDoc(ts(3), 4L, "en", unrelated(4)),
      FunnelDoc(ts(4), 5L, "de", unrelated(5)),
      FunnelDoc(ts(5), 6L, "en", "too short"),
      FunnelDoc(ts(6), 7L, "en", targetText),
      FunnelDoc(ts(7), 8L, "en", targetText.replace("phrase3", "other3")))

    // the staged frozen model: target = targetword-rich docs. Smoothed
    // default/raw-only ratios sit well under 1e6 ppm and target-only
    // buckets just over, so the 1e6 threshold splits the corpus.
    val ratio = DsirGate.trainRatio(docs.toDF(),
      isTarget = col("text").contains("targetword")).persist()
    ratio.count() shouldBe 4096L

    // ---- stream: two chained queries over three micro-batches ----
    val dir = Files.createTempDirectory("funnel").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/survivors"))
    val mem = MemoryStream[FunnelDoc]
    val q1 = StreamingFunnel.startGateStage(mem.toDF(), ratio, dir,
      langs = Seq("en"), minToks = 3, watermark = "1 hour",
      minScorePpm = 1000000L, checkpoint = s"$dir/chk1")
    val q2 = StreamingFunnel.startNeardupStage(s, dir, s"$dir/chk2")
    try {
      docs.grouped(3).foreach { b =>
        mem.addData(b: _*); q1.processAllAvailable()
      }
    } finally q1.stop()
    try q2.processAllAvailable() finally q2.stop()
    val got = StreamingFunnel.stageCounts(s, dir)

    // ---- batch twin: the same stage definitions, batch mode ----
    val corpus = docs.toDF()
    val gated = corpus
      .filter($"lang".isin("en") &&
        org.apache.spark.sql.functions.size(split($"text", " ")) >= 3)
      .withColumn("fp", graft.queries.Q.normFingerprint($"text"))
    // exact keep-first ≡ one survivor per fingerprint (min id — the
    // arrival order above is id order, so the sets match too)
    val surv = gated.groupBy($"fp").agg(min($"doc_id").as("doc_id"))
      .join(gated.select($"doc_id", $"text"), "doc_id")
      .select($"doc_id", $"text")
    val gatedB = surv.count()
    // near-dup cluster drop: batch-mode detector + star contraction,
    // keep the rep per component + every untouched singleton
    val edges = graft.streaming.StreamingNearDup(surv).toDF()
      .select($"keeperId".as("a"), $"dupId".as("b"))
    val labels = graft.ops.ConnectedComponents.starContraction(edges)
    val keptB = surv.join(labels, surv("doc_id") === labels("id"), "left")
      .filter($"id".isNull || $"rep" === $"doc_id")
      .select($"doc_id", $"text").persist()
    val keptCount = keptB.count() // materialize before releasing labels
    labels.unpersist()
    // DSIR last, over the near-dup survivors, same frozen model
    val dsirB = DsirGate.score(keptB.withColumn("lang", lit("en")), ratio)
      .filter($"score_ppm" >= 1000000L).count()

    got shouldBe StreamingFunnel.StageCounts(gatedB, keptCount, dsirB)
    keptB.unpersist()

    // the TTL'd (bounded-state) stage-2 route over the same replayed
    // layer: every fixture row sits inside one reingest window, so the
    // candidates — and therefore the maintained labels and the stage
    // counts — are identical to the unbounded route's
    val q3 = StreamingFunnel.startNeardupStage(s, dir, s"$dir/chk3",
      ttl = Some(java.time.Duration.ofDays(1)))
    try q3.processAllAvailable() finally q3.stop()
    StreamingFunnel.stageCounts(s, dir) shouldBe got

    // the funnel genuinely narrows at every stage on this fixture
    got.gated shouldBe 5L          // 8 raw − de − short − exact dup
    got.neardupKept shouldBe 3L    // {1,2}→1, {7,8}→7, singleton 4
    got.dsirAccepted shouldBe 1L   // only the target-rich survivor 7
    ratio.unpersist()
  }

  test("survivor-layer filesPerBatch knob: each micro-batch writes at " +
       "most filesPerBatch files (stage 2's 'topic partitions' sizing " +
       "— the file count, not the row count, prices the downstream " +
       "leg), stage counts unchanged; 0 is refused") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    def ts(i: Int) = new java.sql.Timestamp(3600000L + i * 1000L)
    val docs = (0 until 8).map(i =>
      FunnelDoc(ts(i), i.toLong, "en", unrelated(i)))
    val ratio = DsirGate.trainRatio(docs.toDF(),
      isTarget = col("text").contains("targetword")).persist()

    def run(filesPerBatch: Int): (Long, Long) = {
      val dir = Files.createTempDirectory("funnel_fpb").toString
      val mem = MemoryStream[FunnelDoc]
      val q = StreamingFunnel.startGateStage(mem.toDF(), ratio, dir,
        langs = Seq("en"), minToks = 3, watermark = "1 hour",
        minScorePpm = 0L, checkpoint = s"$dir/chk1",
        filesPerBatch = filesPerBatch)
      try docs.grouped(4).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      } finally q.stop()
      val files = {
        val l = Files.list(java.nio.file.Paths.get(s"$dir/survivors"))
        try {
          import scala.jdk.CollectionConverters._
          l.iterator().asScala.count(_.getFileName.toString
            .startsWith("part-"))
        } finally l.close()
      }
      val rows = s.read.parquet(s"$dir/survivors").count()
      (files.toLong, rows)
    }
    val (f1, rows1) = run(1)
    f1 shouldBe 2L // one file per micro-batch, two batches
    val (f2, rows2) = run(2)
    f2 should be <= 4L // at most filesPerBatch per micro-batch
    f2 should be > 2L  // ...and the knob really widened the layout
    rows2 shouldBe rows1 // sizing files never changes the data
    an[IllegalArgumentException] should be thrownBy
      StreamingFunnel.startGateStage(null, ratio, "/tmp/x",
        langs = Seq("en"), minToks = 3, watermark = "1 hour",
        minScorePpm = 0L, checkpoint = "/tmp/x", filesPerBatch = 0)
    ratio.unpersist()
  }

  test("trainRatio ≡ the x90 fixture trainer bit-for-bit (the staged " +
       "model the gate serves cannot drift from the oracle-pinned one)") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, BigDecimal] =
      df.selectExpr("b", "cast(r_ppm as decimal(38,0)) as r_ppm")
        .collect().map(r => (r.getLong(0), BigDecimal(r.getDecimal(1)))).toMap
    val generic = asMap(DsirGate.trainRatio(
      graft.core.Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text")),
      isTarget = col("lang") === "en"))
    val fixture = asMap(graft.queries.Extensions.dsirRatio(s, dir))
    generic shouldBe fixture
  }
}
