package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.CurationPipeline

case class CurDoc(ts: Timestamp, doc_id: Long, lang: String, text: String)

/** Streaming corpus curation: quality gates + watermark-bounded
  * content dedup, rejections to a side sink. */
class CurationPipelineSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def doc(sec: Int, id: Long, lang: String, text: String) =
    CurDoc(Timestamp.valueOf(f"2026-03-01 10:00:$sec%02d"), id, lang, text)

  test("clean keeps first copy per fingerprint; gates route to rejected with reasons") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val out = Files.createTempDirectory("curation").toString
    val good = "the quick brown fox jumps over the lazy dog again and again"

    val mem = MemoryStream[CurDoc]
    val cleanQ = CurationPipeline.clean(mem.toDF(), Seq("en", "de"), 5, "10 seconds")
      .writeStream.option("checkpointLocation", s"$out/chk_clean")
      .format("parquet").option("path", s"$out/clean").start()
    val rejQ = CurationPipeline.rejected(mem.toDF(), Seq("en", "de"), 5)
      .writeStream.option("checkpointLocation", s"$out/chk_rej")
      .format("parquet").option("path", s"$out/rejected").start()
    try {
      mem.addData(
        doc(1, 1, "en", good),
        doc(2, 2, "en", "  THE  quick brown fox jumps over the lazy dog again and again "),
        doc(3, 3, "xx", good),        // lang gate
        doc(4, 4, "en", "too short"), // length gate
        doc(5, 5, "de", "ein ganz anderer text mit genug vielen worten darin ja"))
      cleanQ.processAllAvailable(); rejQ.processAllAvailable()
    } finally { cleanQ.stop(); rejQ.stop() }

    // doc 2 normalizes to doc 1's fingerprint -> deduped; 3 and 4 gated
    s.read.parquet(s"$out/clean").select("doc_id").as[Long]
      .collect().sorted shouldBe Array(1L, 5L)
    s.read.parquet(s"$out/rejected").select("doc_id", "reason")
      .as[(Long, String)].collect().sorted shouldBe
      Array((3L, "lang"), (4L, "too_short"))
  }

  test("null lang/text docs land in rejected, never silently vanish") {
    val s = spark
    import s.implicits._
    // batch forms of the same expressions (the gates are identical
    // columns; no stream needed to exercise the null semantics)
    val in = Seq(
      CurDoc(Timestamp.valueOf("2026-03-01 10:00:00"), 1L, null,
        "plenty of perfectly good words in this document right here"),
      CurDoc(Timestamp.valueOf("2026-03-01 10:00:01"), 2L, "en", null))
      .toDF()
    val rejected = CurationPipeline.rejected(in, Seq("en"), 5)
      .as[(Long, String, String)].collect().map(r => (r._1, r._3)).sorted
    rejected shouldBe Array((1L, "lang"), (2L, "too_short"))
  }
}
