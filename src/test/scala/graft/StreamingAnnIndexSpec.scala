package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.AnnIndex

/** Top-level for the encoder. */
case class VecRow(vec_id: Long, v: Seq[Double])

/** Continuous index ingest: the persisted ANN index maintained from a
  * STREAM via per-micro-batch [[AnnIndex.append]] — the deployment
  * shape where embeddings arrive with the corpus (the same
  * foreachBatch-to-DimStore pattern as the uv_dim topology and
  * StreamingClusters' journal). Pins: streamed maintenance converges
  * to exactly the batch-built index, and at-least-once re-delivery of
  * a batch is absorbed (LWW on an identical row is a no-op). */
class StreamingAnnIndexSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def vec(id: Long): Seq[Double] =
    Seq.tabulate(64)(i => math.sin(id.toDouble * (i + 1) + (i + 1)))

  private def rows(ids: Range): Seq[VecRow] =
    ids.map(i => VecRow(i.toLong, vec(i.toLong)))

  private def codeSet(df: DataFrame): Set[String] =
    df.collect().map { r =>
      (0 until r.length).map(i => String.valueOf(r.get(i))).mkString("|")
    }.toSet

  test("per-micro-batch append converges to the batch-built index; " +
       "re-delivered batches are absorbed") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val path = Files.createTempDirectory("ann_stream").toString + "/idx"
    val chk = Files.createTempDirectory("ann_stream_chk").toString

    // bootstrap: build on the seed corpus (must contain the coarse
    // centroid ids) — the model freezes here, exactly like a dim
    // table's initial load
    val seed = rows(0 until 60).toDF()
    val model = AnnIndex.build(s, path, seed, "vec_id", "v",
      centroidIds = Seq(10L, 20L, 30L, 40L), dim = 64, m = 4, k = 4,
      rounds = 1)

    // stream the rest in: every micro-batch encodes ONLY itself under
    // the frozen model and merges — batchId versions the LWW so an
    // at-least-once redelivery replaces rows with identical content
    val mem = MemoryStream[VecRow]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: Dataset[Row], bid: Long) =>
        AnnIndex.append(s, path, batch.toDF(), "vec_id", "v",
          ver = 2L + bid)
        ()
      }.start()
    try {
      mem.addData(rows(60 until 90): _*)
      q.processAllAvailable()
      mem.addData(rows(90 until 120): _*)
      q.processAllAvailable()
      // re-deliver batch content (a new micro-batch carrying rows the
      // store already indexed — the at-least-once shape): LWW keeps
      // the index at one row per vector, codes unchanged
      mem.addData(rows(60 until 90): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = codeSet(AnnIndex.codes(s, path))
    val full = codeSet(AnnIndex.encodeWith(
      rows(0 until 120).toDF(), "vec_id", "v", model))
    streamed shouldBe full
    AnnIndex.codes(s, path).count() shouldBe 120L
    // the frozen model was never touched by ingest
    val m2 = AnnIndex.readModel(s, path)
    m2.pq.codebooks.flatten.flatten.toSeq shouldBe
      model.pq.codebooks.flatten.flatten.toSeq
  }
}
