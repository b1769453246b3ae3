package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.QuantileStore

/** Top-level for the same encoder reason as SketchEv. */
case class QuantEv(ts: Timestamp, value: Double)

/** Incremental quantile maintenance: per-batch KLL summaries keyed
  * (day, batchId) in a LWW store, merged only at read time. The point
  * under test is the replay contract — quantile merge is a MULTISET
  * union (unlike HLL's set union), so at-least-once re-delivery must
  * OVERWRITE the batch's own summary row, never re-merge it. */
class StreamingQuantileSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def ev(day: Int, v: Double) =
    QuantEv(Timestamp.valueOf(f"2026-02-$day%02d 09:00:00"), v)

  /** Expected nearest-rank-below quantiles in cents. */
  private def exact(vs: Seq[Double]): (Long, Long, Long) = {
    val cents = vs.map(v => math.round(v * 100)).sorted
    def q(ppm: Long) = cents(((ppm * (cents.size - 1)) / 1000000L).toInt)
    (q(500000L), q(900000L), q(990000L))
  }

  test("per-day quantiles accumulate across batches and survive same-batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val store = Files.createTempDirectory("quantstore").toString + "/store"
    val chk = Files.createTempDirectory("quantstore-chk").toString

    val day1a = Seq(1.25, 7.5, 3.0)
    val day1b = Seq(9.99, 0.01)          // same day, later batch
    val day2b = Seq(42.0, 5.0, 5.0)      // second day arrives in batch 2

    val mem = MemoryStream[QuantEv]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch(QuantileStore.updateBatch(store) _)
      .start()
    try {
      mem.addData(day1a.map(ev(1, _)): _*)
      q.processAllAvailable()
      mem.addData((day1b.map(ev(1, _)) ++ day2b.map(ev(2, _))): _*)
      q.processAllAvailable()
    } finally q.stop()

    def byDay() = QuantileStore.quantilesByDay(s, store)
      .as[(java.sql.Date, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap

    val expected = Map(
      "2026-02-01" -> exact(day1a ++ day1b),
      "2026-02-02" -> exact(day2b))
    byDay() shouldBe expected

    // at-least-once re-delivery: the SAME batch id re-runs (Spark's
    // foreachBatch contract on recovery) — the summary row overwrites
    // itself and no estimate moves, even though quantile merge itself
    // is not idempotent
    val replay = (day1b.map(ev(1, _)) ++ day2b.map(ev(2, _))).toDF()
    QuantileStore.updateBatch(store)(replay, batchId = 1L)
    byDay() shouldBe expected

    // global rollup from the same summary rows, no raw rescan
    QuantileStore.quantilesGlobal(s, store)
      .as[(Long, Long, Long)].collect().head shouldBe
      exact(day1a ++ day1b ++ day2b)
  }
}
