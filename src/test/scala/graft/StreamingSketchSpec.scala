package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.UvSketchStore

/** Top-level (not nested in the suite): nested case classes can't get
  * a Spark encoder without their outer scope. */
case class SketchEv(ts: Timestamp, event_type: String, user_id: Long)

/** Incremental UV sketch maintenance: per-batch HLL sketches folded into
  * a tiny keyed store, rolled up to any grain without rescanning the
  * stream — and idempotent under micro-batch replay. */
class StreamingSketchSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def ev(day: Int, typ: String, uid: Long) =
    SketchEv(Timestamp.valueOf(f"2026-01-$day%02d 10:00:00"), typ, uid)

  test("sketch store accumulates across batches; rollup matches exact UV") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val store = Files.createTempDirectory("uvsketch").toString + "/store"
    val chk = Files.createTempDirectory("uvsketch-chk").toString

    val mem = MemoryStream[SketchEv]
    val q = mem.toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch(UvSketchStore.updateBatch(store) _)
      .start()
    try {
      // batch 1: day 1 — three viewers (one duplicated), one clicker
      mem.addData(ev(1, "view", 10), ev(1, "view", 11), ev(1, "view", 10),
        ev(1, "click", 20))
      q.processAllAvailable()
      // batch 2: day 2 — user 10 returns (new day, same user), new user 12
      mem.addData(ev(2, "view", 10), ev(2, "view", 12), ev(2, "click", 20))
      q.processAllAvailable()
    } finally q.stop()

    // per-type rollup: distinct users across ALL days, no raw rescan
    UvSketchStore.estimateByType(s, store)
      .as[(String, Long)].collect().sorted shouldBe
      Seq(("click", 1L), ("view", 3L))
    // per-day drill-down from the same store
    UvSketchStore.estimateByDay(s, store)
      .select($"event_type", $"uv").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap shouldBe
      Map("view" -> 4L, "click" -> 2L) // day-local distincts: 2+2 / 1+1

    // replay idempotence: folding an already-seen batch again moves no
    // estimate (sketch union is set-union)
    val replay = Seq(ev(1, "view", 10), ev(1, "view", 11)).toDF()
    UvSketchStore.updateBatch(store)(replay, batchId = 99L)
    UvSketchStore.estimateByType(s, store)
      .as[(String, Long)].collect().sorted shouldBe
      Seq(("click", 1L), ("view", 3L))
  }
}
