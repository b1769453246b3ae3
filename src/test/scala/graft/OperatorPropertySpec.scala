package graft

import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming._

/** Property-based invariants (SURVEY §5.4) for the stateful operators,
  * exercised in batch mode over generated event histories. */
class OperatorPropertySpec extends AnyFunSuite with Matchers with SparkFixture {

  /** Seeded sampling in place of the scalatestplus forAll bridge (not
    * in the offline dependency cache): 20 deterministic draws. */
  private def forAllSampled[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 20).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val genEvents: Gen[List[PageLog]] = for {
    n <- Gen.choose(0, 60)
    events <- Gen.listOfN(n, for {
      mid <- Gen.oneOf("m1", "m2", "m3")
      page <- Gen.oneOf("home", "cart", "good", "detail")
      entry <- Arbitrary.arbitrary[Boolean]
      ts <- Gen.choose(0L, 3L * 86400000L)
      isNew <- Gen.oneOf("0", "1")
    } yield PageLog(mid, page, if (entry) None else Some("x"), ts, isNew))
  } yield events

  test("DedupDaily is idempotent and keeps exactly one event per (mid, day)") {
    val s = spark
    import s.implicits._
    forAllSampled(genEvents) { events =>
      val once = DedupDaily(s.createDataset(events)).collect().toSeq
      // exactly one survivor per touched (mid, day)
      val keys = once.map(e => (e.mid, Dates.toDate(e.ts)))
      keys.distinct.length shouldBe keys.length
      keys.toSet shouldBe events.map(e => (e.mid, Dates.toDate(e.ts))).toSet
      // idempotence: dedup of the deduped output is a no-op
      val twice = DedupDaily(s.createDataset(once)).collect().toSeq
      twice.map(e => (e.mid, e.ts)).sorted shouldBe once.map(e => (e.mid, e.ts)).sorted
    }
  }

  test("VisitorFlagRepair preserves rows, only weakens flags, 1 only on first date") {
    val s = spark
    import s.implicits._
    forAllSampled(genEvents) { events =>
      val out = VisitorFlagRepair(s.createDataset(events)).collect().toSeq
      out.size shouldBe events.size
      out.map(e => (e.mid, e.ts, e.pageId)).sorted shouldBe
        events.map(e => (e.mid, e.ts, e.pageId)).sorted
      // repaired=1 requires claimed=1 on the same (mid, ts)
      val claimed = events.groupBy(e => (e.mid, e.ts, e.pageId))
      out.filter(_.isNew == "1").foreach { e =>
        claimed((e.mid, e.ts, e.pageId)).exists(_.isNew == "1") shouldBe true
      }
      // all 1s for a mid fall on a single date (its first flagged date)
      out.filter(_.isNew == "1").groupBy(_.mid).values.foreach { es =>
        es.map(e => Dates.toDate(e.ts)).distinct.size shouldBe 1
      }
    }
  }

  test("BounceDetector: bounces are entry events, each input classified at most once") {
    val s = spark
    import s.implicits._
    forAllSampled(genEvents) { events =>
      val bounces = BounceDetector(s.createDataset(events)).collect().toSeq
      val entries = events.filter(_.lastPageId.isEmpty).map(e => (e.mid, e.ts))
      // every bounce is one of the input's entry events
      bounces.foreach { b => entries should contain((b.mid, b.ts)) }
      // no event bounces twice
      val ids = bounces.map(b => (b.mid, b.ts))
      ids.distinct.length shouldBe ids.length
    }
  }
}
