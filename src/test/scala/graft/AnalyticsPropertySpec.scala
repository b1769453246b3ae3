package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.{Q, Relational}

/** Structural invariants of the round-3 analytics queries — properties
  * that must hold on ANY events table, not just the fixture the oracle
  * pins. */
class AnalyticsPropertySpec extends AnyFunSuite with Matchers with SparkFixture {

  test("q31 funnel stages are monotonically non-increasing") {
    val r = Relational.q31.run(spark, sf0001).head()
    val (v, vc, f) = (r.getLong(0), r.getLong(1), r.getLong(2))
    v should be >= vc
    vc should be >= f
    f should be >= 0L
  }

  test("q30 cohort counts at offset 0 sum to the total user population") {
    val s = spark
    import s.implicits._
    // every user appears in exactly one cohort, at day_offset 0
    val atZero = Relational.q30.run(s, sf0001)
      .filter($"day_offset" === 0)
      .agg(sum($"n_users")).head().getLong(0)
    val totalUsers = graft.core.Tables.load(s, sf0001, "events")
      .select($"user_id").distinct().count()
    atZero shouldBe totalUsers
  }

  test("q28 as-of counts: n_prior_orders never exceeds the user's total orders") {
    val s = spark
    import s.implicits._
    val asof = Relational.q28.run(s, sf0001)
    val perUser = graft.core.Tables.load(s, sf0001, "orders")
      .groupBy($"o_custkey".as("user_id")).agg(count(lit(1)).as("n_total"))
    asof.join(perUser, Seq("user_id"), "left")
      .filter($"n_prior_orders" > coalesce($"n_total", lit(0L)))
      .count() shouldBe 0
  }

  test("Q.epochS floors (matches DuckDB //) where a bare cast would truncate") {
    val s = spark
    import s.implicits._
    val rows = Seq(-1500000L, -1000000L, -1L, 0L, 1L, 1500000L, 2000000L)
      .toDF("us")
      .select($"us", Q.epochS($"us").as("floor_s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows(-1500000L) shouldBe -2L // truncation would give -1
    rows(-1000000L) shouldBe -1L
    rows(-1L) shouldBe -1L       // truncation would give 0
    rows(0L) shouldBe 0L
    rows(1L) shouldBe 0L
    rows(1500000L) shouldBe 1L
    rows(2000000L) shouldBe 2L
  }

  test("x55 trim partitions every source: kept + dropped = source count, lo <= hi") {
    val s = spark
    import s.implicits._
    val trims = graft.queries.Extensions.x55.run(s, sf0001)
    val perSource = graft.core.Tables.load(s, sf0001, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val joined = trims.join(perSource, "source").collect()
    joined.length shouldBe perSource.count()
    joined.foreach { r =>
      val (lo, hi, kept, dropped, n) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      lo should be <= hi
      (kept + dropped) shouldBe n
    }
  }

  test("x56 deciles partition the corpus and are value-monotone") {
    val s = spark
    import s.implicits._
    val bins = graft.queries.Extensions.x56.run(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    bins.map(_._2).sum shouldBe
      graft.core.Tables.load(s, sf0001, "documents").count()
    bins.foreach { case (d, _, mn, mx) =>
      d should (be >= 1L and be <= 10L); mn should be <= mx }
    bins.sliding(2).foreach {
      case Array((_, _, _, mxA), (_, _, mnB, _)) => mxA should be <= mnB
      case _ => ()
    }
  }

  test("x57 emits at most 3 terms per doc, scores non-increasing within a doc") {
    val s = spark
    import s.implicits._
    val rows = graft.queries.Extensions.x57.run(s, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      rs.length should be <= 3
      // the top-3 cut keeps the best scores: sorted desc they are the
      // same multiset as returned
      rs.map(_._3).sorted.reverse shouldBe rs.sortBy(r => (-r._3, r._2)).map(_._3)
    }
  }

  test("x58/x61: ppm stats bounded and prefix energy monotone in k") {
    val s = spark
    val disp = graft.queries.Extensions.x58.run(s, sf0001).collect()
    disp.foreach { r =>
      r.getLong(3) should be <= r.getLong(2) // min <= mean
      r.getLong(2) should be <= 1000000L
    }
    val en = graft.queries.Extensions.x61.run(s, sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1)
    en.map(_._1) shouldBe Array(16, 32, 48)
    en.sliding(2).foreach {
      case Array((_, a), (_, b)) => a should be <= b
      case _ => ()
    }
  }
}
