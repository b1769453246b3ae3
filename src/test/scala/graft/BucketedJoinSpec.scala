package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.Tables

/** Bucketed co-located joins: the 100 TB answer to repeated fact⋈fact
  * joins on a stable key. Writing both tables bucketed (and sorted) by
  * the join key pre-shuffles the data ONCE at write time; every later
  * join on that key reads bucket-aligned splits and needs zero Exchange
  * — the shuffle that dominates a petabyte join simply isn't in the
  * plan. This is the batch analogue of the reference keeping its dim
  * tables keyed in HBase (DimSinkFunction's pk upserts). */
class BucketedJoinSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("bucketed-by-key tables join with no Exchange and match the plain join") {
    val s = spark
    import s.implicits._
    val li = Tables.load(s, sf0001, "lineitem").select($"l_orderkey", $"l_quantity")
    val o  = Tables.load(s, sf0001, "orders").select($"o_orderkey", $"o_orderpriority")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")

    // sf0.001 tables are broadcast-small; disable broadcast so the test
    // exercises the shuffle-join path a real fact⋈fact join would take
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = s.table("b_lineitem")
        .join(s.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      val rows = j.count()
      val p = j.queryExecution.executedPlan.toString
      p should include("SortMergeJoin")
      p should not include "Exchange"          // co-located: no shuffle at all
      p should include("Bucketed: true")

      val plain = Tables.load(s, sf0001, "lineitem")
        .join(Tables.load(s, sf0001, "orders"), $"l_orderkey" === $"o_orderkey")
        .count()
      rows shouldBe plain
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", saved)
      s.sql("DROP TABLE IF EXISTS b_lineitem")
      s.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
