package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.{Registry, Relational}

/** Smoke + physical-plan assertions: the plans must be the ones we'd
  * want at 100 TB, not just any plan that returns rows (builder prompt:
  * "iterate until it's the plan you'd want"). */
class RelationalPlanSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def plan(q: graft.queries.Q): String =
    q.run(spark, sf0001).queryExecution.executedPlan.toString

  test("every registered query returns rows on sf0.001 (except candidate-pair queries)") {
    val mayBeEmpty = Set("q06_anti_join", "x02_minhash_lsh_neardup",
      "x04_ngram_jaccard_blocked", "x13_embedding_neardup",
      "x28_dedup_clusters",
      // candidate pairs again: sf0.001's ~77 sampled reingests over 50
      // docs hold no band collision (rows>0 is pinned at sf0.01/sf0.1
      // by the oracle gate: 77 / 684 pairs)
      "x95_ttl_neardup",
      // post-takedown labels over the x02 pair table — empty wherever
      // x02/x28 are (rows pinned at sf0.01/sf0.1 by the oracle gate)
      "x96_cluster_takedown",
      "x97_cluster_takedown_maintained")
    Registry.all.foreach { q =>
      val n = q.run(spark, sf0001).count()
      withClue(s"${q.name}: ") {
        if (!mayBeEmpty(q.name)) assert(n > 0, "expected rows")
      }
    }
  }

  test("registry names are unique and every query has an oracle") {
    val names = Registry.all.map(_.name)
    names.distinct.size shouldBe names.size
    Registry.all.filter(_.oracle.isEmpty) shouldBe empty
  }

  test("q02: filter and projection are pushed to the parquet scan") {
    val p = plan(Relational.q02)
    p should include("PushedFilters")
    p should include("o_orderstatus")
    // pruned read schema — no l_/extra columns
    p.toLowerCase should not include "o_orderdate"
  }

  test("timestamp predicates push through Tables.load's NTZ normalization " +
       "to the parquet scan (cast eliminated, literal rewritten)") {
    // Tables.load casts TIMESTAMP_NTZ fixture columns to TIMESTAMP; a
    // filter above that cast must still reach PushedFilters — Catalyst
    // eliminates the order-preserving cast under the UTC session tz.
    // If a load-layer change ever re-materializes the cast, date-range
    // scans stop pruning at the parquet reader and every 100 TB
    // shipdate slice becomes a full-table read: fail here, loudly.
    val s = spark
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.load(s, sf0001, "lineitem")
    val p = li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    p should include("LessThanOrEqual(l_shipdate")   // pushed, not just Filter
    p should include("IsNotNull(l_shipdate)")
    // column pruning survives the normalization layer too
    p should include("ReadSchema: struct<l_orderkey:bigint,l_quantity:double,l_shipdate")
  }

  test("q03: small dims broadcast, fact join does not broadcast the fact") {
    val p = plan(Relational.q03)
    p should include("BroadcastHashJoin")
    // customer⋈orders on the key: AQE picks SMJ or shuffled hash, either
    // is scale-safe; what must NOT happen is a broadcast of orders
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q20: global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val p = plan(Relational.q20)
    p should include("TakeOrderedAndProject")
  }

  test("q01: aggregation is partial+final hash agg with one keyed exchange") {
    val p = plan(Relational.q01)
    p should include("partial_sum")                      // map-side combine
    p should include("Exchange hashpartitioning")        // one keyed shuffle
    p should include("PushedFilters")                    // scan-level filter
  }

  test("flagship entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("q28 as-of join: one keyed shuffle, no join operator at all") {
    val p = plan(Relational.q28)
    // the union+running-window composition: a single hashpartitioning
    // exchange on user_id replaces any per-event probe join
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") shouldBe 1
    p should not include "Join"
  }

  test("q29 range join: expanded small side takes a broadcast HASH join") {
    val p = plan(Relational.q29)
    p should include("BroadcastHashJoin")
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x20 stratified sample: broadcast config, fact side never shuffles") {
    val p = plan(graft.queries.Extensions.x20)
    p should include("BroadcastHashJoin")
    p should not include "Exchange hashpartitioning"
  }

  test("x23 decontamination: benchmark set broadcast to the corpus scan") {
    val p = plan(graft.queries.Extensions.x23)
    p should include("BroadcastHashJoin")
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q37 full outer: both sides reduced before the join, no nested loop") {
    val p = plan(Relational.q37)
    p should include("FullOuter")
    p should not include "BroadcastNestedLoopJoin"
    // the events side aggregates to user grain BEFORE joining: the
    // partial agg must appear under the join, not above it
    p should include("partial_count")
  }

  test("q38 unpivot: stack generates from the agg output without a new shuffle") {
    val p = plan(Relational.q38)
    p should include("Generate stack")
    // one exchange for the customer⋈orders join keys + one for the
    // segment agg; the generator itself must add none
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") should be <= 3
  }

  test("x31 edit-distance dedup: blocked self-join is an equi-join, never a cross join") {
    val p = plan(graft.queries.Extensions.x31)
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  private def countExchanges(p: String): Int =
    p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")

  test("q04: lineitem pre-aggregates to order grain BELOW the fact join") {
    val p = plan(Relational.q04)
    // the 100 TB-right shape: partial_sum over lineitem feeds the join
    // (pre-agg below), countDistinct is gone (plain count post-agg), and
    // the only keyed exchanges are the order-grain join + the 5-row
    // priority agg — never two fact-sized shuffles
    p should include("partial_sum")
    p.toLowerCase should not include "distinct"
    // two partial aggs print: the priority agg above the join and the
    // order-grain pre-agg below it — the LAST one must sit under the join
    val joinIdx = p.indexOf("Join")
    val partialIdx = p.lastIndexOf("partial_sum")
    assert(joinIdx >= 0 && partialIdx > joinIdx,
      "pre-aggregation must appear BELOW (after, in plan text) the join")
    countExchanges(p) should be <= 3
  }

  test("x32 span dedup / x34 source overlap: keyed equi-joins, never a cross join") {
    Seq(graft.queries.Extensions.x32, graft.queries.Extensions.x34).foreach { x =>
      val p = plan(x)
      withClue(s"${x.name}: ") {
        p should not include "CartesianProduct"
        p should not include "BroadcastNestedLoopJoin"
      }
    }
  }

  test("x35 char diversity: native expression, no explode, no shuffle at all") {
    val p = plan(graft.queries.Extensions.x35)
    p should include("char_stats")
    p should not include "Generate"            // no explode
    countExchanges(p) shouldBe 0               // pure per-row map
  }

  test("q27 pre-agg join: aggregation sits below the join, bounded exchanges") {
    val p = plan(Relational.q27)
    // the shape that survives 100x: lineitem collapses to order grain
    // BEFORE the join (partial_sum under the join operator), and the
    // only exchanges are (1) the pre-agg's l_orderkey shuffle, (2) the
    // orders join side, (3) the tiny priority agg. The pre-agg output
    // is already clustered by l_orderkey, so the join must NOT add a
    // fourth fact-sized exchange on the agg side. At runtime AQE may
    // further collapse (2) into a broadcast from observed stats —
    // that's adaptive icing, not something the static plan relies on;
    // at true scale both sides are fact-sized and the keyed join is
    // the correct fallback, which is why this pins the static shape.
    p should include("partial_sum")
    val joinIdx = p.indexOf("Join")
    val partialIdx = p.lastIndexOf("partial_sum")
    assert(joinIdx >= 0 && partialIdx > joinIdx,
      "pre-aggregation must appear BELOW (after, in plan text) the join")
    countExchanges(p) should be <= 3
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q33: single fact shuffle — groupBy and window reuse the repartition") {
    val p = plan(Relational.q33)
    // one Exchange on l_orderkey carries the whole computation up to the
    // (tiny) supplier-name agg; the per-supplier max, order-grain window
    // counts, and filter are all partition-local on that exchange, and
    // the old 3x self-join of lineitem is gone (one scan of lineitem)
    val scans = "Scan parquet".r.findAllIn(p).size
    scans should be <= 3 // lineitem once + supplier (+ AQE re-list at most)
    countExchanges(p) should be <= 3 // repartition + s_name agg (+1 slack)
    p should not include "left_semi"
    p should not include "LeftSemi"
  }

  test("q39: recursive CTE plans as the iterative UnionLoop operator") {
    val p = plan(graft.queries.Relational.q39)
    // Spark 4's recursive-CTE physical node, not a unrolled/cartesian
    // emulation of the traversal
    p should include("UnionLoop")
    p should not include "CartesianProduct"
  }
}
