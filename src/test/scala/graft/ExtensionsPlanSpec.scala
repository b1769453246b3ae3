package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.Extensions

/** Physical-plan assertions for the newest pipeline operators — the
  * 100 TB-shaped plan must be the one actually produced, and must not
  * silently regress (RelationalPlanSpec's charter, extended to the
  * extension tier). */
class ExtensionsPlanSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def plan(q: graft.queries.Q): String =
    q.run(spark, sf0001).queryExecution.executedPlan.toString

  test("x30: native char_bigrams feeds a broadcast-join scoring plan — " +
       "no per-char arrays, no per-row array_intersect") {
    graft.queries.Extensions.clearPersistedIntermediates()
    val p = plan(Extensions.x30)
    // the fused expression is in the scan-side projection...
    p should include("char_bigrams")
    // ...and the old 27 s shapes are gone: string split/zip_with gram
    // arrays and the rebuilt-per-row intersect probe
    p should not include "array_intersect"
    p should not include "zip_with"
    // rare-set scoring is a broadcast hash join + aggregation
    p should include("BroadcastHashJoin")
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x69: salted join shuffles on (key, salt), never a cross join") {
    val p = plan(Extensions.x69)
    p should include("__salt")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x39: dedup plan reads the staged cluster assignment — the Lloyd " +
       "build is not in the query plan") {
    graft.queries.Extensions.clearPersistedIntermediates()
    val p = plan(Extensions.x39)
    // scoring runs the fused native cosine over a cluster-keyed
    // equi-join of the STAGED assignment; the k-means iterations
    // (posexplode + per-dimension aggregation) happen once at stage
    // build, never per query
    p should include("vec_cosine")
    p should not include "posexplode"
    p should not include "CartesianProduct"
  }

  test("x48: the sample is planned as the native per-key top-k operator") {
    val p = plan(Extensions.x48)
    // partial+final TopKPerKeyExec — NOT a window sort over the corpus
    p should include("TopKPerKey")
    p should not include "Window"
    p should not include "row_number"
  }

  test("x46: bigram count tables broadcast back onto the bigram stream") {
    val p = plan(Extensions.x46)
    p should include("BroadcastHashJoin")
    p should not include "BroadcastNestedLoopJoin"
    // the corpus-sized side must never be the broadcast build side:
    // both broadcasts are the aggregated count tables
    p should include("HashAggregate")
  }

  test("x50: both sketches ride ONE keyed aggregation (no extra shuffles)") {
    val df = Extensions.x50.run(spark, sf0001)
    val p = df.queryExecution.executedPlan.toString
    // sketch aggregates run in the object-hash aggregate path with a
    // partial/final split around a single hashpartitioning exchange
    p should include("ObjectHashAggregate")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    withClue(s"expected exactly 1 keyed exchange, plan:\n$p\n") {
      exchanges shouldBe 1
    }
    p should not include "Window"
  }

  test("x47: sketch aggregate has a partial/final split (map-side combine)") {
    val p = plan(Extensions.x47)
    p should include("ObjectHashAggregate")
    // partial aggregation appears below the exchange, final above —
    // two ObjectHashAggregate nodes total
    "ObjectHashAggregate".r.findAllIn(p).size shouldBe 2
  }

  test("x55: sketch bounds broadcast back — no per-source corpus sort") {
    val p = plan(Extensions.x55)
    p should include("ObjectHashAggregate")   // QuantileSketch partial/final
    p should include("BroadcastHashJoin")     // bounds → broadcast, not SMJ
    p should not include "SortMergeJoin"
    p should not include "Window"             // no percent_rank global sort
  }

  test("x56: decile binning has no global window (ntile-free equi-depth)") {
    val p = plan(Extensions.x56)
    p should include("ObjectHashAggregate")
    // no Window node anywhere — neither ntile nor percent_rank; the
    // boundary array broadcasts and binning is a narrow map ("ntile"
    // itself can't be asserted textually: "quantile_sketch" contains it)
    p should not include "Window"
  }

  test("x57: top-3 terms planned as the native per-key top-k operator") {
    val p = plan(Extensions.x57)
    p should include("TopKPerKey")
    p should not include "Window"
    p should not include "row_number"
  }

  test("x58: centroid table broadcasts; no corpus-grain window or SMJ") {
    val p = plan(Extensions.x58)
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("x59: both per-query cuts run on the native top-k heap operator") {
    val p = plan(Extensions.x59)
    "TopKPerKey".r.findAllIn(p).size should be >= 2
    p should not include "Window"
    p should not include "row_number"
  }

  test("x60: top-20 cut is a bounded heap, not a global sort") {
    val p = plan(Extensions.x60)
    p should include("TakeOrderedAndProject")
    p should not include "Window"
  }

  test("x63: overlap matrix joins on the token key — never a cross join") {
    val p = plan(Extensions.x63)
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin") // vocab sizes broadcast back
  }

  test("x64: both axis sketches ride one aggregation; bins are a narrow map") {
    val p = plan(Extensions.x64)
    // ONE ObjectHashAggregate pair (partial+final) carrying BOTH
    // QuantileSketch columns — not one aggregation per axis
    val sketchAggs = "ObjectHashAggregate".r.findAllIn(p).size
    withClue(s"expected 2 (partial+final), plan:\n$p\n") {
      sketchAggs shouldBe 2
    }
    // the 1-row boundary table broadcasts back (BNLJ on a 1-row build
    // side is the scalar-subquery shape, q34 precedent); binning itself
    // must not sort or window the corpus
    p should not include "SortMergeJoin"
    p should not include "Window"
  }

  test("x66: pair counting aggregates the distinct-word table, bounded cut") {
    val p = plan(Extensions.x66)
    // top-30 is a TakeOrderedAndProject heap, never a global sort or
    // window; all joins are aggregation-internal (none at all)
    p should include("TakeOrderedAndProject")
    p should not include "Window"
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("x68: coverage windows the vocab; totals broadcast back") {
    val p = plan(Extensions.x68)
    // the running sum windows per-source VOCAB rows (expected Window),
    // and the totals table comes back as a broadcast hash join — the
    // corpus-sized side is never sort-merge-joined or cross-joined
    p should include("Window")
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("x12/x75: IVF list assignment is a pure narrow map — no corpus " +
       "window, no corpus-side shuffle before candidate scoring") {
    for (q <- Seq(Extensions.x12, Extensions.x75)) {
      val p = plan(q)
      withClue(s"${q.name} plan:\n$p\n") {
        // the ×4-amplified join + per-vec_id row_number the original
        // formulation paid is gone: every Window left is the per-QUERY
        // top-k cut (3 partitions), and the only shuffles are that
        // cut's — centroids/codebooks/probes all arrive as literals or
        // broadcasts
        p should not include "SortMergeJoin"
        p should not include "CartesianProduct"
        val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
        exchanges should be <= 1
      }
    }
  }

  test("x72/x75/x78: batch-query ADC is ONE scan of the code side joined " +
       "against a broadcast query-LUT frame — scan count O(1) in |queries|") {
    for (q <- Seq(Extensions.x72, Extensions.x75)) {
      val p = plan(q)
      withClue(s"${q.name} plan:\n$p\n") {
        // the per-query unionByName unrolling re-scanned the codes per
        // query and grew the driver plan with |queries|; the LUT-join
        // form reads the corpus-derived side exactly once
        "FileScan parquet".r.findAllIn(p).size shouldBe 1
        p should not include "Union"
      }
    }
    // the staged route (x78) builds its probe LUTs EXECUTOR-side
    // (AnnIndex.queryProbes is a narrow map, no driver collect), so
    // its plan reads exactly TWO parquet sides — the staged codes and
    // the query batch — still O(1) in |queries|, and the query side
    // arrives at the join as a broadcast
    val p78 = plan(Extensions.x78)
    withClue(s"x78 plan:\n$p78\n") {
      "FileScan parquet".r.findAllIn(p78).size shouldBe 2
      p78 should not include "Union"
      p78 should include("BroadcastHashJoin")
    }
  }

  test("w16: window heavy-hitters ride one keyed sketch aggregation") {
    val p = plan(graft.queries.Warehouse.w16)
    p should include("ObjectHashAggregate")
    // one hashpartitioning exchange at window grain; no per-(window,
    // type) count table + row_number fallback anywhere in the plan
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    withClue(s"expected exactly 1 keyed exchange, plan:\n$p\n") {
      exchanges shouldBe 1
    }
    p should not include "Window"
  }
}
