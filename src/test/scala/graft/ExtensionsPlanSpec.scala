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
}
