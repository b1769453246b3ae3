package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._

import graft.functions.SpaceSavingTopK

/** The SpaceSaving heavy-hitters aggregate: exactness when capacity ≥
  * distinct, the paper's error bounds when it isn't, and insensitivity
  * to the partial/final split (the property that makes it a legal
  * distributed aggregate). */
class SpaceSavingSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def summarize(tokens: Seq[Seq[String]], capacity: Int,
                        partitions: Int): Seq[(String, Long, Long)] = {
    val s = spark
    import s.implicits._
    // partitions == 1 uses the NARROW coalesce, not repartition(1): a
    // round-robin shuffle to one partition does not fix the row ORDER
    // the single reducer sees — shuffle-block fetch order is
    // nondeterministic across executor JVMs (stable inside local[n],
    // which is why this only surfaced on the local-cluster suite run).
    // The determinism test's premise is "same input order twice", and
    // coalesce preserves the deterministic local-Seq order.
    val df =
      if (partitions == 1) tokens.toDF("toks").coalesce(1)
      else tokens.toDF("toks").repartition(partitions)
    val agg = GraftPlanBridge.col(
      SpaceSavingTopK(GraftPlanBridge.expr($"toks"), capacity)
        .toAggregateExpression())
    df.agg(agg.as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.term", $"h.cnt", $"h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def exact(tokens: Seq[Seq[String]]): Map[String, Long] =
    tokens.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("capacity >= distinct: summary is exact with zero error, any partitioning") {
    val rnd = new scala.util.Random(11)
    val tokens = Seq.fill(500)(Seq.fill(1 + rnd.nextInt(20))(s"w${rnd.nextInt(30)}"))
    val truth = exact(tokens)
    for (parts <- Seq(1, 3, 8)) {
      val out = summarize(tokens, capacity = 64, partitions = parts)
      out.map(t => t._1 -> t._2).toMap shouldBe truth
      all(out.map(_._3)) shouldBe 0L
    }
  }

  test("capacity < distinct: est-err <= true <= est; true heavy hitters retained") {
    val rnd = new scala.util.Random(23)
    // zipf-ish: a few heavy terms over a long tail of 200 distinct
    val tokens = Seq.fill(2000)(Seq(
      if (rnd.nextInt(10) < 6) s"heavy${rnd.nextInt(4)}"
      else s"tail${rnd.nextInt(200)}"))
    val truth = exact(tokens)
    val n = truth.values.sum
    val cap = 32
    val out = summarize(tokens, capacity = cap, partitions = 4)
    out.size should be <= cap
    out.foreach { case (term, est, err) =>
      val true_ = truth.getOrElse(term, 0L)
      est should be >= true_           // never underestimates
      (est - err) should be <= true_   // error bound holds
    }
    // every item with true count > N/capacity must survive the merges
    val kept = out.map(_._1).toSet
    truth.filter(_._2 > n / cap).keys.foreach { hh =>
      kept should contain(hh)
    }
  }

  test("deterministic under repartitioning in the approximate regime's exact subset") {
    // heavy terms' ESTIMATES can vary with split points, but the exact
    // regime inside one partition cannot: single partition twice = same
    val rnd = new scala.util.Random(5)
    val tokens = Seq.fill(300)(Seq.fill(3)(s"t${rnd.nextInt(50)}"))
    val a = summarize(tokens, capacity = 16, partitions = 1)
    val b = summarize(tokens, capacity = 16, partitions = 1)
    a shouldBe b
  }
}
