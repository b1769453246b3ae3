package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch

/** The deterministic-KLL quantile aggregate: exactness while n ≤
  * capacity (the regime x47's oracle grades), bounded rank error under
  * compaction, and insensitivity to the partial/final split in the
  * exact regime. */
class QuantileSketchSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val ProbsPpm = Seq(500000L, 900000L, 990000L)

  private def sketch(values: Seq[Long], capacity: Int,
                     partitions: Int): Seq[Long] = {
    val s = spark
    import s.implicits._
    val df = values.toDF("v").repartition(partitions)
    val agg = GraftPlanBridge.col(
      QuantileSketch(GraftPlanBridge.expr($"v"), capacity, ProbsPpm)
        .toAggregateExpression())
    df.agg(agg.as("qs")).select(explode($"qs").as("q"))
      .collect().map(_.getLong(0)).toSeq
  }

  /** Nearest-rank-below order statistic, the definition the sketch's
    * eval (and x47's DuckDB oracle) implements. */
  private def exact(values: Seq[Long]): Seq[Long] = {
    val sorted = values.sorted
    ProbsPpm.map(p => sorted((p * (values.size - 1) / 1000000L).toInt))
  }

  test("n <= capacity: exact order statistics under any partitioning") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(800)(rnd.nextInt(100000).toLong)
    for (parts <- Seq(1, 3, 8))
      sketch(values, capacity = 1024, partitions = parts) shouldBe exact(values)
  }

  test("n <= capacity: duplicates and tiny groups") {
    sketch(Seq(5L, 5L, 5L, 5L), capacity = 1024, partitions = 2) shouldBe
      Seq(5L, 5L, 5L)
    sketch(Seq(42L), capacity = 1024, partitions = 1) shouldBe
      Seq(42L, 42L, 42L)
  }

  test("n >> capacity: rank error stays within the compactor bound") {
    // 50k uniform values through a 64-slot sketch: rank error per the
    // KLL analysis is O(n/capacity) per compaction level; assert the
    // loose practical bound 4·n/capacity that the deterministic
    // odd-keep variant observes with margin.
    val rnd = new scala.util.Random(13)
    val n = 50000
    val values = Seq.fill(n)(rnd.nextInt(1000000).toLong)
    val sorted = values.sorted
    val got = sketch(values, capacity = 64, partitions = 8)
    val bound = 4 * n / 64
    ProbsPpm.zip(got).foreach { case (p, est) =>
      val targetRank = (p * (n - 1) / 1000000L).toInt
      // rank of the estimate in the true sorted order (any tie works)
      val lo = sorted.indexWhere(_ >= est)
      val hi = sorted.lastIndexWhere(_ <= est)
      val err = math.min(math.abs(lo - targetRank), math.abs(hi - targetRank))
      withClue(s"p=$p est=$est targetRank=$targetRank err=$err bound=$bound:") {
        err should be <= bound
      }
    }
  }

  test("nulls are skipped, empty input yields null") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(1L), None, Some(3L), None, Some(2L)).toDF("v")
    val agg = GraftPlanBridge.col(
      QuantileSketch(GraftPlanBridge.expr($"v"), 1024, ProbsPpm)
        .toAggregateExpression())
    // 3 non-null values {1,2,3}: rank = floor(p·(n-1)) = 1 for all
    // three probabilities → the middle value every time
    df.agg(agg.as("qs")).select(explode($"qs"))
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(2L, 2L, 2L)
    val empty = df.filter($"v" > 100L)
    empty.agg(agg.as("qs")).collect().head.isNullAt(0) shouldBe true
  }
}
