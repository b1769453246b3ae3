package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._

import graft.functions.{BloomFilterBuildAgg, BloomMightContain}

/** The bloom build aggregate + probe expression: zero false negatives
  * (the property the decontamination pipeline's exactness rests on),
  * a sane false-positive rate, partitioning-independent bits (legal
  * distributed aggregate), and bloom-prefilter ≡ exact-set results on
  * the graded x45 shape. */
class BloomFilterSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def buildBloom(values: Seq[Long], partitions: Int,
                         expected: Long = 10000L): Array[Byte] = {
    val s = spark
    import s.implicits._
    val agg = GraftPlanBridge.col(
      BloomFilterBuildAgg(GraftPlanBridge.expr($"v"), expected, 0.01)
        .toAggregateExpression())
    values.toDF("v").repartition(partitions)
      .agg(agg.as("bf")).head.getAs[Array[Byte]](0)
  }

  private def probeAll(bloom: Array[Byte], values: Seq[Long]): Seq[Boolean] = {
    val s = spark
    import s.implicits._
    val probe = GraftPlanBridge.col(BloomMightContain(
      GraftPlanBridge.expr(lit(bloom)), GraftPlanBridge.expr($"v")))
    values.toDF("v").select(probe.as("hit"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("no false negatives: every inserted value probes true") {
    val rnd = new scala.util.Random(7)
    val inserted = Seq.fill(5000)(rnd.nextLong())
    val bloom = buildBloom(inserted, partitions = 4)
    probeAll(bloom, inserted).forall(identity) shouldBe true
  }

  test("false-positive rate on disjoint probes stays near configured fpp") {
    val inserted = (0L until 5000L).map(i => i * 2654435761L)
    val bloom = buildBloom(inserted, partitions = 4)
    // disjoint domain: different affine map, no collisions with inserted
    val absent = (0L until 20000L).map(i => i * 7919L + 1L)
      .filterNot(inserted.toSet)
    val fpRate = probeAll(bloom, absent).count(identity).toDouble / absent.size
    // configured 1%; allow generous slack for hash variance
    fpRate should be < 0.05
  }

  test("serialized bits are identical across partitionings (merge is bit-OR)") {
    val rnd = new scala.util.Random(13)
    val values = Seq.fill(3000)(rnd.nextLong())
    val b1 = buildBloom(values, partitions = 1)
    val b8 = buildBloom(values, partitions = 8)
    java.util.Arrays.equals(b1, b8) shouldBe true
  }

  test("null probe value yields NULL, null sketch yields NULL") {
    val s = spark
    import s.implicits._
    val bloom = buildBloom(Seq(1L, 2L, 3L), partitions = 1)
    val probe = GraftPlanBridge.col(BloomMightContain(
      GraftPlanBridge.expr(lit(bloom)),
      GraftPlanBridge.expr(when($"v" > 1L, $"v"))))
    val out = Seq(1L, 2L).toDF("v").select(probe.as("hit")).collect()
    out(0).isNullAt(0) shouldBe true
    out(1).isNullAt(0) shouldBe false
    val nullProbe = GraftPlanBridge.col(BloomMightContain(
      GraftPlanBridge.expr(lit(null).cast("binary")),
      GraftPlanBridge.expr($"v")))
    Seq(1L).toDF("v").select(nullProbe.as("hit"))
      .collect()(0).isNullAt(0) shouldBe true
  }

  test("x45: bloom-prefiltered decontamination equals the exact-set result") {
    val s = spark
    import s.implicits._
    val withBloom = graft.queries.Registry.byName("x45_bloom_decontam")
      .run(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // same computation with NO bloom prefilter — the exact reference
    val sh = graft.core.Tables.load(spark, sf0001, "documents")
      .select($"doc_id", split(lower($"text"), " ").as("toks"))
      .select($"doc_id",
        explode(array_distinct(expr(graft.ops.MinHash.TrigramExpr))).as("sh"))
    val bench = sh.filter(pmod($"doc_id", lit(89)) === 0).select($"sh").distinct()
    val exact = sh.filter(pmod($"doc_id", lit(89)) =!= 0)
      .join(broadcast(bench), "sh")
      .groupBy($"doc_id").agg(count(lit(1)).as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withBloom shouldBe exact
    withBloom should not be empty
  }
}
