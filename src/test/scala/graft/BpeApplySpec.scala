package graft

import org.apache.spark.sql.GraftPlanBridge
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native [[graft.functions.BpeApplyRules]] kernel to a
  * reference model of the greedy left-to-right fold it replaced (the
  * `aggregate(...)` chain): one full pass per rule, merged tokens never
  * re-matching as the LEFT side within the same pass, rules applied
  * sequentially. The tricky shapes are self-adjacent rules (a == b),
  * overlapping occurrences, and merge output colliding with later
  * rules' inputs. */
class BpeApplySpec extends AnyFunSuite with SparkFixture {

  /** The old fold, verbatim in Scala: acc.last == a && sym == b merges. */
  private def foldModel(syms: Seq[String], rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(syms) { case (s, (a, b)) =>
      if (s.length <= 1) s
      else s.tail.foldLeft(Vector(s.head)) { (acc, sym) =>
        if (acc.last == a && sym == b) acc.init :+ (a + b)
        else acc :+ sym
      }
    }

  private def native(syms: Seq[Seq[String]], rules: Seq[(String, String)]): Seq[Seq[String]] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(syms.zipWithIndex.map { case (s, i) =>
        org.apache.spark.sql.Row(i.toLong, s) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("syms",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))))
    df.withColumn("out", GraftPlanBridge.col(
        graft.functions.BpeApplyRules(GraftPlanBridge.expr(col("syms")), rules)))
      .orderBy("id").collect()
      .map(_.getSeq[String](2).toList).toSeq
  }

  test("native kernel matches the greedy fold on adversarial shapes") {
    val rules = Seq(("a", "a"), ("aa", "a"), ("b", "c"))
    val inputs: Seq[Seq[String]] = Seq(
      Seq(),                        // empty
      Seq("a"),                     // single
      Seq("a", "a"),                // one merge
      Seq("a", "a", "a"),           // odd run: aa + a, then rule 2 fires
      Seq("a", "a", "a", "a"),      // even run: aa aa, rule 2 can't pair
      Seq("a", "a", "a", "a", "a"), // 5-run
      Seq("b", "c", "b", "c"),      // disjoint pairs
      Seq("b", "b", "c", "c"),      // overlap probe: only middle bc
      Seq("x", "a", "a", "b", "c"), // mixed
      Seq("aa", "a", "b"))          // pre-existing merged symbol
    assert(native(inputs, rules) == inputs.map(foldModel(_, rules)))
  }

  test("randomized parity against the fold model") {
    val rnd = new scala.util.Random(7)
    val alpha = Seq("a", "b", "c", "ab", "bc")
    val rules = Seq(("a", "b"), ("ab", "c"), ("b", "b"))
    val inputs = (1 to 200).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.size))))
    assert(native(inputs, rules) == inputs.map(foldModel(_, rules)))
  }
}
