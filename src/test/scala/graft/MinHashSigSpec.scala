package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.ops.MinHash

/** Bit-parity pins for the native shingle/signature expressions
  * (functions/MinHashSig.scala) against the legacy interpreted chain
  * they replaced — the chain stays here as the executable spec, and the
  * DuckDB oracle (which mirrors the chain) stays valid by transitivity.
  * Corpora are randomized and include the nasty shapes: 0/1/2-token
  * docs, repeated shingles, empty tokens from double spaces, multi-byte
  * UTF-8, and mixed case. */
class MinHashSigSpec extends AnyFunSuite with Matchers with SparkFixture {

  private def corpus(seed: Int, nDocs: Int) = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val words = Vector("alpha", "BETA", "gamma", "δελτα", "ε", "zzz",
      "q_u", "", "tok1", "tok2", "tok3", "λόγος", "x" * 40)
    Seq.tabulate(nDocs) { i =>
      val n = rnd.nextInt(12) // includes sub-shingle docs
      (i.toLong, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  /** The pre-native formulation, verbatim. */
  private def legacyHashes(docs: org.apache.spark.sql.DataFrame) =
    docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        array_distinct(expr(MinHash.TrigramExpr)).as("shingles"))
      .filter(org.apache.spark.sql.functions.size(col("shingles")) > 0)
      .select(col("doc_id"), expr(
        "transform(shingles, sh -> " +
        "cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint))").as("hs"))

  test("shingle_hashes: bit parity with the interpreted md5 chain") {
    val docs = corpus(11, 300)
    val native = MinHash.shingleHashes(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val legacy = legacyHashes(docs).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    native shouldBe legacy // same docs kept, same hashes, same ORDER
  }

  test("minhash_sig: one-pass minima equal the K array_min walks") {
    val hs = MinHash.shingleHashes(corpus(23, 200))
    val legacySig = hs.select(
      (col("doc_id") +: MinHash.Seeds.zipWithIndex.map { case (sd, i) =>
        expr(s"array_min(transform(hs, h -> h ^ ${sd}L))").as(s"h$i")
      }): _*)
    val native = MinHash.bands(hs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val legacy = legacySig.collect().flatMap { r =>
      (0 until MinHash.B).map(b =>
        (r.getLong(0), b) -> ((r.getLong(1 + 2 * b), r.getLong(2 + 2 * b))))
    }.toMap
    native shouldBe legacy
  }

  test("native expressions stay inside whole-stage codegen") {
    // parquet-backed input: a local Seq relation would be folded by
    // ConvertToLocalRelation and leave nothing to codegen
    val d = java.nio.file.Files.createTempDirectory("mhscg").toString
    corpus(7, 50).write.mode("overwrite").parquet(d)
    val df = MinHash.bands(MinHash.shingleHashes(spark.read.parquet(d)))
    df.collect() // force codegen compilation — fallback would be silent
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` markers are the WholeStageCodegen stages in toString
    // form; the shingle/sig projections must carry one and must not
    // show the codegen-fallback `!Project` marker
    p should include("*(1)")
    p should not include "!Project"
  }
}
