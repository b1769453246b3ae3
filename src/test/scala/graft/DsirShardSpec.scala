package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.Extensions

/** Top-level: nested case classes can't get a Spark encoder. */
case class GateDoc(doc_id: Long, text: String, lang: String)

/** Semantics + plan pins for the two corpus-curation operators added in
  * round 17: x90 DSIR importance selection and x91 the deterministic
  * global shuffle-shard. Both are hash-deterministic by design, so the
  * specs pin exactly the properties a training pipeline relies on:
  * ranking direction (x90), exactly-once/contiguity/append-invariance
  * (x91), bit-identical re-runs, and the 100 TB plan shape. */
class DsirShardSpec extends AnyFunSuite with Matchers with SparkFixture {

  /** Corpus where the en (target) docs share a distinctive phrase
    * vocabulary; half the de docs mimic it ("en-like"), the other half
    * are disjoint gibberish. DSIR must rank the mimics above the
    * gibberish — that is the operator's whole job. */
  private lazy val dsirDir: String = {
    val s = spark
    import s.implicits._
    val targetPhrase = Seq.tabulate(30)(i => s"common${i % 7}").mkString(" ")
    val rows =
      // 10 en docs carrying the target bigram distribution
      Seq.tabulate(10) { i =>
        (i.toLong, targetPhrase + s" filler$i", "en", "srcA", 100L)
      } ++
      // 5 de docs that LOOK like the target (same bigrams)
      Seq.tabulate(5) { i =>
        (100L + i, targetPhrase + s" mimic$i", "de", "srcB", 100L)
      } ++
      // 5 de docs with fully disjoint vocabulary
      Seq.tabulate(5) { i =>
        val txt = Seq.tabulate(30)(j => s"weird${i}x$j").mkString(" ")
        (200L + i, txt, "de", "srcB", 100L)
      }
    val d = Files.createTempDirectory("dsir").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("x90: target-like off-domain docs outrank disjoint-vocabulary docs") {
    val out = Extensions.x90.run(spark, dsirDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val mimicScores = (0 until 5).map(i => out(100L + i))
    val weirdScores = (0 until 5).map(i => out(200L + i))
    // every mimic beats every gibberish doc
    mimicScores.min should be > weirdScores.max
    // and the true target docs sit at (or above) the mimic level
    (0 until 10).map(i => out(i.toLong)).min should be >= mimicScores.min
  }

  test("x90: bit-identical across re-runs (no RNG, no float path)") {
    def snap() = Extensions.x90.run(spark, dsirDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    snap() shouldBe snap()
  }

  test("x90: plan is broadcast-score + top-k heap, never a global sort") {
    val p = Extensions.x90.run(spark, sf0001)
      .queryExecution.executedPlan.toString
    // the B-bounded ratio table joins back as a broadcast hash join
    p should include("BroadcastHashJoin")
    // selection is a per-partition heap + driver merge
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
  }

  test("x91: every doc exactly once, positions contiguous per shard") {
    val out = Extensions.x91.run(spark, dsirDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.map(_._3).distinct.length shouldBe 20 // 20 docs, each once
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.map(_._2).sorted shouldBe (1L to rows.length).toArray
    }
  }

  test("x91: appending docs never moves an existing doc's (shard, key)") {
    val s = spark
    import s.implicits._
    val base = Extensions.x91.run(s, dsirDir).collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getLong(3), r.getLong(1)))
      .toMap
    // build an appended corpus: same docs + 10 new ones
    val d2 = Files.createTempDirectory("dsir_app").toString
    val extra = Seq.tabulate(10) { i =>
      (900L + i, s"new doc $i", "en", "srcC", 10L)
    }
    s.read.parquet(s"$dsirDir/documents.parquet")
      .unionByName(extra.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val appended = Extensions.x91.run(s, d2).collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getLong(3), r.getLong(1)))
      .toMap
    appended.size shouldBe 30
    base.foreach { case (doc, (shard, h, pos)) =>
      val (shard2, h2, pos2) = appended(doc)
      shard2 shouldBe shard // membership invariant under append
      h2 shouldBe h         // seeded key invariant
      // ranks can only grow (new keys slot in), never reorder
      pos2 should be >= pos
    }
    // relative order of the original docs inside each shard is preserved
    base.keys.groupBy(d => base(d)._1).foreach { case (_, docs) =>
      val byOld = docs.toSeq.sortBy(d => base(d)._3)
      val byNew = docs.toSeq.sortBy(d => appended(d)._3)
      byNew shouldBe byOld
    }
  }

  test("x92: staged-model apply agrees with the top of x90's ranking, " +
       "keeps target-like docs, and reads the model from the stage") {
    graft.queries.Extensions.clearPersistedIntermediates()
    val applied = Extensions.x92.run(spark, dsirDir)
    val rows = applied.collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4))).toMap
    rows.size shouldBe 20 // every scorable doc, not a top-k
    // keep is exactly the threshold verdict (at this 20-doc fixture the
    // add-B smoothing term dominates every ratio, so absolute verdicts
    // are corpus-size-dependent — the contract is consistency + order)
    rows.values.foreach { case (score, keep) =>
      keep shouldBe (if (score >= 1000000L) 1L else 0L)
    }
    // ranking direction survives the apply: every mimic above every
    // gibberish doc
    (0 until 5).map(i => rows(100L + i)._1).min should be >
      (0 until 5).map(i => rows(200L + i)._1).max
    // scores agree bit-for-bit with x90's selection over the same corpus
    val selected = Extensions.x90.run(spark, dsirDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    selected.foreach { case (doc, score) => rows(doc)._1 shouldBe score }
    // and the plan serves the model from the staged parquet — the
    // ratio-train subtree (bucket agg + totals cross-join) is absent
    val p = applied.queryExecution.executedPlan.toString
    p should include("graft-stage")
    p should not include "BroadcastNestedLoopJoin"
  }

  test("streaming DsirGate: per-micro-batch scores are bit-identical to " +
       "the batch apply; replay changes nothing; rejects carry reasons") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    // frozen model trained on the batch corpus
    val ratioPath = graft.ops.Staging.ensure("x90_ratio", dsirDir,
      Seq("documents"))(graft.queries.Extensions.dsirRatio(s, dsirDir))
    val ratio = s.read.parquet(ratioPath)
    val batchScores = Extensions.x92.run(s, dsirDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap

    val mem = MemoryStream[GateDoc]
    val out = new scala.collection.mutable.HashMap[Long, (Long, Long)]()
    val chk = Files.createTempDirectory("dsirgate-chk").toString
    val q = mem.toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.DsirGate.score(batch, ratio).collect().foreach(r =>
          out.synchronized {
            out(r.getLong(0)) = (r.getLong(2), r.getLong(3))
          })
        ()
      }
      .start()
    val docsByBatch = s.read.parquet(s"$dsirDir/documents.parquet")
      .select($"doc_id", $"text", $"lang").as[GateDoc].collect()
    try {
      // replay the corpus in three micro-batches, then REDELIVER one
      docsByBatch.grouped(7).foreach { g =>
        mem.addData(g.toSeq); q.processAllAvailable()
      }
      val before = out.toMap
      mem.addData(docsByBatch.take(7).toSeq) // at-least-once redelivery
      q.processAllAvailable()
      out.toMap shouldBe before // idempotent: same doc → same bits
    } finally q.stop()
    out.toMap shouldBe batchScores // stream ≡ batch, bit-for-bit

    // the gate's two sides partition the corpus, reasons attached
    val docsDf = s.read.parquet(s"$dsirDir/documents.parquet")
    val acc = graft.streaming.DsirGate
      .accepted(docsDf, ratio, minScorePpm = 1000000L)
      .select("doc_id").as[Long].collect().toSet
    val rej = graft.streaming.DsirGate
      .rejected(docsDf, ratio, minScorePpm = 1000000L)
      .select($"doc_id", $"reason").as[(Long, String)].collect()
    (acc ++ rej.map(_._1)).size shouldBe 20
    acc.intersect(rej.map(_._1).toSet) shouldBe empty
    rej.map(_._2).toSet should contain("low_score")
  }

  test("DsirGate serve contract: the trained model is DENSE (one row per " +
       "bucket), so a doc whose bigrams are all outside the trained " +
       "support scores the smoothed default instead of 'unscorable'") {
    val s = spark
    import s.implicits._
    val ratio = graft.queries.Extensions.dsirRatio(s, dsirDir)
    // dense: exactly B rows covering [0, B)
    val rows = ratio.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.size shouldBe 4096
    rows.keySet shouldBe (0L until 4096L).toSet
    // the default ratio for an unseen bucket (c_t = c_r = 0):
    // 1e6 · (n_r + B) div (n_t + B) — recompute it from the matrix
    import org.apache.spark.sql.functions.{sum, when}
    val (nR, nT) = graft.queries.Extensions.dsirMatrix(s, dsirDir)
      .agg(sum($"cnt"), sum(when($"lang" === "en", $"cnt").otherwise(0L)))
      .as[(Long, Long)].head()
    val default = BigInt(1000000) * (nR + 4096) / (nT + 4096)
    // a doc of entirely novel tokens: every bigram bucket is (almost
    // surely) untrained; those that are get the default — so the score
    // is the default exactly when ALL its buckets are unseen
    val trained = graft.queries.Extensions.dsirMatrix(s, dsirDir)
      .select($"b").distinct().as[Long].collect().toSet
    val novel = Seq((9999L, Seq.tabulate(12)(i => s"zq${i}veryodd").mkString(" "), "fr"))
      .toDF("doc_id", "text", "lang")
    val novelBuckets = graft.streaming.DsirGate.bucketCounts(novel, 4096L)
      .select($"b").as[Long].collect()
    val scoredRow = graft.streaming.DsirGate.score(novel, ratio).collect()
    scoredRow.length shouldBe 1 // scorable — the pre-fix sparse join dropped it
    if (novelBuckets.forall(b => !trained.contains(b)))
      scoredRow.head.getLong(3) shouldBe default.toLong
  }

  test("DsirGate.scored: ONE frame carries both sides; the overloads " +
       "partition it exactly as the two-sided calls do") {
    val s = spark
    import s.implicits._
    val ratio = graft.queries.Extensions.dsirRatio(s, dsirDir)
    val docsDf = s.read.parquet(s"$dsirDir/documents.parquet")
      // plant an unscorable doc (1 token ⇒ no bigrams)
      .unionByName(Seq((500L, "solo", "en", "srcA", 4L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val sc = graft.streaming.DsirGate
      .scored(docsDf, ratio, minScorePpm = 1000000L)
    val acc = graft.streaming.DsirGate.accepted(sc)
      .select($"doc_id").as[Long].collect().toSet
    val rej = graft.streaming.DsirGate.rejected(sc)
      .select($"doc_id", $"reason").as[(Long, String)].collect()
    (acc ++ rej.map(_._1)).size shouldBe 21 // partition of the corpus
    acc.intersect(rej.map(_._1).toSet) shouldBe empty
    rej.toMap.apply(500L) shouldBe "unscorable"
    // overload equivalence: one-sided convenience calls = scored filters
    graft.streaming.DsirGate.accepted(docsDf, ratio, 1000000L)
      .select($"doc_id").as[Long].collect().toSet shouldBe acc
    graft.streaming.DsirGate.rejected(docsDf, ratio, 1000000L)
      .select($"doc_id", $"reason").as[(Long, String)]
      .collect().sortBy(_._1) shouldBe rej.sortBy(_._1)
  }

  test("x91: plan shuffles once on shard — no range partitioning, no sort " +
       "of the whole corpus") {
    val p = Extensions.x91.run(spark, sf0001)
      .queryExecution.executedPlan.toString
    p should include("hashpartitioning(shard")
    p should not include "rangepartitioning"
    p should include("Window")
  }
}
