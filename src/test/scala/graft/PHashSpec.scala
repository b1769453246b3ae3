package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.ops.{Blocking, MediaIn, Multimodal, PHash}

/** Pins the perceptual-hash near-dup operator (x87):
  *  - the banded candidate join is pigeonhole-EXACT at the Hamming
  *    threshold (full recall vs a brute-force all-pairs reference);
  *  - bucket-locality: candidates come from band-bucket equi-joins —
  *    the plan carries no cartesian product, and the pair count is
  *    bucket-bounded, not |corpus|²;
  *  - the exactness precondition (maxHamming < nBands) is enforced;
  *  - the luminance-plane stub is deterministic and mass-consistent.
  */
class PHashSpec extends AnyFunSuite with Matchers with SparkFixture {

  /** Driver-side reference of the full hash pipeline — same trigram
    * plane, same integer mean-threshold, independent code path. */
  private def refBits(bytes: Array[Byte]): IndexedSeq[Int] = {
    val g = new Array[Int](64)
    for (i <- 0 until bytes.length - 2)
      g(((bytes(i) & 0xFF) * 961 + (bytes(i + 1) & 0xFF) * 31 +
        (bytes(i + 2) & 0xFF)) % 64) += 1
    val n = math.max(bytes.length - 2, 0)
    (0 until 64).map(i => if (g(i).toLong * 64 > n) 1 else 0)
  }
  private def hamming(a: IndexedSeq[Int], b: IndexedSeq[Int]): Int =
    a.lazyZip(b).count { case (x, y) => x != y }

  /** A deterministic pseudo-text corpus with planted near-dup families:
    * base docs are word-soup from a tiny vocab; each family adds
    * single-word edits (small plane perturbations → small Hamming). */
  private def corpus: Seq[(Long, Array[Byte])] = {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def doc(seed: Long, edits: Int): Array[Byte] = {
      val words = Array.tabulate(60)(i =>
        vocab(((seed * 31 + i * 17) % vocab.size).toInt))
      for (e <- 0 until edits)
        words(((seed + e * 7) % 60).toInt) = vocab((e % vocab.size))
      words.mkString(" ").getBytes("UTF-8")
    }
    (0L until 30L).flatMap { f =>
      Seq((f * 10, doc(f, 0)), (f * 10 + 1, doc(f, 1)),
        (f * 10 + 2, doc(f, 2)))
    }
  }

  test("banded candidate join has FULL RECALL at hamming <= nBands-1: " +
       "pipeline pairs == brute-force all-pairs reference (pigeonhole: " +
       "<= 3 differing bits cannot touch all 4 bands)") {
    val s = spark
    import s.implicits._
    val planes = Multimodal.luminancePlane(
      corpus.map { case (id, b) => MediaIn(id, b) }.toDS())
    val got = PHash.neardupPairs(planes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

    val bits = corpus.map { case (id, b) => id -> refBits(b) }
    val want = (for {
      (ia, ba) <- bits; (ib, bb) <- bits if ia < ib
      d = hamming(ba, bb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    want should not be empty // the planted families must register
    got shouldBe want
  }

  test("the hash itself matches the independent reference bit-for-bit " +
       "(integer mean-threshold, no doubles anywhere)") {
    val s = spark
    import s.implicits._
    val planes = Multimodal.luminancePlane(
      corpus.map { case (id, b) => MediaIn(id, b) }.toDS())
    val got = PHash.bandedHashes(planes).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    corpus.foreach { case (id, bytes) =>
      val rb = refBits(bytes)
      val wantBands = (0 until 4).map(j =>
        (0 until 16).map(i => rb(j * 16 + i).toLong << i).sum)
      got(id) shouldBe wantBands
    }
  }

  test("bucket-locality: no cartesian product in the plan, and the " +
       "candidate surface is band-bucket-bounded (an oversized bucket " +
       "degrades to star pairs through the cap, never |bucket|^2)") {
    val s = spark
    import s.implicits._
    val planes = Multimodal.luminancePlane(
      corpus.map { case (id, b) => MediaIn(id, b) }.toDS())
    val plan = PHash.neardupPairs(planes, maxHamming = 3)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"

    // 100 identical blobs: ONE band bucket of 100 > cap 64 — the
    // capped join yields the 99 star pairs, not 4950
    val clones = (0L until 100L).map(i =>
      MediaIn(i, corpus.head._2)).toDS()
    val pairs = PHash.neardupPairs(Multimodal.luminancePlane(clones),
      maxHamming = 3, cap = 64).collect()
    pairs.length shouldBe 99
    pairs.foreach { r =>
      r.getLong(0) shouldBe 0L   // star center = min doc_id
      r.getLong(2) shouldBe 0L   // identical blobs: hamming 0
    }
  }

  test("the exactness precondition is enforced: maxHamming >= nBands " +
       "is refused rather than silently losing recall") {
    val s = spark
    import s.implicits._
    val planes = Multimodal.luminancePlane(
      corpus.take(2).map { case (id, b) => MediaIn(id, b) }.toDS())
    an[IllegalArgumentException] should be thrownBy
      PHash.neardupPairs(planes, maxHamming = 4, nBands = 4)
  }
}
