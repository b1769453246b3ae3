package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.{StreamingClusters, StreamingNearDup}

/** Top-level for the encoder, like SketchEv. */
case class ClusterDoc(doc_id: Long, text: String)

/** End-to-end streaming dedup clustering: docs → [[StreamingNearDup]]
  * candidates → [[StreamingClusters]] edge journal → labels-on-read.
  * Pins the three contracts the design claims: streamed labels equal a
  * batch recompute over the same corpus, clusters MERGE when a later
  * batch bridges them, and at-least-once re-delivery of a batch leaves
  * labels unchanged. */
class StreamingClustersSpec extends AnyFunSuite with Matchers with SparkFixture {

  private val base = Seq.tabulate(40)(i => s"tok${i % 13} word$i").mkString(" ")
  /** Exact-shingle duplicates of `base` band-collide in every band. */
  private def doc(id: Long, text: String) = ClusterDoc(id, text)
  private def unrelated(id: Long) =
    ClusterDoc(id, Seq.tabulate(30)(j => s"u${id}t$j distinct$id$j").mkString(" "))

  private def labelMap(store: String): Map[Long, Long] = {
    val l = StreamingClusters.labels(spark, store)
    val m = l.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    l.unpersist()
    m
  }

  test("stream → journal → labels equals batch recompute; merge and replay hold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val store = Files.createTempDirectory("clu-store").toString + "/edges"
    val chk = Files.createTempDirectory("clu-chk").toString

    // batch 1: {0,1} dup pair, {7} unrelated. batch 2: {2} dups base →
    // joins 0/1's bucket; {8,9} a separate near-dup pair on disjoint
    // vocabulary (MinHash lowercases, so a case-variant would NOT be a
    // separate cluster).
    val other = Seq.tabulate(40)(i => s"zed${i % 11} item$i").mkString(" ")
    val b1 = Seq(doc(0, base), doc(1, base + " tail"), unrelated(7))
    val b2 = Seq(doc(2, base + " tail two"), doc(8, other),
      doc(9, other + " extra"))

    val mem = MemoryStream[ClusterDoc]
    val q = StreamingNearDup(mem.toDF()).toDF().writeStream
      .option("checkpointLocation", chk)
      .foreachBatch(StreamingClusters.updateBatch(store) _)
      .start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      val after1 = labelMap(store)
      // 0 and 1 share every MinHash band (near-identical text) → one
      // cluster keeping the min id; 7 collides with nobody
      after1.getOrElse(1L, -1L) shouldBe 0L
      after1.keySet should not contain 7L

      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = labelMap(store)
    // doc 2 bridges into {0,1}; {8,9} form their own cluster
    streamed.getOrElse(2L, -1L) shouldBe 0L
    streamed.getOrElse(9L, -1L) shouldBe 8L

    // batch recompute over the same corpus through the same detector
    // (batch mode = empty initial state) must give the same components
    val all = (b1 ++ b2).toDF()
    val batchLabels = {
      val edges = StreamingNearDup(all).toDF()
        .select($"keeperId".as("a"), $"dupId".as("b"))
      val l = graft.ops.ConnectedComponents.starContraction(edges)
      val m = l.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      l.unpersist()
      m
    }
    streamed shouldBe batchLabels

    // at-least-once re-delivery: re-apply batch 2's candidates under
    // the same batchId — the journal overwrites itself, labels frozen
    val replay = StreamingNearDup(b2.toDF()).toDF()
    StreamingClusters.updateBatch(store)(replay, batchId = 1L)
    labelMap(store) shouldBe streamed
  }

  test("journal compaction: labels preserved, rows shrink, replay and " +
       "later merges still correct") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("clu-compact").toString + "/edges"
    def cands(pairs: (Long, Long)*) =
      pairs.toDF("keeperId", "dupId")
    // chain {0,1,2} with a redundant closing edge, plus island {5,6}
    StreamingClusters.updateBatch(store)(
      cands((0L, 1L), (1L, 2L), (0L, 2L), (5L, 6L)).toDF(), 0L)
    val before = labelMap(store)
    before shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L)
    val rowsBefore = graft.ops.DimStore.read(s, store).count()

    StreamingClusters.compactJournal(s, store)
    labelMap(store) shouldBe before
    val rowsAfter = graft.ops.DimStore.read(s, store).count()
    // 4 observed pairs collapse to 3 star edges (one per non-rep doc)
    rowsAfter shouldBe 3L
    rowsAfter should be < rowsBefore

    // a batch replayed from BEFORE the compaction re-journals absorbed
    // edges: redundant rows, identical labels
    StreamingClusters.updateBatch(store)(cands((1L, 2L)).toDF(), 0L)
    labelMap(store) shouldBe before

    // and a LATER batch still merges clusters across the compaction
    StreamingClusters.updateBatch(store)(cands((2L, 5L)).toDF(), 1L)
    labelMap(store).values.toSet shouldBe Set(0L)
  }

  test("maintained labels: incremental per-batch maintenance equals a " +
       "batch recompute across multi-batch merges; replays are no-ops " +
       "(no commit), writes are changed-rows-only, consultation is a " +
       "snapshot read") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("clu-maint").toString + "/labels"
    def cands(pairs: (Long, Long)*) = pairs.toDF("keeperId", "dupId")
    def maintained(): Map[Long, Long] =
      StreamingClusters.maintainedLabels(s, store)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // empty store: empty labels; an all-self-loop batch commits nothing
    maintained() shouldBe Map.empty
    StreamingClusters.updateBatchMaintained(store)(cands((3L, 3L)).toDF(), 0L)
    maintained() shouldBe Map.empty

    // batch 0: chain {0,1,2} + island {5,6}
    StreamingClusters.updateBatchMaintained(store)(
      cands((0L, 1L), (1L, 2L), (5L, 6L)).toDF(), 0L)
    maintained() shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L)

    // batch 1: bridge the two clusters — every member of the absorbed
    // component relabels; the surviving component's rows are untouched
    // (changed-rows-only write: this commit's generation carries only
    // the rows whose rep moved or that are new)
    StreamingClusters.updateBatchMaintained(store)(cands((2L, 5L)).toDF(), 1L)
    maintained() shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 0L, 6L -> 0L)
    // rows 0,1,2 kept their batch-0 version — they were not rewritten
    val vers = graft.ops.DimStore.read(s, store)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    vers(0L) shouldBe 0L
    vers(1L) shouldBe 0L
    vers(2L) shouldBe 0L
    vers(5L) shouldBe 1L
    vers(6L) shouldBe 1L

    // batch 2: an unrelated island lands without touching history
    StreamingClusters.updateBatchMaintained(store)(cands((8L, 9L)).toDF(), 2L)

    // the maintained table equals a full batch recompute over ALL
    // edges — the x74 invariant, streaming-side
    val allEdges = Seq((0L, 1L), (1L, 2L), (5L, 6L), (2L, 5L), (8L, 9L))
      .toDF("a", "b")
    val full = graft.ops.ConnectedComponents.starContraction(allEdges)
    val fullMap = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    full.unpersist()
    maintained() shouldBe fullMap

    // at-least-once replay of batch 1: every edge is already absorbed
    // by the history stars → the changed set is empty → NO commit (the
    // version chain does not grow), labels byte-identical
    val h0 = graft.ops.DimStore.history(store)
    StreamingClusters.updateBatchMaintained(store)(cands((2L, 5L)).toDF(), 1L)
    graft.ops.DimStore.history(store) shouldBe h0
    maintained() shouldBe fullMap
  }

  test("takedown propagation: journal deleteNodes removes the node and " +
       "its evidence exactly (cut-vertex components split, bridged ones " +
       "hold); maintained deleteNodesMaintained re-elects reps; both " +
       "idempotent; the relabel-landed crash window converges") {
    val s = spark
    import s.implicits._
    def cands(pairs: (Long, Long)*) = pairs.toDF("keeperId", "dupId")

    // ---- journal route: exact wrt the surviving evidence ----
    val store = Files.createTempDirectory("clu-del").toString + "/edges"
    // diamond {0,1,2,3} (1 is bypassed by 0-3-2), path {7,8,9} (8 is a
    // cut vertex), island {5,6}
    StreamingClusters.updateBatch(store)(
      cands((0L, 1L), (1L, 2L), (0L, 3L), (3L, 2L), (7L, 8L), (8L, 9L),
        (5L, 6L)).toDF(), 0L)
    labelMap(store) shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 5L -> 5L, 6L -> 5L)

    StreamingClusters.deleteNodes(s, store, Seq(1L, 8L)) shouldBe 4L
    // 1 was bypassed: {0,2,3} holds via 0-3-2; 8 was a cut vertex:
    // 7 and 9 fall out of the graph entirely (exact split); {5,6}
    // untouched
    val after = labelMap(store)
    after shouldBe Map(0L -> 0L, 2L -> 0L, 3L -> 0L, 5L -> 5L, 6L -> 5L)
    // ...and equals a batch contraction over the surviving edges
    val batchL = graft.ops.ConnectedComponents.starContraction(
      Seq((3L, 0L), (3L, 2L), (6L, 5L)).toDF("a", "b"))
    batchL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe after
    batchL.unpersist()
    // idempotent redelivery: nothing incident remains → no commit
    val h0 = graft.ops.DimStore.history(store)
    StreamingClusters.deleteNodes(s, store, Seq(1L, 8L)) shouldBe 0L
    graft.ops.DimStore.history(store) shouldBe h0

    // ---- maintained route: re-election semantics ----
    val mstore = Files.createTempDirectory("clu-del-m").toString + "/labels"
    def maintained(): Map[Long, Long] =
      StreamingClusters.maintainedLabels(s, mstore)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    StreamingClusters.updateBatchMaintained(mstore)(
      cands((0L, 1L), (1L, 2L), (5L, 6L), (8L, 9L)).toDF(), 0L)
    maintained() shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L)

    // delete the REP: survivors keep their component under the new
    // minimum member
    StreamingClusters.deleteNodesMaintained(s, mstore, Seq(0L), 1L) shouldBe 1L
    maintained() shouldBe Map(1L -> 1L, 2L -> 1L,
      5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L)
    // delete a MEMBER: its rep is untouched
    StreamingClusters.deleteNodesMaintained(s, mstore, Seq(9L), 2L) shouldBe 1L
    maintained() shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L)
    // one takedown batch spanning a rep (1) and a member (6)
    StreamingClusters.deleteNodesMaintained(s, mstore, Seq(1L, 6L), 3L) shouldBe 2L
    maintained() shouldBe Map(2L -> 2L, 5L -> 5L, 8L -> 8L)
    // idempotent redelivery: nothing present → no upsert, no delete
    StreamingClusters.deleteNodesMaintained(s, mstore, Seq(1L, 6L), 4L) shouldBe 0L
    maintained() shouldBe Map(2L -> 2L, 5L -> 5L, 8L -> 8L)
    // later batches merge correctly on the shrunken table
    StreamingClusters.updateBatchMaintained(mstore)(cands((2L, 8L)).toDF(), 5L)
    maintained() shouldBe Map(2L -> 2L, 8L -> 2L, 5L -> 5L)

    // crash window: the relabel upsert LANDED but the delete commit
    // did not (simulated by hand-landing the relabel) — the
    // redelivered takedown finds no affected components and completes
    // the delete, converging
    graft.ops.DimStore.upsert(s, mstore,
      Seq((8L, 8L, 90L)).toDF("id", "rep", "ver"), "id", "ver")
    StreamingClusters.deleteNodesMaintained(s, mstore, Seq(2L), 91L) shouldBe 1L
    maintained() shouldBe Map(8L -> 8L, 5L -> 5L)
  }

  test("takedown DataFrame overloads: equal to the Seq route (plan stays " +
       "O(1) in |ids| via broadcast joins); a stale batchId is refused " +
       "loudly before the relabel can lose LWW; a full-cover takedown " +
       "EMPTIES the store instead of wedging") {
    val s = spark
    import s.implicits._
    def cands(pairs: (Long, Long)*) = pairs.toDF("keeperId", "dupId")

    // ---- journal route, DataFrame ids ≡ Seq ids ----
    val store = Files.createTempDirectory("clu-del-df").toString + "/edges"
    StreamingClusters.updateBatch(store)(
      cands((0L, 1L), (1L, 2L), (0L, 3L), (3L, 2L), (7L, 8L), (8L, 9L),
        (5L, 6L)).toDF(), 0L)
    StreamingClusters.deleteNodes(s, store, Seq(1L, 8L).toDF("id")) shouldBe 4L
    labelMap(store) shouldBe Map(0L -> 0L, 2L -> 0L, 3L -> 0L,
      5L -> 5L, 6L -> 5L)
    // full-cover takedown: every remaining node — empties, no wedge
    StreamingClusters.deleteNodes(s, store,
      Seq(0L, 2L, 3L, 5L, 6L).toDF("id")) shouldBe 3L
    labelMap(store) shouldBe Map.empty
    // the emptied journal still accepts later batches
    StreamingClusters.updateBatch(store)(cands((20L, 21L)).toDF(), 1L)
    labelMap(store) shouldBe Map(20L -> 20L, 21L -> 20L)

    // ---- maintained route, DataFrame ids + stale-version guard ----
    val mstore = Files.createTempDirectory("clu-del-mdf").toString + "/labels"
    def maintained(): Map[Long, Long] =
      StreamingClusters.maintainedLabels(s, mstore)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    StreamingClusters.updateBatchMaintained(mstore)(
      cands((0L, 1L), (1L, 2L), (5L, 6L)).toDF(), 10L)
    // STALE batchId (≤ the affected rows' stored ver): refused loudly —
    // the relabel upsert would silently lose the LWW merge while the
    // delete went through, leaving survivors pointing at a deleted rep
    val e = intercept[IllegalArgumentException] {
      StreamingClusters.deleteNodesMaintained(s, mstore, Seq(0L), 10L)
    }
    e.getMessage should include("10")
    maintained() shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L,
      6L -> 5L)
    // a member-only takedown has no affected components → no guard
    // needed even at a stale ver (nothing to relabel, delete is exact)
    StreamingClusters.deleteNodesMaintained(s, mstore, Seq(6L), 1L) shouldBe 1L
    maintained() shouldBe Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L)
    // DataFrame route ≡ Seq route re-election semantics
    StreamingClusters.deleteNodesMaintained(s, mstore,
      Seq(0L).toDF("id"), 11L) shouldBe 1L
    maintained() shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 5L)
    // full-cover maintained takedown: empties instead of wedging
    StreamingClusters.deleteNodesMaintained(s, mstore,
      Seq(1L, 2L, 5L).toDF("id"), 12L) shouldBe 3L
    maintained() shouldBe Map.empty
    // and the emptied label table still maintains later batches
    StreamingClusters.updateBatchMaintained(mstore)(
      cands((30L, 31L)).toDF(), 13L)
    maintained() shouldBe Map(30L -> 30L, 31L -> 30L)
  }

  test("maintained labels, distributed fallback route (driverFoldMaxEdges" +
       " = 0): identical fixpoint, replays still no-ops") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("clu-maint-dist").toString + "/labels"
    def cands(pairs: (Long, Long)*) = pairs.toDF("keeperId", "dupId")
    def up(pairs: Seq[(Long, Long)], bid: Long): Unit =
      StreamingClusters.updateBatchMaintained(store, driverFoldMaxEdges = 0)(
        cands(pairs: _*).toDF(), bid)
    up(Seq((0L, 1L), (1L, 2L), (5L, 6L)), 0L)
    up(Seq((2L, 5L)), 1L)
    up(Seq((8L, 9L)), 2L)
    val got = StreamingClusters.maintainedLabels(s, store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = graft.ops.ConnectedComponents.starContraction(
      Seq((0L, 1L), (1L, 2L), (5L, 6L), (2L, 5L), (8L, 9L)).toDF("a", "b"))
    val fullMap = full.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    full.unpersist()
    got shouldBe fullMap
    // replay on the distributed route: absorbed edges → empty quotient
    // → no commit
    val h0 = graft.ops.DimStore.history(store)
    up(Seq((2L, 5L)), 1L)
    graft.ops.DimStore.history(store) shouldBe h0
  }

  test("empty store and empty batches") {
    val store = Files.createTempDirectory("clu-empty").toString + "/edges"
    labelMap(store) shouldBe Map.empty
    StreamingClusters.compactJournal(spark, store) // no journal: no-op
    labelMap(store) shouldBe Map.empty
    val s = spark
    import s.implicits._
    // an all-unique batch journals nothing (no version churn)
    val quiet = StreamingNearDup(Seq(unrelated(100), unrelated(101)).toDF()).toDF()
    StreamingClusters.updateBatch(store)(quiet, batchId = 0L)
    labelMap(store) shouldBe Map.empty
  }
}
