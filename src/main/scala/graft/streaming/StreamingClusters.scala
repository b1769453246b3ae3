package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ConnectedComponents, DimStore}

/** Continuous dedup CLUSTER maintenance — the label side of streaming
  * near-dup detection, closing the pipeline
  * [[StreamingNearDup]] (pairs at ingest) → components → keeper labels
  * that the batch side covers with x02 → x73/x74.
  *
  * Design (the [[QuantileStore]] house pattern — journal at write
  * time, compute at read time): each micro-batch's candidate edges are
  * UPSERTED into a versioned [[DimStore]] edge table keyed by the
  * normalized pair (`"a:b"`, a > b) with the batchId as the LWW
  * version. Nothing is merged or recomputed at write time, so the
  * write path is O(new edges) — and foreachBatch's at-least-once
  * re-delivery is absorbed structurally: a replayed batch overwrites
  * its own rows with identical content (edge identity IS the pk), so
  * the journal after a replay is byte-equal to the journal before it.
  * Labels come from [[ConnectedComponents.starContraction]] over the
  * journal at read time — the same O(log n)-round fixpoint the batch
  * queries grade against the DuckDB oracle, so streamed labels agree
  * with a batch recompute BY CONSTRUCTION of the shared operator
  * (StreamingClustersSpec pins it end-to-end).
  *
  * Scale shape: the journal holds one row per DISTINCT near-dup pair
  * ever observed — the same cardinality the batch pipeline's verified
  * pair table materializes (capped upstream by
  * [[graft.ops.Blocking]]'s per-block pair caps), not per event and
  * not per re-delivery. The read-side contraction is priced per
  * CONSULTATION, not per batch, and [[compactJournal]] periodically
  * folds the labels back in as star edges (x74's history-compaction
  * move), bounding the journal at O(clustered docs) regardless of how
  * many redundant pairs the detector has emitted.
  */
object StreamingClusters {

  /** foreachBatch hook for a [[DupCandidate]] stream
    * (`keeperId`, `dupId`, `band`): journal the batch's distinct
    * normalized edges, replay-idempotently. Empty batches commit
    * nothing (no version churn from quiet micro-batches). */
  def updateBatch(store: String)(batch: DataFrame, batchId: Long): Unit = {
    val edges = batch.select(
        greatest(col("keeperId"), col("dupId")).as("a"),
        least(col("keeperId"), col("dupId")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .withColumn("pk", concat_ws(":", col("a"), col("b")))
      .withColumn("ver", lit(batchId))
    if (!edges.isEmpty)
      DimStore.upsert(batch.sparkSession, store, edges, "pk", "ver")
  }

  /** Current (id, rep) keeper labels from the journal — component
    * minima, identical semantics to x28/x73/x74. Returns a PERSISTED
    * frame (contraction materializes its fixpoint); callers that are
    * done with it may unpersist. Empty store → empty labels. The
    * contraction's durable checkpoint copy (reliable-checkpoint
    * sessions) is released HERE, after the labels are materialized —
    * the persisted blocks serve the caller, and a consultation cadence
    * must not strand one labels checkpoint per read in
    * spark.checkpoint.dir (the same leak class compactJournal
    * releases). */
  def labels(spark: SparkSession, store: String): DataFrame =
    DimStore.readIfExists(spark, store) match {
      case Some(df) =>
        val (l, release) = ConnectedComponents
          .starContractionReleasable(df.select(col("a"), col("b")))
        release()
        l
      case None =>
        spark.range(0).select(col("id"), col("id").as("rep"))
    }

  // -------------------------------------------------------------------
  // MAINTAINED labels — the x74 incremental move applied streaming-side.
  // The journal+labels-on-read route above prices a full O(log n)-round
  // star contraction over O(clustered docs) edges PER CONSULTATION —
  // the StreamBench `clusters` leg measured exactly that cost. The
  // maintained route moves the contraction to WRITE time and makes it
  // incremental: the label table's own star edges (one (id, rep) row
  // per doc — exactly the connectivity of everything clustered so far,
  // already height-1) are contracted together with ONLY the arriving
  // batch's edges, so rounds are bounded by the NEW structure's depth,
  // and a consultation becomes a snapshot read of the table — no
  // recompute at all. Same fixpoint as the journal route and a full
  // batch recompute BY CONSTRUCTION (star edges preserve components
  // exactly, minima keep original ids) — StreamingClustersSpec pins
  // all three routes to one oracle across multi-batch merges and
  // replays.

  /** foreachBatch hook, maintained-label mode: incrementally fold the
    * batch's candidate edges into the (id, rep) label table at
    * `store`. Replay-idempotent structurally: a redelivered batch's
    * edges are already absorbed by the history stars, the re-contracted
    * fixpoint equals the stored labels, and the changed-row set is
    * empty — no commit, byte-identical table. Write amplification is
    * O(labels that CHANGED) per batch (new docs + docs whose component
    * minimum changed under a merge), not O(all clustered docs). */
  def updateBatchMaintained(store: String)(batch: DataFrame,
                                           batchId: Long): Unit = {
    val spark = batch.sparkSession
    val incr = batch.select(
        greatest(col("keeperId"), col("dupId")).as("a"),
        least(col("keeperId"), col("dupId")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    if (incr.isEmpty) return
    val old = DimStore.readIfExists(spark, store)
      .map(_.select(col("id"), col("rep")))
    val histStars = old match {
      case Some(l) => l.filter(col("id") =!= col("rep"))
        .select(col("id").as("a"), col("rep").as("b"))
        .unionByName(incr)
      case None => incr
    }
    val (labels, release) =
      ConnectedComponents.starContractionReleasable(histStars)
    try {
      val changed = old match {
        case Some(l) =>
          labels.join(l.withColumnRenamed("rep", "__old_rep"),
              Seq("id"), "left")
            .filter(col("__old_rep").isNull ||
              col("__old_rep") =!= col("rep"))
            .select(col("id"), col("rep"))
        case None => labels
      }
      DimStore.upsert(spark, store,
        changed.withColumn("ver", lit(batchId)), pk = "id",
        versionCol = "ver")
    } finally {
      labels.unpersist()
      release()
      ()
    }
  }

  /** Consultation, maintained-label mode: one snapshot read — the
    * serving cost the journal route could not give. Empty store →
    * empty labels. */
  def maintainedLabels(spark: SparkSession, store: String): DataFrame =
    DimStore.readIfExists(spark, store) match {
      case Some(df) => df.select(col("id"), col("rep"))
      case None => spark.range(0).select(col("id"), col("id").as("rep"))
    }

  /** Journal COMPACTION: replace the stored edge set with the star
    * edges of its own components ([[graft.ops.DimStore.rewrite]] — one
    * optimistic commit, re-derived per attempt so a racing
    * `updateBatch` is never dropped). Connectivity-preserving, so
    * [[labels]] before and after agree exactly, while the journal
    * shrinks from O(observed pairs) to O(clustered docs). A batch
    * replayed from BEFORE the compaction re-journals edges the stars
    * already absorb — redundant rows, never wrong labels (adding
    * absorbed edges cannot change components). Star rows carry
    * `ver = -1`: any later journaled edge that collides on the same
    * pair pk wins the LWW merge with identical (a, b) content.
    * Periodic maintenance, like vacuum/compact. */
  def compactJournal(spark: SparkSession, store: String): Unit = {
    if (DimStore.readIfExists(spark, store).isEmpty) return // nothing journaled yet
    // the rewrite fully materializes the star edges into the store, so
    // each attempt's labels — cache AND durable checkpoint copy (the
    // reliable-checkpoint route) — are released afterwards; without
    // the handles a compaction cadence strands one label-set
    // checkpoint per run in spark.checkpoint.dir
    val built =
      scala.collection.mutable.ArrayBuffer.empty[(DataFrame, () => Unit)]
    try DimStore.rewrite(spark, store, "pk") { df =>
      val (l, release) = ConnectedComponents
        .starContractionReleasable(df.select(col("a"), col("b")))
      built += ((l, release))
      l.filter(col("id") =!= col("rep"))
        .select(col("id").as("a"), col("rep").as("b"))
        .withColumn("pk", concat_ws(":", col("a"), col("b")))
        .withColumn("ver", lit(-1L))
    } finally built.foreach { case (f, release) =>
      try { f.unpersist(); release() } catch { case _: Throwable => () }
    }
  }
}
