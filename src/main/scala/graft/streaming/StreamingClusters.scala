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
    * done with it may unpersist. Empty store → empty labels. */
  def labels(spark: SparkSession, store: String): DataFrame =
    DimStore.readIfExists(spark, store) match {
      case Some(df) =>
        ConnectedComponents.starContraction(df.select(col("a"), col("b")))
      case None =>
        spark.range(0).select(col("id"), col("id").as("rep"))
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
