package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{QuantileSketchBytes, QuantileSketchMerge}
import graft.ops.DimStore

/** Incremental per-day value quantiles over a stream — the quantile
  * analogue of [[UvSketchStore]], with one crucial difference in the
  * replay story. HLL union is SET union, so re-merging a replayed
  * micro-batch into an HLL store is a no-op. KLL quantile summaries are
  * MULTISET merges: re-merging the same batch double-counts every item
  * and silently skews the tails. foreachBatch's at-least-once contract
  * makes that a real failure mode, not a corner case.
  *
  * The fix is to never merge at write time: each micro-batch writes its
  * own summary row keyed (day, batchId) through DimStore's LWW upsert —
  * a replayed batch OVERWRITES its own previous row (same pk, same
  * version, deterministic tie-break) instead of merging into an
  * accumulator. (Scope caveat, mirroring QuantileSketch's: the
  * replayed row is byte-identical to the one it replaces only while
  * the batch stays within sketch capacity; past capacity the summary
  * bytes depend on partial-merge order and the overwrite is
  * rank-error-equivalent rather than byte-equal — either way the
  * store never double-counts.) Merging happens at READ time, over the summary table
  * (one ~KB row per day per batch), via sketch union — the raw stream
  * is never rescanned and re-delivery is exactly-once in effect.
  *
  * At 100 TB the store stays summary-sized: |days| × |batches| rows of
  * ~capacity·log2 longs each; compaction bounds every row regardless of
  * batch size.
  */
object QuantileStore {
  val Capacity = 1024
  val ProbsPpm: Seq[Long] = Seq(500000L, 900000L, 990000L)

  /** foreachBatch hook: summarize one micro-batch of events (ts, value)
    * into per-day sketch rows and upsert them at `store` keyed by
    * (day, batchId). Values are fixed-pointed to cents so the sketch's
    * long domain carries them exactly. */
  def updateBatch(store: String)(batch: DataFrame, batchId: Long): Unit = {
    val sketch = GraftPlanBridge.col(
      QuantileSketchBytes(
        GraftPlanBridge.expr(col("v")), Capacity).toAggregateExpression())
    val perDay = batch
      .select(to_date(col("ts")).as("d"),
        round(col("value") * 100).cast("long").as("v"))
      .groupBy(col("d"))
      .agg(sketch.as("sk"))
      .withColumn("pk", concat_ws(":", col("d"), lit(batchId)))
      .withColumn("ver", lit(batchId))
    DimStore.upsert(batch.sparkSession, store, perDay, "pk", "ver")
  }

  /** Per-day p50/p90/p99 (cents) from the summary store — one sketch
    * union over KB-scale rows, no raw-data rescan. */
  def quantilesByDay(spark: SparkSession, store: String): DataFrame = {
    val merge = GraftPlanBridge.col(
      QuantileSketchMerge(
        GraftPlanBridge.expr(col("sk")), Capacity, ProbsPpm)
        .toAggregateExpression())
    DimStore.read(spark, store)
      .groupBy(col("d"))
      .agg(merge.as("qs"))
      .select(col("d"), col("qs").getItem(0).as("p50_cents"),
        col("qs").getItem(1).as("p90_cents"), col("qs").getItem(2).as("p99_cents"))
  }

  /** Global quantiles across all days from the same store. */
  def quantilesGlobal(spark: SparkSession, store: String): DataFrame = {
    val merge = GraftPlanBridge.col(
      QuantileSketchMerge(
        GraftPlanBridge.expr(col("sk")), Capacity, ProbsPpm)
        .toAggregateExpression())
    DimStore.read(spark, store)
      .agg(merge.as("qs"))
      .select(col("qs").getItem(0).as("p50_cents"),
        col("qs").getItem(1).as("p90_cents"), col("qs").getItem(2).as("p99_cents"))
  }
}
