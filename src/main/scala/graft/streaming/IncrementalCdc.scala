package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max}

import graft.ops.DimStore

/** S2's true incremental half — snapshot-then-changelog semantics
  * (the reference's `StartupOptions.initial()`,
  * app/dim/DimApp.java:74-86: read a consistent snapshot once, then
  * tail the binlog from the snapshot's position).
  *
  * The per-micro-batch config re-read in [[Jobs.dimApp]] is the right
  * shape for a tiny slowly-changing config table, but pointing it at a
  * high-churn CDC table would pay a full table read per batch. This is
  * the generic incremental apply instead:
  *
  *  - [[bootstrap]] loads the snapshot into the dim store and persists
  *    the snapshot's high-water version as a CURSOR next to the store.
  *  - [[applyOnce]] reads ONLY change records with `version > cursor`
  *    from the changelog, LWW-merges them through
  *    [[graft.ops.DimStore.upsert]]'s bucket-pruned MERGE, then
  *    advances the cursor (a directory of version-named entries
  *    resolved to the max — no crash window ever presents an absent
  *    cursor, so the steady-state O(new records) scan contract holds
  *    through crashes too).
  *
  * Scale contract: the cursor predicate is a plain comparison on the
  * version column, so Catalyst pushes it into the parquet scan —
  * row-group zone maps (and, when the changelog is version- or
  * date-partitioned, partition pruning) skip everything already
  * applied; a steady-state apply reads O(new records), not O(history).
  *
  * Crash contract (the K2 story, extended): the cursor advances only
  * AFTER the merge commits. A crash between merge and cursor write
  * redelivers the same records on the next apply — and the LWW merge
  * is idempotent (deterministic winner per pk), so replayed effects
  * are exactly-once. `StreamingRecoverySpec` pins both halves:
  * snapshot-then-incremental equals a full re-read, and a replayed
  * apply leaves the store byte-identical.
  */
object IncrementalCdc {

  /** Legacy single-file cursor (read-compat only; see [[writeCursor]]). */
  private def legacyCursorPath(storePath: String) = new Path(storePath + ".__cursor")

  /** The cursor is a DIRECTORY of version-named entries (`v<long>`),
    * resolved to the numeric max on read. The advance is "create the
    * new entry, then best-effort delete the old ones": at every instant
    * at least one entry (or the legacy file) exists, so no crash window
    * can ever present NO cursor and trigger an O(history) replay — the
    * worst a crash leaves behind is a stale extra entry that the max
    * ignores and the next advance sweeps. (The previous delete-then-
    * rename scheme had exactly that window.) */
  private def cursorsDir(storePath: String) = new Path(storePath + ".__cursors")

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val EntryName = "^v(-?\\d+)$".r

  /** The last applied version, or None before any bootstrap/apply.
    * Max over the cursor-directory entries plus the legacy file (a
    * store written by pre-versioned-cursor code keeps working). */
  def readCursor(spark: SparkSession, storePath: String): Option[Long] = {
    val f = fs(spark, storePath)
    val dir = cursorsDir(storePath)
    val entries: Seq[Long] =
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).toSeq.flatMap(_.getPath.getName match {
        case EntryName(v) => Some(v.toLong)
        case _ => None
      })
    val legacy: Option[Long] = {
      val p = legacyCursorPath(storePath)
      if (!f.exists(p)) None
      else {
        val len = f.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        val in = f.open(p)
        try in.readFully(0, buf) finally in.close()
        Some(new String(buf, StandardCharsets.UTF_8).trim.toLong)
      }
    }
    (entries ++ legacy).reduceOption(_ max _)
  }

  private def writeCursor(spark: SparkSession, storePath: String,
                          version: Long): Unit = {
    val f = fs(spark, storePath)
    val dir = cursorsDir(storePath)
    f.mkdirs(dir)
    // the entry NAME carries the value, so creation is the atomic unit
    // (an empty file either exists or doesn't — nothing to tear)
    f.create(new Path(dir, s"v$version"), true).close()
    // sweep superseded state best-effort; a crash here only leaves
    // entries the max-resolution read ignores
    f.listStatus(dir).foreach(_.getPath.getName match {
      case EntryName(v) if v.toLong < version =>
        f.delete(new Path(dir, s"v$v"), false)
      case _ => ()
    })
    f.delete(legacyCursorPath(storePath), false)
  }

  /** Load the full snapshot into the store and set the cursor to the
    * snapshot's high-water version (records at or below it are part of
    * the snapshot; the changelog tail starts strictly after). An empty
    * snapshot leaves the store absent and the cursor at Long.MinValue,
    * so the first apply replays the changelog from the beginning. */
  def bootstrap(spark: SparkSession, snapshot: DataFrame, storePath: String,
                pk: String, versionCol: String,
                nBuckets: Int = DimStore.NumBuckets): Unit = {
    DimStore.upsert(spark, storePath, snapshot, pk, versionCol, nBuckets)
    val hw = snapshot.agg(max(col(versionCol))).head()
    writeCursor(spark, storePath,
      if (hw.isNullAt(0)) Long.MinValue else hw.getLong(0))
  }

  /** Apply every changelog record newer than the cursor (bounded above
    * by `upTo` when the caller batches a replay), merge into the
    * store, advance the cursor. Returns the number of records applied
    * — 0 means the store was already current and nothing was read
    * beyond the pruned scan. */
  def applyOnce(spark: SparkSession, changelog: DataFrame, storePath: String,
                pk: String, versionCol: String,
                upTo: Option[Long] = None,
                nBuckets: Int = DimStore.NumBuckets): Long = {
    val cur = readCursor(spark, storePath).getOrElse(Long.MinValue)
    val fresh0 = changelog.filter(col(versionCol) > cur)
    val fresh = upTo.fold(fresh0)(v => fresh0.filter(col(versionCol) <= v))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = fresh.agg(count(lit(1)), max(col(versionCol))).head()
      val n = stats.getLong(0)
      if (n > 0) {
        // nBuckets only applies on table creation (the store's own
        // marker wins afterwards) — passed through so a store created
        // by an apply, not a bootstrap, still gets the caller's layout
        DimStore.upsert(spark, storePath, fresh, pk, versionCol, nBuckets)
        writeCursor(spark, storePath, stats.getLong(1))
      }
      n
    } finally fresh.unpersist()
  }

  /** The store's current state (LWW-resolved at write time, so this is
    * a plain pruned read). */
  def read(spark: SparkSession, storePath: String): DataFrame =
    DimStore.read(spark, storePath)
}
