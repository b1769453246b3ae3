package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.DimStore

/** The reference's config bean (bean/TableProcess.java:6-38): route
  * records of `sourceTable` to `sinkTable`, keeping `sinkColumns`
  * (CSV), upserting on `sinkPk`. */
final case class TableProcess(
    sourceTable: String,
    sinkTable: String,
    sinkColumns: String,
    sinkPk: String)

/** J1/P6/K3/K4 — the DIM layer end-to-end (app/dim/DimApp.java:89-99 +
  * app/func/TableProcessFunction.java:107-141 + DimSinkFunction):
  * a CDC change stream is routed per config row to its dim table with a
  * config-driven projection and a keyed MERGE upsert.
  *
  * The Flink broadcast-state pattern maps to re-reading the (tiny)
  * config table every micro-batch inside `foreachBatch` — config churn
  * is picked up on the next batch, exactly like broadcast state. The
  * config is collected to the driver (it is control-plane data, a few
  * hundred rows at most — the analogue of Flink replicating it to every
  * task); the per-table filter+projection+upsert below that stays fully
  * distributed.
  *
  * Column projection is exact set membership, not the reference's buggy
  * substring `contains` (TableProcessFunction.java:133-140; SURVEY §7.4).
  */
object DimRouter {

  /** K4 — dynamic DDL on config: the reference issues
    * `CREATE TABLE IF NOT EXISTS <schema>.<sinkTable>(...)` the first
    * time a config row appears (TableProcessFunction.checkTable,
    * app/func/TableProcessFunction.java:48-102). Here the analogue is a
    * catalog-registered external table over the dim path, so the dim is
    * immediately queryable by name (`spark.table("graft_dim.dim_x")`).
    * Idempotent — IF NOT EXISTS both levels — and memoized per target:
    * the streaming hot path must not pay 2 catalog DDL round-trips per
    * config row per micro-batch forever (against a Hive metastore each
    * is an RPC), so registration runs once per (db, table) per JVM and
    * only the cheap refreshTable stays per-batch. */
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def ensureTable(spark: SparkSession, db: String, tp: TableProcess,
                  basePath: String): Unit = {
    require(db.matches("[A-Za-z0-9_]+") && tp.sinkTable.matches("[A-Za-z0-9_]+"),
      s"unsafe identifier in config: $db.${tp.sinkTable}")
    // keyed on the location too: re-pointing a dim at a new path (tests,
    // backfills) must re-issue the DDL, not hit the memo
    val key = s"$db.${tp.sinkTable}@$basePath"
    if (!registered.contains(key)) {
      // escape for a Spark SQL string literal before interpolating into
      // LOCATION: backslash is an active escape character (a raw \t in
      // the path would parse as TAB) and quotes double; both statements
      // are IF NOT EXISTS so a concurrent duplicate run is harmless
      val loc = s"$basePath/${tp.sinkTable}"
        .replace("\\", "\\\\").replace("'", "''")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
      // recursiveFileLookup: DimStore lays tables out as __bucket=k/
      // partition dirs (pruned upserts); the catalog table reads all
      // data files beneath them without surfacing the internal bucket
      // column to name-based readers (partition inference is disabled
      // under recursive lookup, and the data files don't carry it).
      // Migration note: IF NOT EXISTS never updates an entry, so a
      // table registered by pre-bucketing code against a persistent
      // metastore must be dropped and re-registered when its layout
      // migrates — the option cannot be retrofitted in place.
      spark.sql(s"CREATE TABLE IF NOT EXISTS $db.${tp.sinkTable} " +
        s"USING parquet OPTIONS (recursiveFileLookup 'true') LOCATION '$loc'")
      // memoize only after both statements succeed, so a transient
      // metastore failure is retried on the next batch instead of
      // leaving the table permanently unregistered in this JVM
      registered.add(key)
    }
  }

  /** Streaming auto-maintenance: run [[DimStore.maintain]]'s measured
    * policy against a sink table every `everyBatches` upserting
    * micro-batches, so layout health is owned by the PIPELINE instead
    * of an operator remembering to run a manual job. With
    * `applyActions = true` the chosen rebucket/compact runs inline in
    * the micro-batch (one ordinary optimistic commit — the stream
    * pauses for the rewrite, which is the synchronous maintenance
    * window a small dim table can afford); with `false` the policy
    * only measures and records its recommendation in
    * [[lastMaintenance]] for an external maintenance window to act on
    * — what a 100 TB fact-sized table wants, since its rebucket is
    * hours of rewrite that must not sit inside a micro-batch. */
  /** `vacuumKeepLast > 0` additionally prunes table HISTORY on the
    * same cadence (after any applied action): per-micro-batch upserts
    * accrete one committed version each, and without scheduled vacuum
    * a long-lived streaming dim table's storage is its entire history.
    * The grace window keeps versions a concurrent reader may still
    * hold open (same contract as [[DimStore.vacuum]]). */
  final case class MaintenancePolicy(
      everyBatches: Int = 64,
      targetBucketBytes: Long = 256L * 1024 * 1024,
      targetFileBytes: Long = 128L * 1024 * 1024,
      maxFilesPerBucket: Int = 4,
      maxBuckets: Int = 4096,
      applyActions: Boolean = true,
      vacuumKeepLast: Int = 0,
      vacuumGraceMillis: Long = 24L * 3600 * 1000) {
    require(everyBatches >= 1, "everyBatches must be positive")
  }

  /** Most recent [[DimStore.Maintenance]] report per table path —
    * report-only mode's output surface, and the test/monitoring hook. */
  val lastMaintenance =
    new java.util.concurrent.ConcurrentHashMap[String, DimStore.Maintenance]()
  private val upsertsSinceMaintain =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()

  /** One micro-batch: route + project + upsert. `versionCol` orders
    * writes for last-writer-wins (the reference relies on Kafka
    * per-partition order; a version column is the batch equivalent).
    * `catalogDb` (when set) applies K4's dynamic DDL per config row;
    * `maintenance` (when set) runs the measured layout policy every
    * N upserting batches per sink table. */
  def routeBatch(batch: DataFrame, config: Seq[TableProcess],
                 basePath: String, versionCol: String,
                 catalogDb: Option[String] = None,
                 maintenance: Option[MaintenancePolicy] = None): Unit = {
    val spark = batch.sparkSession
    config.foreach { tp =>
      val keep = tp.sinkColumns.split(",").map(_.trim).filter(_.nonEmpty)
      val cols = (keep :+ versionCol).distinct.toIndexedSeq.map(col)
      val routed = batch
        .filter(col("source_table") === tp.sourceTable)
        .select(cols: _*)
      if (!routed.isEmpty) {
        val path = s"$basePath/${tp.sinkTable}"
        DimStore.upsert(spark, path, routed, tp.sinkPk, versionCol)
        // register AFTER the first upsert: the external table's schema
        // is inferred from the (now populated) location, mirroring the
        // reference's all-varchar DDL with real inferred types instead.
        // The refresh drops any cached file listing so readers see each
        // upsert's directory swap.
        catalogDb.foreach { db =>
          ensureTable(spark, db, tp, basePath)
          spark.catalog.refreshTable(s"$db.${tp.sinkTable}")
        }
        maintenance.foreach { p =>
          val n = upsertsSinceMaintain
            .computeIfAbsent(path,
              _ => new java.util.concurrent.atomic.AtomicLong())
            .incrementAndGet()
          if (n % p.everyBatches == 0) {
            val m = DimStore.maintain(spark, path, tp.sinkPk,
              targetBucketBytes = p.targetBucketBytes,
              targetFileBytes = p.targetFileBytes,
              maxFilesPerBucket = p.maxFilesPerBucket,
              maxBuckets = p.maxBuckets,
              apply = p.applyActions)
            lastMaintenance.put(path, m)
            if (p.vacuumKeepLast > 0)
              DimStore.vacuum(spark, path, p.vacuumKeepLast,
                p.vacuumGraceMillis)
            // the maintenance commit replaces the data layout wholesale;
            // name-based readers must drop their cached file listing
            if (m.applied.nonEmpty) catalogDb.foreach { db =>
              spark.catalog.refreshTable(s"$db.${tp.sinkTable}")
            }
          }
        }
      }
    }
  }

  /** Streaming entry: CDC records in, dim tables out, config re-read
    * per batch (S2's snapshot-then-incremental semantics are supplied
    * by whatever feeds `cdc` — file source in tests, Kafka+Debezium in
    * production). */
  def start(cdc: DataFrame, loadConfig: SparkSession => Seq[TableProcess],
            basePath: String, versionCol: String, checkpoint: String,
            catalogDb: Option[String] = None,
            maintenance: Option[MaintenancePolicy] = None): StreamingQuery =
    cdc.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        routeBatch(batch.toDF(), loadConfig(batch.sparkSession), basePath,
          versionCol, catalogDb, maintenance)
      }
      .start()
}
