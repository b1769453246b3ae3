package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, hash, row_number, struct}

/** K3/K4 — keyed upsert (MERGE) dim store over parquet.
  *
  * The reference upserts each record into Phoenix/HBase via JDBC
  * (app/func/DimSinkFunction.java:13-33, utils/PhoenixUtil.java:23-63)
  * and creates tables on demand from config
  * (app/func/TableProcessFunction.java:48-102). The Spark-native
  * equivalent is a MERGE into a table keyed on the configured pk:
  *
  *   merged = existing ∪ batch → keep latest per pk (by version column)
  *
  * Plain parquet (rewrite + atomic directory swap) because this
  * container ships no Delta/Iceberg; on a real deployment `upsert`'s
  * body is one `DeltaTable.merge(...)` with identical semantics, and
  * the rewrite cost drops from O(table) to O(touched files). The
  * last-writer-wins semantics here are what w10_dim_upsert_lww
  * oracle-checks at the query level.
  */
object DimStore {

  /** Table auto-creation (K4) falls out naturally: first upsert of an
    * unseen sinkTable writes the directory. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
             pk: String, versionCol: String): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    val target = new Path(path)
    // allowMissingColumns = schema evolution: a config change that adds
    // a sink column (the reference's dynamic DDL world, where every
    // column is nullable varchar) must not break the upsert — existing
    // rows read back with the new column null, and a batch missing a
    // historical column null-fills it likewise
    val merged =
      if (fs.exists(target))
        spark.read.parquet(path)
          .unionByName(batch, allowMissingColumns = true)
      else batch
    // version desc, then a deterministic content tie-break so equal
    // versions don't pick a nondeterministic winner across reruns
    val w = Window.partitionBy(col(pk))
      .orderBy(col(versionCol).desc, hash(struct(merged.columns.map(col): _*)).desc)
    val latest = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    swapIn(spark, path, latest)
  }

  /** Crash-safe table replacement (write to .__tmp, rename into place).
    * Invariant: at every point at least one complete copy of the table
    * exists at target or at .__old, and recover() below restores .__old
    * to target when a crash left the table missing — it never deletes
    * .__old unless target is present. (On Delta this whole dance is one
    * transactional commit.) Shared by the keyed upsert above and any
    * read-modify-write maintainer (e.g. streaming.UvSketchStore). */
  def swapIn(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + ".__tmp")
    val old = new Path(path + ".__old")
    df.write.mode("overwrite").parquet(tmp.toString)
    def renameOrThrow(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")
    if (fs.exists(target)) {
      renameOrThrow(target, old)
      renameOrThrow(tmp, target)
      fs.delete(old, true)
    } else {
      renameOrThrow(tmp, target)
    }
  }

  /** Recover from an upsert interrupted between its two renames: if the
    * table is missing but a .__old backup exists, restore it. Called
    * automatically before reads and upserts. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val target = new Path(path)
    val old = new Path(path + ".__old")
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    spark.read.parquet(path)
  }

  /** Recover-aware existence probe. Callers deciding between "create
    * fresh" and "read-modify-write" MUST use this, not a raw
    * fs.exists: after a crash between swapIn's renames the table lives
    * at .__old, and a raw exists=false would silently restart the
    * table from empty — exactly the loss the swap invariant exists to
    * prevent. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    fs.exists(new Path(path))
  }

  /** One recover + one existence probe + read: the per-micro-batch
    * read-modify-write path (exists-then-read would run the recover
    * probe twice per batch against the namenode). */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    if (fs.exists(new Path(path))) Some(spark.read.parquet(path)) else None
  }

  /** Small-file compaction: rewrite the table into ⌈bytes/target⌉
    * files via the same crash-safe swap. Per-micro-batch upserts (and
    * any streaming file sink) accrete one-file-per-batch fragments;
    * at warehouse scale the resulting footer-per-file planning cost
    * and undersized scan tasks dominate read latency, so compaction is
    * periodic maintenance, not an optimization. coalesce (not
    * repartition) keeps the rewrite shuffle-free — it only glues
    * existing partitions together. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    val bytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    swapIn(spark, path, spark.read.parquet(path).coalesce(nFiles))
    nFiles
  }
}
