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
    val target = new Path(path)
    val merged =
      if (fs.exists(target)) spark.read.parquet(path).unionByName(batch)
      else batch
    // version desc, then a deterministic content tie-break so equal
    // versions don't pick a nondeterministic winner across reruns
    val w = Window.partitionBy(col(pk))
      .orderBy(col(versionCol).desc, hash(struct(merged.columns.map(col): _*)).desc)
    val latest = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    // crash-safe swap: the live table is renamed aside before the new
    // snapshot takes its place, so no window exists where the table is
    // simply gone; an interrupted upsert leaves either the old table or
    // (old at .__old, new at target). A leftover .__old from a previous
    // crash is cleaned up first. (On Delta this whole dance is one
    // transactional MERGE.)
    val tmp = new Path(path + ".__tmp")
    val old = new Path(path + ".__old")
    latest.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    val hadTarget = fs.exists(target)
    if (hadTarget) fs.rename(target, old)
    fs.rename(tmp, target)
    if (hadTarget) fs.delete(old, true)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
