package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, hash, lit, pmod, row_number, struct}

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
  * Layout: the table is hash-partitioned into `__bucket=k` directories
  * (k = pmod(hash(pk), 64)), and an upsert rewrites ONLY the buckets
  * containing batch pks — O(touched buckets), not O(table). This is the
  * plain-parquet approximation of Delta/Iceberg MERGE's O(touched
  * files) write amplification (no Delta jar ships in this container; on
  * a real deployment `upsert`'s body is one `DeltaTable.merge(...)`).
  * A 100 TB dim with 64-way bucketing and a micro-batch touching few
  * keys rewrites ~1/64th of the table worst-case, typically far less —
  * the difference between a streaming sink that keeps up and one whose
  * per-batch cost grows with table age. The last-writer-wins semantics
  * are what w10_dim_upsert_lww oracle-checks at the query level.
  *
  * Crash safety is per-bucket: each touched bucket is replaced by an
  * atomic rename pair with the same at-least-one-complete-copy
  * invariant as the whole-table swap, and `recover()` finishes any
  * interrupted bucket swap before the next read or write. A crash
  * mid-upsert can leave SOME buckets already upserted — safe under the
  * foreachBatch replay contract: the batch is redelivered and the LWW
  * merge is idempotent (deterministic winner per pk), so effects are
  * exactly-once after replay (K2).
  */
object DimStore {

  /** Bucket fan-out. Fixed at table creation (changing it means a
    * rewrite); 64 bounds worst-case upsert write amplification at
    * 1/64th of the table while keeping small dims from fragmenting
    * into thousands of near-empty files. */
  val NumBuckets = 64
  private val BucketCol = "__bucket"

  private def bucketOf(pk: String, n: Int) =
    pmod(hash(col(pk)), lit(n)).cast("int")

  /** A table is bucketed iff its root holds `__bucket=` partition dirs.
    * (Pre-bucketing tables written by older code are flat; first upsert
    * migrates them wholesale — a one-time O(table) cost.) */
  private def isBucketed(fs: org.apache.hadoop.fs.FileSystem, path: String): Boolean =
    fs.exists(new Path(path)) &&
      fs.listStatus(new Path(path)).exists(_.getPath.getName.startsWith(s"$BucketCol="))

  /** The table's bucket fan-out marker. Underscore prefix: Spark's file
    * index ignores it, like _SUCCESS. Without it a later caller passing
    * a different nBuckets would assign batch pks to buckets the
    * existing rows don't live in — the touched-bucket merge would never
    * see the old row and LWW would silently keep duplicates. */
  private def bucketCountFile(path: String) = new Path(path, "_graft_buckets")

  private def writeBucketCount(fs: org.apache.hadoop.fs.FileSystem,
                               path: String, n: Int): Unit = {
    val out = fs.create(bucketCountFile(path), true)
    out.write(n.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** The fan-out the table was CREATED with wins over the caller's
    * parameter (it is a table property, not a call property). */
  private def readBucketCount(fs: org.apache.hadoop.fs.FileSystem,
                              path: String, fallback: Int): Int = {
    val f = bucketCountFile(path)
    if (!fs.exists(f)) fallback
    else {
      val buf = new Array[Byte](fs.getFileStatus(f).getLen.toInt)
      val in = fs.open(f)
      try in.readFully(0, buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toInt
    }
  }

  /** Table auto-creation (K4) falls out naturally: first upsert of an
    * unseen sinkTable writes the directory. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
             pk: String, versionCol: String, nBuckets: Int = NumBuckets): Unit = {
    require(!batch.columns.contains(BucketCol),
      s"$BucketCol is reserved for DimStore's internal layout; " +
      "rename the batch column")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    // An all-filtered micro-batch (every record malformed/routed away)
    // must be a no-op: creating the table from it would write a
    // schema-less directory (a zero-row dynamic-partition write emits
    // no parquet footer) that wedges every later read.
    if (batch.isEmpty) return
    if (!fs.exists(new Path(path))) {
      val bb = batch.withColumn(BucketCol, bucketOf(pk, nBuckets))
      swapIn(spark, path, latestPerPk(bb, pk, versionCol), Seq(BucketCol))
      writeBucketCount(fs, path, nBuckets)
    } else if (!isBucketed(fs, path)) {
      // legacy flat layout: migrate to bucketed in one full merge
      val bb = batch.withColumn(BucketCol, bucketOf(pk, nBuckets))
      val existing = readRaw(spark, path).withColumn(BucketCol, bucketOf(pk, nBuckets))
      val merged = existing.unionByName(bb, allowMissingColumns = true)
      swapIn(spark, path, latestPerPk(merged, pk, versionCol), Seq(BucketCol))
      writeBucketCount(fs, path, nBuckets)
    } else {
      // Partition-pruned merge: only buckets with a batch pk are read
      // or rewritten. The touched-bucket collect is control-plane state
      // bounded by the fan-out (≤ 64 ints), never data.
      val tableBuckets = readBucketCount(fs, path, nBuckets)
      val bb = batch.withColumn(BucketCol, bucketOf(pk, tableBuckets))
      val touched = bb.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).sorted
      val existingTouched = readRaw(spark, path)
        .filter(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
      // allowMissingColumns = schema evolution: a config change that
      // adds a sink column (the reference's dynamic DDL world, where
      // every column is nullable varchar) must not break the upsert —
      // existing rows read back with the new column null, and a batch
      // missing a historical column null-fills it likewise. Untouched
      // buckets keep their old physical schema; mergeSchema on read
      // reconciles (Delta keeps this in the txn log instead).
      val merged = existingTouched.unionByName(bb, allowMissingColumns = true)
      swapBuckets(spark, path, latestPerPk(merged, pk, versionCol), touched)
    }
  }

  /** version desc, then a deterministic content tie-break so equal
    * versions don't pick a nondeterministic winner across reruns (the
    * replay-idempotence half of the exactly-once-effects claim). */
  private def latestPerPk(df: DataFrame, pk: String, versionCol: String): DataFrame = {
    val w = Window.partitionBy(col(pk))
      .orderBy(col(versionCol).desc, hash(struct(df.columns.map(col): _*)).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Replace only the given `__bucket=k` dirs of `path` with the
    * corresponding dirs of a freshly-written merge result. Per-bucket
    * invariant: at every instant a complete copy of the bucket exists
    * at target or under .__old (same dance as swapIn, scoped to one
    * directory; on Delta the whole method is one transactional commit). */
  private def swapBuckets(spark: SparkSession, path: String,
                          merged: DataFrame, touched: Array[Int]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".__tmp")
    val old = new Path(path + ".__old")
    fs.delete(tmp, true)
    merged.write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)
    fs.mkdirs(old)
    touched.foreach { k =>
      val part = s"$BucketCol=$k"
      val tgtK = new Path(path, part)
      val tmpK = new Path(tmp, part)
      val oldK = new Path(old, part)
      // LWW keeps ≥1 row per pk, so a touched bucket is never written
      // empty; a missing tmpK means the touched set and the merge
      // output disagree — fail loudly rather than drop a bucket.
      if (!fs.exists(tmpK))
        throw new IllegalStateException(s"bucket $k missing from merge output $tmp")
      if (fs.exists(tgtK)) {
        if (!fs.rename(tgtK, oldK))
          throw new java.io.IOException(s"rename $tgtK -> $oldK failed")
      }
      if (!fs.rename(tmpK, tgtK))
        throw new java.io.IOException(s"rename $tmpK -> $tgtK failed")
      fs.delete(oldK, true)
    }
    fs.delete(tmp, true)
    fs.delete(old, true) // empty by now; drop the marker dir
  }

  /** Crash-safe table replacement (write to .__tmp, rename into place).
    * Invariant: at every point at least one complete copy of the table
    * exists at target or at .__old, and recover() below restores .__old
    * to target when a crash left the table missing — it never deletes
    * .__old unless target is present. (On Delta this whole dance is one
    * transactional commit.) Shared by the keyed upsert above and any
    * read-modify-write maintainer (e.g. streaming.UvSketchStore).
    * `partitionedBy` propagates a partition layout into the rewrite
    * (bucketed tables must stay bucketed through compaction). */
  def swapIn(spark: SparkSession, path: String, df: DataFrame,
             partitionedBy: Seq[String] = Nil): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmp = new Path(path + ".__tmp")
    val old = new Path(path + ".__old")
    val writer = df.write.mode("overwrite")
    (if (partitionedBy.nonEmpty) writer.partitionBy(partitionedBy: _*) else writer)
      .parquet(tmp.toString)
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

  /** Recover from an interrupted swap. Two shapes:
    *  - whole-table (swapIn crashed between its renames): table missing,
    *    complete copy at .__old → restore it.
    *  - per-bucket (swapBuckets crashed mid-loop): table present, .__old
    *    holds `__bucket=k` children. A child whose bucket is missing
    *    from the table was displaced but never replaced → restore it; a
    *    child whose bucket exists is a stale backup the crash failed to
    *    delete → drop it. Leftover .__tmp is always garbage (next write
    *    rebuilds it). Called before every read and upsert. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val target = new Path(path)
    val old = new Path(path + ".__old")
    if (!fs.exists(old)) return
    if (!fs.exists(target)) { fs.rename(old, target); return }
    fs.listStatus(old).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(s"$BucketCol=")) {
        val tgtK = new Path(target, name)
        if (!fs.exists(tgtK)) fs.rename(st.getPath, tgtK)
        else fs.delete(st.getPath, true)
      }
    }
    // whatever remains (empty dir, non-bucket debris of a stale backup
    // whose table exists) is superseded
    fs.delete(old, true)
  }

  /** mergeSchema: buckets evolve schema independently (only touched
    * buckets get rewritten when a column appears), so the footer of any
    * single file is not authoritative. Delta reads the log instead. */
  private def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    readRaw(spark, path).drop(BucketCol)
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
    if (fs.exists(new Path(path))) Some(readRaw(spark, path).drop(BucketCol)) else None
  }

  /** Small-file compaction: rewrite the table toward `targetFileBytes`
    * files via the same crash-safe swap. Per-micro-batch upserts (and
    * any streaming file sink) accrete one-file-per-batch fragments;
    * at warehouse scale the resulting footer-per-file planning cost
    * and undersized scan tasks dominate read latency, so compaction is
    * periodic maintenance, not an optimization. Flat tables coalesce
    * (shuffle-free glue); bucketed tables repartition by bucket — one
    * shuffle, one file per bucket — and keep their layout so upserts
    * stay partition-pruned. Returns the new file count. */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(fs, path)
    val bytes = fs.getContentSummary(new Path(path)).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    if (isBucketed(fs, path)) {
      val buckets = readBucketCount(fs, path, NumBuckets)
      // honor targetFileBytes WITHIN buckets too: a bucket bigger than
      // the target splits across ceil(table/target/buckets) files via a
      // deterministic content-hash salt in the repartition key (one
      // giant file per bucket would defeat the target and skew the
      // rewrite to one task per bucket)
      val perBucket = math.max(1,
        math.ceil(bytes.toDouble / targetFileBytes / buckets).toInt)
      val raw = readRaw(spark, path)
      val salt = pmod(hash(struct(raw.columns.filter(_ != BucketCol).map(col): _*)),
        lit(perBucket))
      val df = raw.repartition(buckets * perBucket, col(BucketCol), salt)
      swapIn(spark, path, df, Seq(BucketCol))
      // the whole-table swap rewrote the directory: restore the fan-out
      // marker the new tree must carry
      writeBucketCount(fs, path, buckets)
      fs.listStatus(new Path(path)).count(_.getPath.getName.startsWith(s"$BucketCol="))
    } else {
      swapIn(spark, path, readRaw(spark, path).coalesce(nFiles))
      nFiles
    }
  }
}
