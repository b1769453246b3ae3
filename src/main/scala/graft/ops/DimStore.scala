package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, hash, lit, pmod, row_number, struct}

/** K3/K4 — keyed upsert (MERGE) dim store over parquet, with a
  * Delta/Iceberg-style versioned-snapshot commit protocol.
  *
  * The reference upserts each record into Phoenix/HBase via JDBC
  * (app/func/DimSinkFunction.java:13-33, utils/PhoenixUtil.java:23-63)
  * and creates tables on demand from config
  * (app/func/TableProcessFunction.java:48-102). The Spark-native
  * equivalent is a MERGE into a table keyed on the configured pk:
  *
  *   merged = existing ∪ batch → keep latest per pk (by version column)
  *
  * == Table format ==
  *
  * Data files are IMMUTABLE once written; table state is defined by a
  * commit log, the same architecture as Delta's `_delta_log` /
  * Iceberg's metadata tree (public format specs):
  *
  * {{{
  * table/
  *   _commits/00000000000000000007.manifest   commit log (source of truth)
  *   _gens/g00000000000000000007-ab12cdef/    immutable per-commit data
  *          __bucket=k/part-*.parquet
  *   __bucket=k/                              hardlink PROJECTION of the
  *                                            latest manifest (see below)
  *   _graft_buckets, _graft_view              fan-out + projection markers
  * }}}
  *
  * A manifest records the table version, the bucket fan-out, and which
  * generation currently owns each `__bucket=k`. Commits are published
  * by an atomic create-if-absent of the next version's manifest file
  * (hard-link of a temp file — the POSIX primitive that fails, atomically,
  * when the target exists). Exactly one of any set of concurrent
  * committers wins a version; losers detect the collision, discard
  * their candidate generation, re-merge against the winner's manifest
  * and retry at the next version — optimistic concurrency, the same
  * loser-retries contract as Delta's commit protocol. The commit log
  * is java.nio throughout, so THIS BUILD IS LOCAL-FILESYSTEM ONLY
  * (`nio` fails loudly on any other scheme); porting to HDFS would
  * route manifest IO through the Hadoop FileSystem, whose
  * `create(path, overwrite=false)` supplies the same atomic claim, and
  * raw S3 needs a coordination service exactly as Delta's LogStore does.
  *
  * Because every manifest is a SELF-CONTAINED snapshot (the full
  * bucket→generation map, not a delta), the Delta-checkpoint problem
  * reduces to finding the newest manifest without listing the whole
  * log: a `_commits/_version_hint` pointer (Iceberg's
  * `version-hint.text` pattern, public spec) is rewritten after every
  * commit, and [[currentVersion]] reads it and probes forward — O(1)
  * files per resolution however long the history grows, with a full
  * listing only as the fallback for a missing/stale-past-vacuum hint.
  *
  * == Snapshot isolation & time travel ==
  *
  * [[read(spark:org\.apache\.spark\.sql\.SparkSession,path:String)* read]]
  * pins the latest manifest at call time and reads only the generations
  * it references — a concurrent commit cannot tear the scan.
  * [[read(spark:org\.apache\.spark\.sql\.SparkSession,path:String,asOf:Long)* read(asOf)]]
  * reads any still-retained historical version; [[history]] lists them;
  * [[vacuum]] retires old versions and deletes the generations only
  * they reference (explicit, like Delta's VACUUM — time travel works
  * until vacuumed, never silently), with a grace window: retired
  * generations are stamped in place and deleted only after the stamp
  * ages, so in-flight readers of a just-retired version finish clean.
  *
  * == The root projection ==
  *
  * Name-based readers (the K4 catalog tables DimRouter registers read
  * the table ROOT with recursiveFileLookup) can't resolve manifests, so
  * the root `__bucket=k` dirs are maintained as a HARDLINK projection of
  * the latest manifest — zero data copied, refreshed per commit, and
  * self-healing: [[recover]] re-projects any bucket whose view drifted
  * from the log. Spark's file listing hides `_`/`.`-prefixed dirs
  * (except `name=value` partition dirs), so `_commits`/`_gens` are
  * invisible to root readers while the `__bucket=k` projection is
  * visible — historical generations never leak into a root scan.
  *
  * == Scale contract (unchanged from the unversioned store) ==
  *
  * The table is hash-bucketed on the pk (k = pmod(hash(pk), n)); an
  * upsert reads and rewrites ONLY the buckets containing batch pks —
  * O(touched buckets) write amplification, the plain-parquet analogue
  * of Delta MERGE's O(touched files). A 100 TB dim with a micro-batch
  * touching few keys rewrites a bounded fraction of the table per
  * commit; untouched generations are untouched bytes. Crash contract:
  * data generations land before the manifest, so a crash anywhere
  * leaves the table at the OLD version with (at worst) an orphaned,
  * unreferenced generation that the next vacuum removes; a replayed
  * micro-batch re-merges idempotently (deterministic LWW winner per
  * pk), so effects are exactly-once after replay (K2).
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

  // -------------------------------------------------------------------
  // commit log (java.nio throughout: manifests are never read through
  // the Hadoop fs, so no .crc sidecar can ever disagree with them)

  private final case class Manifest(version: Long, buckets: Int,
                                    gens: Map[Int, String])

  private val ManifestSuffix = ".manifest"

  /** Local filesystem path for the commit log. The log's atomicity
    * primitive (hard-link create-if-absent) is per-filesystem, exactly
    * like Delta's LogStore; this build supports the local filesystem
    * only and fails loudly elsewhere (an HDFS port would use
    * `FileSystem.create(path, overwrite = false)` for the claim). */
  private def nio(path: String): java.nio.file.Path = {
    val u = new Path(path).toUri
    if (u.getScheme == null || u.getScheme == "file") Paths.get(u.getPath)
    else throw new UnsupportedOperationException(
      s"DimStore's commit log needs a posix filesystem; got scheme ${u.getScheme}")
  }

  private def commitsDir(path: String) = nio(path).resolve("_commits")
  private def gensDir(path: String)    = nio(path).resolve("_gens")
  private def viewFile(path: String)   = nio(path).resolve("_graft_view")

  private def manifestName(v: Long) = f"$v%020d$ManifestSuffix"

  private def isVersioned(path: String): Boolean =
    Files.isDirectory(commitsDir(path))

  /** Full `_commits/` directory listings performed (test hook: pins the
    * O(1)-files-per-resolution contract of the version hint — a hot
    * read path must not bump this however long the history grows). */
  private[graft] val logListings = new java.util.concurrent.atomic.AtomicLong

  /** All committed (still-retained) versions, ascending. O(history)
    * directory listing — correct always, and the fallback when the
    * version hint is missing or stale; hot paths go through
    * [[currentVersion]] instead. */
  def history(path: String): Seq[Long] =
    if (!Files.isDirectory(commitsDir(path))) Nil
    else {
      logListings.incrementAndGet()
      val s = Files.list(commitsDir(path))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.endsWith(ManifestSuffix) && !n.startsWith("."))
          .map(_.stripSuffix(ManifestSuffix).toLong).toVector.sorted
      } finally s.close()
    }

  // ---- `_commits/_version_hint`: Iceberg's version-hint.text pattern.
  // The hint is an OPTIMIZATION ONLY — best-effort written, never the
  // source of truth. A reader trusts it only when the hinted manifest
  // actually exists, then probes forward (versions are dense integers,
  // so the newest retained version is the last in an unbroken run);
  // a missing/corrupt/vacuumed-past hint falls back to the full
  // listing and rewrites the hint for the next reader.

  private def hintFile(path: String) = commitsDir(path).resolve("_version_hint")

  private def readHint(path: String): Option[Long] =
    try Some(new String(Files.readAllBytes(hintFile(path)),
      StandardCharsets.UTF_8).trim.toLong)
    catch { case _: java.io.IOException | _: NumberFormatException => None }

  /** Advance the hint to `v`. Default is forward-only — a slow
    * committer of v−1 finishing after the committer of v must not move
    * the pointer backwards; staleness is survivable, churn is
    * pointless. `force` is for the listing fallback, which has just
    * authoritatively resolved the log and must be able to REPLACE a
    * bogus too-high hint (which forward-only would keep forever,
    * condemning every later resolution to the full listing). Failures
    * are swallowed: the listing fallback owns correctness. */
  private def writeHint(path: String, v: Long, force: Boolean = false): Unit =
    try {
      if (force || readHint(path).forall(_ < v)) {
        val cd = commitsDir(path)
        val tmp = Files.createTempFile(cd, "._hint-", "")
        Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, hintFile(path),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      }
    } catch { case _: java.io.IOException => () }

  /** The table's current committed version (None before first commit
    * and for legacy/flat stores). O(1) files touched when the hint is
    * fresh: read hint, stat the hinted manifest, stat one-past-the-end;
    * each stale step adds one stat. Only a missing/unusable hint pays
    * the O(history) listing. */
  def currentVersion(path: String): Option[Long] =
    readHint(path) match {
      case Some(h) if Files.exists(commitsDir(path).resolve(manifestName(h))) =>
        var v = h
        while (Files.exists(commitsDir(path).resolve(manifestName(v + 1)))) v += 1
        if (v != h) writeHint(path, v)
        Some(v)
      case _ =>
        val r = history(path).lastOption
        r.foreach(writeHint(path, _, force = true))
        r
    }

  /** Manifests are IMMUTABLE once published (the atomic create-if-
    * absent claim means a version's content can never change), so
    * reads are cached — a per-micro-batch committer re-resolves the
    * same manifest several times (recover, merge base, view sync), and
    * each re-read would otherwise be file IO. The cache key includes
    * the manifest FILE's size+mtime (one stat, an order cheaper than
    * read+parse): a table deleted and recreated at the same path gets
    * a fresh entry instead of resurrecting the old table's generation
    * map, and a vacuumed manifest stops being servable the moment its
    * file is gone (the stat throws NoSuchFileException — callers that
    * can race a vacuum catch it and re-resolve). Bounded by wholesale
    * clear (entries are tiny; 4096 ≈ years of retained history across
    * every table a JVM touches). */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long, Long), Manifest]()

  private def readManifest(path: String, v: Long): Manifest = {
    val file = commitsDir(path).resolve(manifestName(v))
    val attrs = Files.readAttributes(
      file, classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = (nio(path).toAbsolutePath.toString, v,
      attrs.size, attrs.lastModifiedTime.toMillis)
    val hit = manifestCache.get(key)
    if (hit != null) hit
    else {
      import scala.jdk.CollectionConverters._
      val lines = Files.readAllLines(file, StandardCharsets.UTF_8).asScala
      val n = lines.collectFirst { case l if l.startsWith("n=") => l.drop(2).toInt }
        .getOrElse(throw new IllegalStateException(s"manifest $v of $path has no fan-out"))
      val gens = lines.collect { case l if l.startsWith("b=") =>
        val Array(b, g) = l.drop(2).split("\t", 2)
        b.toInt -> g
      }
      val m = Manifest(v, n, gens.toMap)
      if (manifestCache.size > 4096) manifestCache.clear()
      manifestCache.put(key, m)
      m
    }
  }

  private def tryReadManifest(path: String, v: Long): Option[Manifest] =
    try Some(readManifest(path, v))
    catch { case _: java.io.IOException | _: java.nio.file.NoSuchFileException => None }

  private def latest(path: String): Option[Manifest] =
    currentVersion(path) match {
      case None => None
      case Some(v) =>
        try Some(readManifest(path, v))
        catch { case _: java.nio.file.NoSuchFileException =>
          // a stale hint raced a concurrent vacuum: the probed version's
          // manifest is gone by the time we read it. Re-resolve from the
          // authoritative listing and repair the hint.
          history(path).lastOption.map { w =>
            writeHint(path, w, force = true)
            readManifest(path, w)
          }
        }
    }

  /** Publish manifest `m` iff version `m.version` is still unclaimed.
    * Returns false when a concurrent committer won the version — the
    * caller re-merges against the winner and retries. Atomicity:
    * content goes to a hidden temp file, then a hard link (create-if-
    * absent, atomic on posix) claims the version name; readers can
    * never observe a partially-written manifest. */
  private def tryCommit(path: String, m: Manifest): Boolean = {
    val cd = commitsDir(path)
    Files.createDirectories(cd)
    val body = (s"v=${m.version}" +: s"n=${m.buckets}" +:
      m.gens.toSeq.sortBy(_._1).map { case (b, g) => s"b=$b\t$g" })
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(cd, ".tmp-", "")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    val target = cd.resolve(manifestName(m.version))
    val won =
      try { Files.createLink(target, tmp); true }
      catch {
        case _: FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // no hard links (exotic fs): move-no-replace is the fallback
          try { Files.move(tmp, target); true }
          catch { case _: FileAlreadyExistsException => false }
      }
    Files.deleteIfExists(tmp)
    if (won) writeHint(path, m.version)
    won
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val w = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toVector.sortBy(-_.getNameCount)
          .foreach(f => Files.deleteIfExists(f))
      } finally w.close()
    }

  /** Write `merged` (carrying BucketCol) as a new immutable generation
    * for candidate version `v`; returns the generation dir name. The
    * write lands in a hidden temp dir and is renamed into `_gens` in
    * one atomic same-fs move, so a generation is either fully present
    * or absent. */
  /** `onePerBucket = true` (the upsert paths) repartitions on the
    * bucket key first: without it every upstream task writes a file
    * into every bucket dir it has rows for (tasks × buckets files per
    * generation — file-count bloat that taxes the readback, the
    * hardlink projection, and eventually compaction); with it each
    * bucket is one task → one file. Compaction passes `false` — it
    * already owns its partitioning (bucket + size salt, so an
    * over-target bucket deliberately splits across several files) and
    * a blanket bucket repartition here would collapse that back to
    * one. */
  private def writeGen(merged: DataFrame, path: String, v: Long,
                       onePerBucket: Boolean = true): String = {
    val gd = gensDir(path)
    Files.createDirectories(gd)
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    val genName = f"g$v%020d-$nonce"
    val tmp = gd.resolve(s".w-$genName")
    val laidOut = if (onePerBucket) merged.repartition(col(BucketCol)) else merged
    laidOut.write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)
    Files.move(tmp, gd.resolve(genName))
    genName
  }

  private def genVersionOf(genName: String): Long =
    genName.stripPrefix("g").takeWhile(_ != '-').toLong

  private def bucketDirsOf(path: String, gen: String): Seq[Int] = {
    val s = Files.list(gensDir(path).resolve(gen))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(s"$BucketCol="))
        .map(_.stripPrefix(s"$BucketCol=").toInt).toVector.sorted
    } finally s.close()
  }

  private def bucketPath(path: String, gen: String, b: Int): String =
    s"$path/_gens/$gen/$BucketCol=$b"

  /** Snapshot scan of manifest `m` (optionally restricted to
    * `buckets`): reads exactly the generation dirs the manifest
    * references — a concurrent commit cannot tear it. The physical
    * files don't carry BucketCol (it's encoded in the dir names), so
    * the result is bucket-column-free. */
  private def readSnapshot(spark: SparkSession, path: String, m: Manifest,
                           buckets: Option[Seq[Int]] = None): Option[DataFrame] = {
    val sel = buckets.getOrElse(m.gens.keys.toSeq.sorted)
    val paths = sel.flatMap(b => m.gens.get(b).map(g => bucketPath(path, g, b)))
    if (paths.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(paths: _*))
  }

  /** Like [[readSnapshot]] but surfaces BucketCol (via per-generation
    * basePath partition inference) for maintainers that must preserve
    * the physical layout without knowing the pk (compaction). */
  private def readSnapshotWithBuckets(spark: SparkSession, path: String,
                                      m: Manifest): Option[DataFrame] = {
    val byGen = m.gens.groupBy(_._2)
    val parts = byGen.toSeq.sortBy(_._1).map { case (gen, bs) =>
      spark.read
        .option("mergeSchema", "true")
        .option("basePath", s"$path/_gens/$gen")
        .parquet(bs.keys.toSeq.sorted.map(b => bucketPath(path, gen, b)): _*)
    }
    parts.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  // -------------------------------------------------------------------
  // root projection (what name-based/catalog readers see)

  /** Per-path in-JVM lock for view maintenance; cross-JVM drift is
    * repaired by recover-on-read, so the lock is a convenience that
    * keeps same-process committers from tripping over each other's
    * renames, not a correctness requirement. */
  private val viewLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def readViewVersion(path: String): Option[Long] =
    try Some(new String(Files.readAllBytes(viewFile(path)),
      StandardCharsets.UTF_8).trim.toLong)
    catch { case _: java.io.IOException | _: NumberFormatException => None }

  private def writeViewVersion(path: String, v: Long): Unit = {
    val tmp = Files.createTempFile(nio(path), "._view-", "")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, viewFile(path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Bring the root `__bucket=k` hardlink projection up to the latest
    * manifest. Only buckets whose generation changed since the last
    * projected version are re-linked, so a single-pk upsert touches one
    * root dir and every other stays byte-identical. Idempotent and
    * convergent: projecting is re-resolving latest-then-link, so a
    * crash mid-projection (or a lost in-JVM race) is healed by the next
    * call. */
  private def syncView(spark: SparkSession, path: String): Unit = {
    val lock = viewLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      var rounds = 0
      var done = false
      while (!done && rounds < 100) {
        rounds += 1
        latest(path) match {
          case None => done = true
          case Some(m) if readViewVersion(path).contains(m.version) => done = true
          case Some(m) =>
            val prev = readViewVersion(path)
              .flatMap(tryReadManifest(path, _)).map(_.gens).getOrElse(Map.empty)
            val stale = m.gens.filter { case (b, g) => !prev.get(b).contains(g) }
            stale.keys.toSeq.sorted.foreach { b =>
              val src = gensDir(path).resolve(m.gens(b)).resolve(s"$BucketCol=$b")
              val tmpB = nio(path).resolve(s".__view-$b")
              deleteTree(tmpB)
              Staging.linkClone(src.toString, tmpB)
              val tgt = nio(path).resolve(s"$BucketCol=$b")
              val oldRoot = Paths.get(path + ".__old")
              Files.createDirectories(oldRoot)
              val oldB = oldRoot.resolve(s"$BucketCol=$b")
              deleteTree(oldB)
              // same at-least-one-complete-copy dance as the legacy
              // swap; recover() finishes it after a crash
              if (Files.exists(tgt)) Files.move(tgt, oldB)
              Files.move(tmpB, tgt)
              deleteTree(oldB)
            }
            // the .__old root is only a crash-window staging area here
            val oldRoot = Paths.get(path + ".__old")
            if (Files.isDirectory(oldRoot)) {
              val l = Files.list(oldRoot)
              val empty = try !l.iterator().hasNext finally l.close()
              if (empty) Files.deleteIfExists(oldRoot)
            }
            writeViewVersion(path, m.version)
            // loop once more in case a newer commit landed meanwhile
        }
      }
    }
  }

  // -------------------------------------------------------------------
  // public surface

  /** Table auto-creation (K4) falls out naturally: first upsert of an
    * unseen sinkTable creates the directory and commits version 1.
    * Every later upsert is one optimistic-concurrency commit: merge
    * against the latest manifest, write a new generation for the
    * touched buckets, claim the next version (losers of a concurrent
    * race discard and retry against the winner). */
  def upsert(spark: SparkSession, path: String, rawBatch: DataFrame,
             pk: String, versionCol: String, nBuckets: Int = NumBuckets): Unit = {
    require(!rawBatch.columns.contains(BucketCol),
      s"$BucketCol is reserved for DimStore's internal layout; " +
      "rename the batch column")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    // The batch is consumed several times per commit (emptiness probe,
    // touched-bucket collect, the merge write — more on a lost race).
    // Its lineage is often a whole parse/state topology (the streaming
    // foreachBatch path), so pin it once instead of recomputing per
    // consumer; spill-safe, and released in finally. Ownership: only
    // unpersist what WE persisted — persist() on an already-cached
    // Dataset is a no-op returning the same plan, so unpersisting a
    // caller-persisted batch would evict the CALLER's cache.
    val callerPersisted =
      rawBatch.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val batch =
      if (callerPersisted) rawBatch
      else rawBatch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // An all-filtered micro-batch (every record malformed/routed away)
    // must be a no-op: creating the table from it would write a
    // schema-less directory that wedges every later read. The probe is
    // only paid on the create/migrate paths — for an existing
    // versioned table mergeLoop's touched-bucket collect subsumes it
    // (empty batch → no touched buckets → no commit), saving one
    // Spark job per steady-state micro-batch.
    try if (currentVersion(path).nonEmpty) {
      mergeLoop(spark, path, batch, pk, versionCol)
    } else if (!batch.isEmpty) {

    // "has data" distinguishes a real legacy table from an empty root
    // (or one holding only the debris of a crashed first commit)
    def rootHasVisibleData =
      fs.exists(new Path(path)) &&
        fs.listStatus(new Path(path)).exists(st => isVisible(st.getPath.getName))
    if (!rootHasVisibleData) {
      // ---- create: commit version 1
      val bb = batch.withColumn(BucketCol, bucketOf(pk, nBuckets))
      val gen = writeGen(latestPerPk(bb, pk, versionCol), path, 1L)
      val m = Manifest(1L, nBuckets,
        bucketDirsOf(path, gen).map(_ -> gen).toMap)
      if (tryCommit(path, m)) {
        writeBucketCount(fs, path, nBuckets)
        syncView(spark, path)
      } else {
        // a concurrent creator won v1: discard and merge against it
        deleteTree(gensDir(path).resolve(gen))
        mergeLoop(spark, path, batch, pk, versionCol)
      }
    } else {
      // ---- migrate a legacy (pre-commit-log) table: fold its full
      // contents and this batch into version 1 — a one-time O(table)
      // cost, after which upserts are O(touched buckets) again
      val tableBuckets = readBucketCount(fs, path, nBuckets)
      val existing = readRaw(spark, path).drop(BucketCol)
        .withColumn(BucketCol, bucketOf(pk, tableBuckets))
      val bb = batch.withColumn(BucketCol, bucketOf(pk, tableBuckets))
      val merged = latestPerPk(
        existing.unionByName(bb, allowMissingColumns = true), pk, versionCol)
      val gen = writeGen(merged, path, 1L)
      val m = Manifest(1L, tableBuckets,
        bucketDirsOf(path, gen).map(_ -> gen).toMap)
      if (tryCommit(path, m)) {
        // the projection now owns the root: clear the legacy files
        // (the gen write above already materialized them into v1)
        dropLegacyRootData(fs, path)
        writeBucketCount(fs, path, tableBuckets)
        syncView(spark, path)
      } else {
        deleteTree(gensDir(path).resolve(gen))
        mergeLoop(spark, path, batch, pk, versionCol)
      }
    }
    } finally { if (!callerPersisted) { batch.unpersist(); () } }
  }

  /** The optimistic-concurrency MERGE: read the touched buckets of the
    * latest manifest, LWW-merge the batch in, write one new generation,
    * claim the next version. Lost race → discard the candidate
    * generation and retry against the winner's manifest (the batch's
    * effects are never silently dropped — last-writer-wins holds ACROSS
    * committers because the retry re-merges). */
  private def mergeLoop(spark: SparkSession, path: String, batch: DataFrame,
                        pk: String, versionCol: String): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      val base = latest(path).getOrElse(throw new IllegalStateException(
        s"$path has a _commits dir but no committed manifest"))
      val bb = batch.withColumn(BucketCol, bucketOf(pk, base.buckets))
      val touched = bb.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).sorted
      // empty batch → no touched buckets → no commit (this collect IS
      // upsert's emptiness gate on the steady-state path)
      if (touched.isEmpty) return
      val existingBuckets = touched.filter(base.gens.contains).toSeq
      val existing = readSnapshot(spark, path, base, Some(existingBuckets))
        .map(_.withColumn(BucketCol, bucketOf(pk, base.buckets)))
      // allowMissingColumns = schema evolution: a config change that
      // adds a sink column (the reference's dynamic DDL world, where
      // every column is nullable varchar) must not break the upsert —
      // existing rows read back with the new column null, and a batch
      // missing a historical column null-fills it likewise. Untouched
      // generations keep their old physical schema; mergeSchema on
      // read reconciles (Delta keeps this in the txn log instead).
      val merged = latestPerPk(
        existing.fold(bb)(_.unionByName(bb, allowMissingColumns = true)),
        pk, versionCol)
      val gen = writeGen(merged, path, base.version + 1)
      // LWW keeps ≥1 row per pk, so every touched bucket must appear in
      // the generation; a miss means the touched set and the merge
      // output disagree — fail loudly rather than drop a bucket
      val present = bucketDirsOf(path, gen).toSet
      touched.foreach { k =>
        if (!present(k)) throw new IllegalStateException(
          s"bucket $k missing from generation $gen of $path")
      }
      val next = Manifest(base.version + 1, base.buckets,
        base.gens ++ touched.map(_ -> gen))
      if (tryCommit(path, next)) {
        syncView(spark, path)
        done = true
      } else {
        deleteTree(gensDir(path).resolve(gen))
        attempt += 1
        if (attempt > 50) throw new java.util.ConcurrentModificationException(
          s"lost the commit race $attempt times at $path")
      }
    }
  }

  /** Spark's file-index visibility rule: `_`/`.`-prefixed names are
    * hidden UNLESS they contain `=` (partition dirs like `__bucket=3`
    * stay visible). Anything visible at a table root is data a
    * name-based reader would scan. */
  private def isVisible(name: String): Boolean =
    (!name.startsWith("_") && !name.startsWith(".")) || name.contains("=")

  /** Legacy data lives at the table root (flat files or bucket dirs);
    * after migration the root belongs to the hardlink projection.
    * Internal `_`/`.` entries (commit log, generations, markers) stay. */
  private def dropLegacyRootData(fs: org.apache.hadoop.fs.FileSystem,
                                 path: String): Unit =
    fs.listStatus(new Path(path)).foreach { st =>
      if (isVisible(st.getPath.getName)) fs.delete(st.getPath, true)
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

  /** The table's bucket fan-out marker (compat; the manifest's `n=` is
    * authoritative for versioned tables). Underscore prefix: Spark's
    * file index ignores it, like _SUCCESS. */
  private def bucketCountFile(path: String) = new Path(path, "_graft_buckets")

  private def writeBucketCount(fs: org.apache.hadoop.fs.FileSystem,
                               path: String, n: Int): Unit = {
    val out = fs.create(bucketCountFile(path), true)
    out.write(n.toString.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  /** The fan-out the table was CREATED with wins over the caller's
    * parameter (it is a table property, not a call property). */
  private def readBucketCount(fs: org.apache.hadoop.fs.FileSystem,
                              path: String, fallback: Int): Int =
    latest(path).map(_.buckets).getOrElse {
      val f = bucketCountFile(path)
      if (!fs.exists(f)) fallback
      else {
        val buf = new Array[Byte](fs.getFileStatus(f).getLen.toInt)
        val in = fs.open(f)
        try in.readFully(0, buf) finally in.close()
        new String(buf, StandardCharsets.UTF_8).trim.toInt
      }
    }

  /** Crash-safe whole-table replacement (write to .__tmp, rename into
    * place) for FLAT (non-versioned) stores — the read-modify-write
    * maintainers (e.g. streaming.UvSketchStore) that replace their
    * whole small state each batch. Invariant: at every point at least
    * one complete copy exists at target or at .__old, and recover()
    * restores .__old to target when a crash left the table missing.
    * `partitionedBy` propagates a partition layout into the rewrite. */
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

  /** Recover from interruption. Three shapes:
    *  - whole-table (swapIn, or an external move, crashed): table
    *    missing, complete copy at .__old → restore it (commit log and
    *    generations travel with the root, so a versioned table comes
    *    back whole).
    *  - per-bucket (a projection refresh crashed between its renames):
    *    .__old holds `__bucket=k` children; restore any whose bucket is
    *    missing from the root, drop stale backups.
    *  - projection drift (crash between commit and projection, or a
    *    cross-JVM race): `_graft_view` behind the log → re-link.
    * Called before every read and upsert. */
  private def recover(spark: SparkSession,
                      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val target = new Path(path)
    val old = new Path(path + ".__old")
    if (fs.exists(old)) {
      if (!fs.exists(target)) { fs.rename(old, target) }
      else {
        fs.listStatus(old).foreach { st =>
          val name = st.getPath.getName
          if (name.startsWith(s"$BucketCol=")) {
            val tgtK = new Path(target, name)
            if (!fs.exists(tgtK)) fs.rename(st.getPath, tgtK)
            else fs.delete(st.getPath, true)
          }
        }
        // whatever remains (empty dir, non-bucket debris of a stale
        // backup whose table exists) is superseded
        fs.delete(old, true)
      }
    }
    if (isVersioned(path)) syncView(spark, path)
  }

  /** mergeSchema: buckets evolve schema independently (only touched
    * buckets get rewritten when a column appears), so the footer of any
    * single file is not authoritative. */
  private def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Snapshot-isolated read of the latest committed version (legacy
    * flat stores fall back to a root scan). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    latest(path) match {
      case Some(m) => readSnapshot(spark, path, m).getOrElse(
        throw new IllegalStateException(s"manifest ${m.version} of $path is empty"))
      case None => readRaw(spark, path).drop(BucketCol)
    }
  }

  /** Time travel: read the table as of committed version `asOf`.
    * Throws (listing what IS retained) when the version was never
    * committed or has been vacuumed. */
  def read(spark: SparkSession, path: String, asOf: Long): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    val vs = history(path)
    require(vs.contains(asOf),
      s"version $asOf of $path is not retained (have: ${vs.mkString(", ")})")
    readSnapshot(spark, path, readManifest(path, asOf)).getOrElse(
      throw new IllegalStateException(s"manifest $asOf of $path is empty"))
  }

  /** Recover-aware existence probe. Callers deciding between "create
    * fresh" and "read-modify-write" MUST use this, not a raw
    * fs.exists: after a crash the table may live at .__old, and a raw
    * exists=false would silently restart the table from empty. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    fs.exists(new Path(path))
  }

  /** One recover + one existence probe + read: the per-micro-batch
    * read-modify-write path. */
  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    latest(path) match {
      case Some(m) => readSnapshot(spark, path, m)
      case None =>
        if (fs.exists(new Path(path)))
          Some(readRaw(spark, path).drop(BucketCol))
        else None
    }
  }

  /** How long a retired generation's files stay on disk (and therefore
    * readable by anyone still holding a manifest that references it)
    * after vacuum retires it. */
  val VacuumGraceMillis: Long = 15L * 60 * 1000

  private val RetiredStamp = "_RETIRED"

  /** Retire history: keep the newest `keepLast` versions, drop older
    * manifests, and retire every generation referenced ONLY by them.
    * Explicit, like Delta's VACUUM — time travel works until vacuumed,
    * never silently.
    *
    * Retirement has a GRACE WINDOW (same contract as
    * [[Staging]]'s `_RETIRED` stamps): a retired generation is first
    * stamped IN PLACE — its data files untouched, so a concurrent
    * reader that pinned a v−N manifest before the vacuum keeps
    * scanning safely (deleting, or moving to a trash dir, would yank
    * the files out from under the in-flight scan either way) — and a
    * later vacuum deletes it only once the stamp is older than
    * `graceMillis`. The stamp is a `_`-prefixed file at the generation
    * root: invisible to parquet readers and to [[bucketDirsOf]].
    * In-flight candidate generations (version > newest committed) are
    * never touched, so a concurrent committer can't be vacuumed out
    * from under. Returns the number of generations physically removed
    * (stamp-only retirements don't count until a later pass deletes
    * them; `graceMillis = 0` restores immediate deletion). */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 2,
             graceMillis: Long = VacuumGraceMillis): Int = {
    require(keepLast >= 1, "must retain at least the current version")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    val vs = history(path)
    if (vs.isEmpty) return 0
    // even when no manifests fall out of the window, the generation
    // sweep below still collects orphans of crashed commits
    val keep = vs.takeRight(keepLast)
    val keptGens = keep.map(readManifest(path, _)).flatMap(_.gens.values).toSet
    vs.dropRight(keepLast).foreach { v =>
      Files.deleteIfExists(commitsDir(path).resolve(manifestName(v)))
    }
    val gd = gensDir(path)
    if (!Files.isDirectory(gd)) return 0
    val s = Files.list(gd)
    val retirable =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith("g") && !keptGens(n) &&
            // only generations at-or-below the newest kept version can
            // be garbage; anything newer is a commit in flight
            (try genVersionOf(n) <= keep.last
             catch { case _: NumberFormatException => false }))
          .toVector
      } finally s.close()
    val now = System.currentTimeMillis()
    var removed = 0
    retirable.foreach { n =>
      val stamp = gd.resolve(n).resolve(RetiredStamp)
      val retiredAt: Long =
        if (Files.exists(stamp))
          try new String(Files.readAllBytes(stamp),
            StandardCharsets.UTF_8).trim.toLong
          catch { case _: NumberFormatException =>
            // torn stamp (a vacuum crashed mid-write): re-stamp NOW and
            // restart the clock — treating it as aged-out would delete
            // with zero grace, the exact failure the window prevents
            Files.write(stamp, now.toString.getBytes(StandardCharsets.UTF_8))
            now
          }
        else {
          Files.write(stamp, now.toString.getBytes(StandardCharsets.UTF_8))
          now
        }
      if (now - retiredAt >= graceMillis) {
        deleteTree(gd.resolve(n))
        removed += 1
      }
    }
    // self-heal: a generation back in the kept set must never carry a
    // stale stamp (defensive — reference resurrection can't happen
    // under the current commit protocol, but a stray stamp must not
    // schedule a live generation for deletion)
    keptGens.foreach(n => Files.deleteIfExists(gd.resolve(n).resolve(RetiredStamp)))
    removed
  }

  /** Small-file compaction: rewrite the current version toward
    * `targetFileBytes` files as a NEW commit via the same optimistic
    * protocol — historical versions stay time-travelable until
    * vacuumed. Per-micro-batch upserts accrete one-file-per-batch
    * fragments; at warehouse scale the footer-per-file planning cost
    * and undersized scan tasks dominate read latency, so compaction is
    * periodic maintenance, not an optimization. Bucketed tables
    * repartition by bucket — one shuffle, one-or-few files per bucket —
    * and keep their layout so upserts stay partition-pruned. Returns
    * the number of root bucket dirs (flat tables: the new file count). */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recover(spark, fs, path)
    latest(path) match {
      case Some(_) =>
        var attempt = 0
        while (true) {
          val base = latest(path).get
          val df = readSnapshotWithBuckets(spark, path, base).getOrElse(
            throw new IllegalStateException(s"nothing to compact at $path"))
          val bytes = base.gens.toSeq.map { case (b, g) =>
            val p = Paths.get(new Path(bucketPath(path, g, b)).toUri.getPath)
            val w = Files.walk(p)
            try {
              import scala.jdk.CollectionConverters._
              w.iterator().asScala.filter(Files.isRegularFile(_))
                .map(Files.size).sum
            } finally w.close()
          }.sum
          // honor targetFileBytes WITHIN buckets too: a bucket bigger
          // than the target splits across several files via a
          // deterministic content-hash salt in the repartition key
          val perBucket = math.max(1,
            math.ceil(bytes.toDouble / targetFileBytes / base.buckets).toInt)
          val salt = pmod(hash(struct(
            df.columns.filter(_ != BucketCol).map(col): _*)), lit(perBucket))
          val rewritten = df.repartition(base.buckets * perBucket,
            col(BucketCol), salt)
          val gen = writeGen(rewritten, path, base.version + 1,
            onePerBucket = false)
          val next = Manifest(base.version + 1, base.buckets,
            bucketDirsOf(path, gen).map(_ -> gen).toMap)
          if (tryCommit(path, next)) {
            syncView(spark, path)
            return fs.listStatus(new Path(path))
              .count(_.getPath.getName.startsWith(s"$BucketCol="))
          }
          deleteTree(gensDir(path).resolve(gen))
          attempt += 1
          if (attempt > 50) throw new java.util.ConcurrentModificationException(
            s"lost the compaction commit race $attempt times at $path")
        }
        0 // unreachable
      case None =>
        val bytes = fs.getContentSummary(new Path(path)).getLength
        val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
        swapIn(spark, path, readRaw(spark, path).coalesce(nFiles))
        nFiles
    }
  }
}
