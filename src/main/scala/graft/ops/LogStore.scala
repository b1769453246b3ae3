package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, FileSystem, FileUtil, Options, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission

/** The filesystem seam under [[DimStore]]'s commit log — the same
  * abstraction Delta Lake calls a `LogStore` (public API/pattern:
  * `io.delta.storage.LogStore` and its HDFS/local implementations).
  * The commit protocol needs exactly one primitive the data path
  * doesn't: an ATOMIC CREATE-IF-ABSENT ([[LogStore.createIfAbsent]]),
  * which is what makes exactly one of N concurrent committers win a
  * version. Everything else (small-file reads, atomic-replace
  * pointers, listings, tree ops) is portability plumbing.
  *
  * Two implementations, chosen per table path by scheme:
  *
  *  - [[PosixLogStore]] (`file:`/schemeless): java.nio throughout; the
  *    claim is a hard link of a temp file — the posix primitive that
  *    fails atomically when the target exists. Fully atomic under any
  *    mix of processes on one box.
  *  - [[HadoopLogStore]] (everything else, plus tests routing `file:`
  *    through it): Hadoop `FileContext`; the claim is write-temp +
  *    `rename(Rename.NONE)`, which the HDFS NameNode executes
  *    atomically — the exact pattern of Delta's `HDFSLogStore`. On
  *    filesystems whose no-overwrite rename is check-then-act (the
  *    local fs), an in-JVM lock per target serializes claimants, the
  *    same single-JVM contract as Delta's `LocalLogStore`.
  *  - [[ExternalLogStore]] (S3-class object storage — no atomic
  *    rename-if-absent at all): the claim is a CONDITIONAL PUT into an
  *    external [[CommitCoordinator]] (DynamoDB in Delta's published
  *    S3-multi-cluster recipe; pluggable here), with the object store
  *    itself only ever asked for what it actually has — atomic
  *    whole-object overwrite PUTs. The coordinator entry is the commit
  *    point; readers complete any claimed-but-unmaterialized write
  *    they encounter, so a committer crash between claim and target
  *    PUT can never lose or hide a committed version. Routed per table
  *    path via [[DimStore.routeLogViaExternal]] (a real deployment
  *    would key on the `s3:` scheme plus a configured coordinator).
  *
  * `FileContext` rather than `FileSystem` for the metadata ops: the
  * local `FileSystem` is checksummed (every write grows a `.crc`
  * sidecar that can disagree with out-of-band rewrites); `FileContext`
  * binds to the raw filesystem, so log files have no sidecars to
  * drift. Bulk tree ops (clone, size) go through `FileSystem` where
  * `getContentSummary` is one O(1) namenode RPC instead of a client
  * walk.
  */
private[graft] sealed trait LogStore {
  def exists(p: String): Boolean
  def isDir(p: String): Boolean
  def mkdirs(p: String): Unit
  /** Child NAMES of directory `p` (empty when `p` is missing). */
  def list(p: String): Seq[String]
  /** Throws `java.io.IOException` (incl. not-found) when unreadable. */
  def readString(p: String): String
  /** Replace-if-present write of a small pointer file, atomic where
    * the filesystem allows; callers are best-effort pointers (hint,
    * view, retirement stamps) whose correctness never rests on this. */
  def writeAtomic(p: String, body: String): Unit
  /** THE commit claim: publish `body` at `p` iff `p` does not exist.
    * Returns false when a concurrent claimant won. Readers never
    * observe a partially-written `p`. */
  def createIfAbsent(p: String, body: String): Boolean
  /** Delete a file if present. */
  def delete(p: String): Unit
  def deleteTree(p: String): Unit
  /** Same-filesystem no-replace rename (file or directory). */
  def rename(src: String, dst: String): Unit
  /** Cache identity of file `p`: must change whenever the file is
    * replaced by a different one (delete + recreate included). Throws
    * when missing. */
  def identity(p: String): AnyRef
  /** Last-modified epoch millis of `p`; throws when missing. Used for
    * AGE decisions only (debris sweeping), never correctness. */
  def modifiedMs(p: String): Long
  /** Total data bytes under `p`. */
  def treeBytes(p: String): Long
  /** Clone a directory tree (hard links where the fs supports them,
    * byte copy otherwise). */
  def cloneTree(src: String, dst: String): Unit
}

private[graft] object PosixLogStore extends LogStore {
  private def nio(p: String): java.nio.file.Path = {
    val u = new HPath(p).toUri
    Paths.get(if (u.getScheme == null) p else u.getPath)
  }

  def exists(p: String): Boolean = Files.exists(nio(p))
  def isDir(p: String): Boolean = Files.isDirectory(nio(p))
  def mkdirs(p: String): Unit = { Files.createDirectories(nio(p)); () }

  def list(p: String): Seq[String] =
    if (!Files.isDirectory(nio(p))) Nil
    else {
      val s = Files.list(nio(p))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toVector
      } finally s.close()
    }

  def readString(p: String): String =
    new String(Files.readAllBytes(nio(p)), StandardCharsets.UTF_8)

  def writeAtomic(p: String, body: String): Unit = {
    val target = nio(p)
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".${target.getFileName}-", ".tmp")
    // the temp is deleted on EVERY exit path — a failed move must not
    // leave debris that every later listing has to skip
    try {
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, target,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    } finally { Files.deleteIfExists(tmp); () }
  }

  def createIfAbsent(p: String, body: String): Boolean = {
    val target = nio(p)
    val dir = target.getParent
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".tmp-", "")
    try {
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      try { Files.createLink(target, tmp); true }
      catch {
        case _: FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // no hard links (exotic fs): move-no-replace is the fallback
          try { Files.move(tmp, target); true }
          catch { case _: FileAlreadyExistsException => false }
      }
    } finally { Files.deleteIfExists(tmp); () }
  }

  def delete(p: String): Unit = { Files.deleteIfExists(nio(p)); () }

  def deleteTree(p: String): Unit = {
    val root = nio(p)
    if (Files.exists(root)) {
      val w = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toVector.sortBy(-_.getNameCount)
          .foreach(f => Files.deleteIfExists(f))
      } finally w.close()
    }
  }

  def rename(src: String, dst: String): Unit = { Files.move(nio(src), nio(dst)); () }

  /** size + mtime + `fileKey` (inode identity): a table deleted and
    * recreated at the same path can produce a same-version manifest of
    * identical length in the same millisecond, and only the inode
    * tells those apart. */
  def identity(p: String): AnyRef = {
    val attrs = Files.readAttributes(
      nio(p), classOf[java.nio.file.attribute.BasicFileAttributes])
    (attrs.size, attrs.lastModifiedTime.toMillis, attrs.fileKey)
  }

  def modifiedMs(p: String): Long = Files.getLastModifiedTime(nio(p)).toMillis

  def treeBytes(p: String): Long = {
    val root = nio(p)
    if (!Files.exists(root)) 0L
    else {
      val w = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
      } finally w.close()
    }
  }

  def cloneTree(src: String, dst: String): Unit =
    // normalize BOTH ends: callers hand scheme-qualified `file:` URIs
    // here too (Hadoop Path.toString round-trips), and linkClone walks
    // the source with raw nio
    Staging.linkClone(nio(src).toString, nio(dst))
}

private[graft] object HadoopLogStore extends LogStore {
  private def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fc(p: String): FileContext = {
    val u = new HPath(p).toUri
    if (u.getScheme == null) FileContext.getFileContext(conf)
    else FileContext.getFileContext(u, conf)
  }

  private def fs(p: String): FileSystem = new HPath(p).getFileSystem(conf)

  def exists(p: String): Boolean = fc(p).util().exists(new HPath(p))

  def isDir(p: String): Boolean =
    try fc(p).getFileStatus(new HPath(p)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  def mkdirs(p: String): Unit =
    fc(p).mkdir(new HPath(p), FsPermission.getDirDefault, true)

  def list(p: String): Seq[String] =
    try {
      val it = fc(p).listStatus(new HPath(p))
      val b = Vector.newBuilder[String]
      while (it.hasNext) b += it.next().getPath.getName
      b.result()
    } catch { case _: java.io.FileNotFoundException => Nil }

  def readString(p: String): String = {
    val in = fc(p).open(new HPath(p))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
  }

  private def writeFile(p: HPath, body: String, overwrite: Boolean): Unit = {
    import java.util.EnumSet
    val flags =
      if (overwrite) EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE)
      else EnumSet.of(CreateFlag.CREATE)
    val out = fc(p.toString).create(p, flags,
      Options.CreateOpts.createParent())
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def writeAtomic(p: String, body: String): Unit = {
    val target = new HPath(p)
    val tmp = new HPath(target.getParent,
      s".${target.getName}-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    try {
      writeFile(tmp, body, overwrite = true)
      fc(p).rename(tmp, target, Options.Rename.OVERWRITE)
    } finally {
      try fc(p).delete(tmp, false)
      catch { case _: java.io.IOException => () }
    }
  }

  /** In-JVM claim serialization for filesystems whose no-overwrite
    * rename is check-then-act (the local fs): correct for any number
    * of threads in one JVM — Delta `LocalLogStore`'s contract. On
    * HDFS the NameNode makes the rename itself atomic and the lock is
    * just uncontended overhead. STRIPED (fixed 64 monitors keyed by
    * path hash) rather than per-path: a long-lived JVM claims
    * unboundedly many manifest paths, and a per-path map would be a
    * slow leak; coarser granularity only ever costs contention, never
    * correctness. */
  private val claimLocks = Array.fill(64)(new Object)

  def createIfAbsent(p: String, body: String): Boolean = {
    val target = new HPath(p)
    val tmp = new HPath(target.getParent,
      s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val lock = claimLocks(math.abs(p.hashCode % 64))
    try {
      writeFile(tmp, body, overwrite = false)
      lock.synchronized {
        if (fc(p).util().exists(target)) false
        else
          try { fc(p).rename(tmp, target); true }
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: FileAlreadyExistsException => false
          }
      }
    } finally {
      try fc(p).delete(tmp, false)
      catch { case _: java.io.IOException => () }
    }
  }

  def delete(p: String): Unit =
    try { fc(p).delete(new HPath(p), false); () }
    catch { case _: java.io.FileNotFoundException => () }

  def deleteTree(p: String): Unit =
    try { fc(p).delete(new HPath(p), true); () }
    catch { case _: java.io.FileNotFoundException => () }

  def rename(src: String, dst: String): Unit = {
    // guard: Hadoop rename onto an EXISTING DIRECTORY moves src INTO
    // it (posix mv); the seam's contract is fail-on-existing
    if (exists(dst))
      throw new java.io.IOException(s"rename target exists: $dst")
    fc(src).rename(new HPath(src), new HPath(dst))
  }

  /** len + mtime only — Hadoop surfaces no inode identity. Manifests
    * are immutable, so this is only ever wrong for delete-and-recreate
    * races inside one mtime granule; acceptable for the remote-fs
    * route (the posix route has the inode key). */
  def identity(p: String): AnyRef = {
    val st = fc(p).getFileStatus(new HPath(p))
    (st.getLen, st.getModificationTime)
  }

  def modifiedMs(p: String): Long =
    fc(p).getFileStatus(new HPath(p)).getModificationTime

  /** One namenode RPC on HDFS — no client-side walk at scale. */
  def treeBytes(p: String): Long =
    try fs(p).getContentSummary(new HPath(p)).getLength
    catch { case _: java.io.FileNotFoundException => 0L }

  /** Remote filesystems have no hard links: the projection clone is a
    * real copy here (the honest cost of a name-based-reader view on
    * HDFS; manifest-resolved readers never need it). */
  def cloneTree(src: String, dst: String): Unit = {
    val f = fs(src)
    if (!FileUtil.copy(f, new HPath(src), f, new HPath(dst),
        false, true, conf))
      throw new java.io.IOException(s"copy $src -> $dst failed")
  }
}

/** The external coordination seam an object-store commit log needs —
  * the role DynamoDB plays in Delta's published S3 multi-cluster
  * LogStore: ONE atomic conditional-insert primitive plus lookups.
  * Implementations must make [[putIfAbsent]] linearizable across every
  * concurrent committer they claim to support. */
private[graft] trait CommitCoordinator {
  /** Atomic conditional insert: record key → value iff key is absent.
    * Returns false when another claimant's entry already exists. */
  def putIfAbsent(key: String, value: String): Boolean
  def get(key: String): Option[String]
  /** Every (key, value) whose key starts with `prefix`. */
  def list(prefix: String): Seq[(String, String)]
  /** Atomic conditional update: set key → value iff key is PRESENT,
    * returning whether it was. An unconditional update would let a
    * completer resurrect an entry a concurrent delete just removed
    * (DynamoDB expresses this as a conditional write, same as the
    * insert). */
  def updateIfPresent(key: String, value: String): Boolean
  def remove(key: String): Unit
}

/** In-process coordinator: linearizable for any number of threads in
  * one JVM — the unit-test stand-in for the external service. */
private[graft] final class InMemoryCommitCoordinator extends CommitCoordinator {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def putIfAbsent(key: String, value: String): Boolean =
    m.putIfAbsent(key, value) == null
  def get(key: String): Option[String] = Option(m.get(key))
  def list(prefix: String): Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    m.entrySet().asScala.filter(_.getKey.startsWith(prefix))
      .map(e => (e.getKey, e.getValue)).toVector
  }
  def updateIfPresent(key: String, value: String): Boolean =
    m.computeIfPresent(key, (_, _) => value) != null
  def remove(key: String): Unit = { m.remove(key); () }
}

/** File-backed coordinator: one file per key (name = sha-256 of the
  * key, key stored inside), conditional insert via the posix
  * hard-link claim — linearizable across PROCESSES on one box, the
  * cross-process stand-in for DynamoDB in this sandbox. O(entries)
  * listings are fine at commit-log cardinality. */
private[graft] final class FileCommitCoordinator(root: String) extends CommitCoordinator {
  private def keyFile(key: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    root + "/" + md.digest(key.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
  private def entries: Seq[(String, String)] =
    // skip dot-prefixed names: writeAtomic/createIfAbsent stage their
    // in-flight temps as `.…` files in this same dir, and reading a
    // half-written temp would surface a phantom (key, truncated-value)
    // pair to a concurrent lister; real key files are sha-256 hex
    PosixLogStore.list(root).filterNot(_.startsWith(".")).flatMap { n =>
      try {
        val body = PosixLogStore.readString(s"$root/$n")
        val i = body.indexOf('\n')
        if (i < 0) None else Some((body.substring(0, i), body.substring(i + 1)))
      } catch { case _: java.io.IOException => None }
    }
  def putIfAbsent(key: String, value: String): Boolean =
    PosixLogStore.createIfAbsent(keyFile(key), s"$key\n$value")
  def get(key: String): Option[String] =
    try {
      val body = PosixLogStore.readString(keyFile(key))
      Some(body.substring(body.indexOf('\n') + 1))
    } catch { case _: java.io.IOException => None }
  def list(prefix: String): Seq[(String, String)] =
    entries.filter(_._1.startsWith(prefix))
  def updateIfPresent(key: String, value: String): Boolean =
    // check-then-write: a remove landing inside the gap re-creates the
    // entry — a narrower stand-in for DynamoDB's genuinely atomic
    // conditional write, same honesty class as HadoopLogStore's
    // in-JVM-only local-fs atomicity (both documented, neither is the
    // production route)
    if (!PosixLogStore.exists(keyFile(key))) false
    else { PosixLogStore.writeAtomic(keyFile(key), s"$key\n$value"); true }
  def remove(key: String): Unit = PosixLogStore.delete(keyFile(key))
}

/** Simulated S3-class object store: atomic whole-object overwrite PUT,
  * GET, LIST, DELETE — and NOTHING else. [[createIfAbsent]] throws
  * (S3 has no atomic create-if-absent; that is the entire reason
  * [[ExternalLogStore]] exists), and [[rename]] is what an object
  * store's "rename" actually is: copy then delete, NOT atomic. Local-
  * fs-backed so the object-store route is exercisable in tests; using
  * posix primitives internally to IMPLEMENT an atomic PUT is fair —
  * S3 gives that guarantee natively. */
private[graft] object ObjectStoreSim extends LogStore {
  def exists(p: String): Boolean = PosixLogStore.exists(p)
  def isDir(p: String): Boolean = PosixLogStore.isDir(p)
  def mkdirs(p: String): Unit = PosixLogStore.mkdirs(p)
  def list(p: String): Seq[String] = PosixLogStore.list(p)
  def readString(p: String): String = PosixLogStore.readString(p)
  def writeAtomic(p: String, body: String): Unit =
    PosixLogStore.writeAtomic(p, body)
  def createIfAbsent(p: String, body: String): Boolean =
    throw new UnsupportedOperationException(
      "object store has no atomic create-if-absent — commit through " +
      "ExternalLogStore's coordinator claim")
  def delete(p: String): Unit = PosixLogStore.delete(p)
  def deleteTree(p: String): Unit = PosixLogStore.deleteTree(p)
  def rename(src: String, dst: String): Unit = {
    // copy-then-delete, the only "rename" an object store has. Safe
    // for the data path (generation dirs become visible only via the
    // manifest commit); never used for the commit claim.
    if (exists(dst))
      throw new java.io.IOException(s"rename target exists: $dst")
    val from = Paths.get(new HPath(src).toUri.getPath match {
      case null => src; case q => q })
    val to = Paths.get(new HPath(dst).toUri.getPath match {
      case null => dst; case q => q })
    if (Files.isDirectory(from)) {
      val w = Files.walk(from)
      try {
        import scala.jdk.CollectionConverters._
        w.iterator().asScala.toVector.foreach { f =>
          val t = to.resolve(from.relativize(f).toString)
          if (Files.isDirectory(f)) Files.createDirectories(t)
          else {
            Files.createDirectories(t.getParent)
            Files.copy(f, t, StandardCopyOption.REPLACE_EXISTING)
          }
        }
      } finally w.close()
    } else {
      Files.createDirectories(to.getParent)
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING)
    }
    PosixLogStore.deleteTree(src)
  }
  def identity(p: String): AnyRef = PosixLogStore.identity(p)
  def modifiedMs(p: String): Long = PosixLogStore.modifiedMs(p)
  def treeBytes(p: String): Long = PosixLogStore.treeBytes(p)
  /** Object stores have no hard links — a clone is a real copy. */
  def cloneTree(src: String, dst: String): Unit = {
    val from = Paths.get(new HPath(src).toUri.getPath match {
      case null => src; case q => q })
    val to = Paths.get(new HPath(dst).toUri.getPath match {
      case null => dst; case q => q })
    val w = Files.walk(from)
    try {
      import scala.jdk.CollectionConverters._
      w.iterator().asScala.toVector.foreach { f =>
        val t = to.resolve(from.relativize(f).toString)
        if (Files.isDirectory(f)) Files.createDirectories(t)
        else {
          Files.createDirectories(t.getParent)
          Files.copy(f, t, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    } finally w.close()
  }
}

/** Delta's published external-LogStore pattern (the
  * `BaseExternalLogStore`/`S3DynamoDBLogStore` recipe) over a raw
  * object store: the commit claim is a conditional put into the
  * [[CommitCoordinator]], and the object store is only ever asked for
  * atomic overwrite PUTs.
  *
  * Commit protocol for [[createIfAbsent]]:
  *  1. PUT the body at a temp object next to the target.
  *  2. Conditional-insert (target → pending:temp) into the
  *     coordinator. THIS is the commit point: exactly one of N
  *     concurrent claimants wins, losers delete their temp and report
  *     a lost race.
  *  3. PUT the body at the target, mark the entry complete, delete
  *     the temp.
  * A crash between 2 and 3 leaves a committed-but-unmaterialized
  * version; every read-side operation first COMPLETES any pending
  * entry it touches (copy temp → target, mark complete), so the
  * committed version is never lost and never invisible — the
  * listing-consistency rule of Delta's S3 recipe. Entries live as
  * long as their target (removed on manifest delete/vacuum); a real
  * DynamoDB deployment would add TTL expiry for completed entries. */
private[graft] object ExternalLogStore {
  /** Age past which an unreferenced `.commit-tmp-` object is debris a
    * listing may sweep — generous against clock skew and slow PUTs. */
  private[graft] val TmpTtlMs: Long = 15L * 60 * 1000
  /** Age past which a COMPLETED coordinator entry expires (the
    * documented DynamoDB-TTL analogue): once the target object is
    * durably materialized, the entry's only job is done, and without
    * expiry coordinator state grows with log LIFETIME instead of
    * in-flight commits. Safety rests on two facts: (a) recovery only
    * ever acts on `pending:` entries, so an expired completed entry
    * can never resurrect anything (vacuumed versions included), and
    * (b) [[ExternalLogStore.createIfAbsent]] probes the base store
    * for the target before claiming, so create-if-absent semantics
    * survive the entry's absence. Generous against clock skew; a
    * real DynamoDB deployment sets this as the item TTL. */
  private[graft] val CompleteTtlMs: Long = 15L * 60 * 1000
}

private[graft] final class ExternalLogStore(
    base: LogStore, coord: CommitCoordinator,
    completeTtlMs: Long = ExternalLogStore.CompleteTtlMs) extends LogStore {
  private val Complete = "complete"
  private val TmpPrefix = ".commit-tmp-"

  private def isPending(v: String): Boolean = v.startsWith("pending:")
  /** Completion stamps carry their wall time so listings can expire
    * them; the legacy bare `complete` (no timestamp) parses as
    * inexpirable — never swept, only ever a pre-TTL artifact. */
  private def completeStamp(): String =
    s"$Complete:${System.currentTimeMillis()}"
  private def completedAtOf(v: String): Option[Long] =
    if (isPending(v)) None
    else v.split(':') match {
      case Array(_, ts) => ts.toLongOption
      case _ => None
    }

  private def parentOf(p: String): String = {
    val i = p.lastIndexOf('/')
    require(i > 0, s"no parent: $p")
    p.substring(0, i)
  }
  private def nameOf(p: String): String = p.substring(p.lastIndexOf('/') + 1)

  /** Complete a claimed-but-unmaterialized commit in place. Any
    * number of readers may race each other (and the original
    * committer) here: a concurrent completer can materialize the
    * target and retire the temp BETWEEN this reader's existence
    * checks, so a missing temp is re-checked against the coordinator
    * and target before being declared corruption — only a
    * still-pending claim with BOTH objects absent is a real loss. */
  private def recoverEntry(p: String): Unit = {
    val v0 = coord.get(p)
    if (v0.exists(isPending)) {
      val tmp = v0.get.stripPrefix("pending:")
      var concurrentlyRemoved = false
      if (!base.exists(p)) {
        val body =
          try { if (base.exists(tmp)) Some(base.readString(tmp)) else None }
          catch { case _: java.io.IOException => None } // temp retired mid-read
        body match {
          case Some(b) => base.writeAtomic(p, b)
          case None =>
            val now = coord.get(p)
            if (now.exists(isPending) && !base.exists(p))
              throw new java.io.IOException(
                s"commit $p claimed but neither target nor temp $tmp exists")
            // a concurrent delete() may have removed the entry outright;
            // re-marking it Complete would resurrect a deleted version
            concurrentlyRemoved = now.isEmpty
        }
      }
      if (!concurrentlyRemoved && !coord.updateIfPresent(p, completeStamp())) {
        // the entry vanished between our pending read and the
        // completion mark — a concurrent delete() of this version.
        // delete() removes the target BEFORE the entry, so any target
        // object present now is OUR rematerialization from the temp;
        // leaving it would resurrect the deleted version as a live
        // object in the base listing.
        if (base.exists(p)) base.delete(p)
      }
      if (base.exists(tmp)) base.delete(tmp)
    }
  }

  /** Steps 1–2 only — the "crashed after the commit point" state, for
    * crash-window tests. Returns whether the claim won. */
  private[graft] def claimOnly(p: String, body: String): Boolean = {
    val tmp = s"${parentOf(p)}/$TmpPrefix${java.util.UUID.randomUUID().toString.take(8)}"
    base.writeAtomic(tmp, body)
    if (coord.putIfAbsent(p, s"pending:$tmp")) true
    else { base.delete(tmp); false }
  }

  /** Winner-path completion: unlike [[recoverEntry]] (which only knows
    * the temp path), the winner still holds the BODY in memory — so a
    * temp that vanished between the claim and this step (a concurrent
    * listing TTL-sweeping it during a long stall) is rematerialized
    * directly instead of surfacing as a poisoned committed version
    * every later reader throws on. The concurrent-delete guard mirrors
    * recoverEntry's: if the entry vanished before the completion mark,
    * a delete() of this version raced us — remove the target we just
    * wrote rather than resurrect the deleted version. */
  private def completeAsWinner(p: String, body: String): Unit = {
    val tmp = coord.get(p) match {
      case Some(v) if isPending(v) => Some(v.stripPrefix("pending:"))
      case _ => None
    }
    if (!base.exists(p)) base.writeAtomic(p, body)
    if (!coord.updateIfPresent(p, completeStamp())) {
      if (base.exists(p)) base.delete(p)
    }
    tmp.filter(base.exists).foreach(base.delete)
  }

  def createIfAbsent(p: String, body: String): Boolean =
    // probe the base store FIRST: a completed entry may have TTL-expired
    // from the coordinator while its target object lives on — claiming
    // then would "win" and overwrite a committed version. (recoverEntry
    // inside exists() also completes any pending claim in passing, so
    // the probe sees claimed-but-unmaterialized commits too.)
    if (exists(p)) false
    else if (claimOnly(p, body)) {
      // we won: materialize the target and retire the temp, from the
      // in-memory body (the temp is only the durability bridge between
      // the PUT and the claim — the coordinator never references a
      // body that isn't durably stored somewhere).
      completeAsWinner(p, body)
      true
    } else {
      // lost the race — make sure the winner's version is visible
      // before reporting it (the winner may have crashed mid-publish)
      recoverEntry(p)
      false
    }

  def exists(p: String): Boolean = { recoverEntry(p); base.exists(p) }
  def isDir(p: String): Boolean = base.isDir(p)
  def mkdirs(p: String): Unit = base.mkdirs(p)

  /** Listing = object-store listing ∪ coordinator entries under the
    * directory (completed in passing) — an object-store LIST alone may
    * miss a claimed-but-unmaterialized commit. Listings also sweep
    * temp DEBRIS: a writer that crashed between its temp PUT and the
    * coordinator claim strands a `.commit-tmp-` object nothing
    * references; any such object older than [[ExternalLogStore.TmpTtlMs]]
    * and not named by a pending entry is deleted (Delta's TTL rule —
    * the age bound is what keeps an in-flight writer's seconds-old
    * temp safe from a concurrent lister). */
  def list(p: String): Seq[String] = {
    val pend = coord.list(p + "/")
      .filter { case (k, _) => !nameOf(k).isEmpty && parentOf(k) == p }
    pend.foreach { case (k, _) => recoverEntry(k) }
    // expire COMPLETED entries past the TTL (the DynamoDB-TTL
    // analogue): their target is durably materialized, recovery never
    // acts on non-pending entries, and createIfAbsent probes the base
    // store before claiming — so expiry bounds coordinator state at
    // O(in-flight commits) without any correctness surface. Only
    // entries whose stamp carries a parseable time age out.
    pend.foreach { case (k, v) =>
      completedAtOf(v).foreach { ts =>
        if (System.currentTimeMillis() - ts > completeTtlMs) coord.remove(k)
      }
    }
    val names = base.list(p)
    val referenced = pend.map(_._2).collect {
      case v if isPending(v) => nameOf(v.stripPrefix("pending:"))
    }.toSet
    names.filter(_.startsWith(TmpPrefix))
      .filterNot(referenced)
      .foreach { n =>
        val f = s"$p/$n"
        try {
          if (System.currentTimeMillis() - base.modifiedMs(f) >
              ExternalLogStore.TmpTtlMs)
            base.delete(f)
        } catch { case _: java.io.IOException => () }
      }
    (names.filterNot(_.startsWith(TmpPrefix)) ++
      pend.map { case (k, _) => nameOf(k) }).distinct
  }

  def readString(p: String): String = { recoverEntry(p); base.readString(p) }
  def writeAtomic(p: String, body: String): Unit = base.writeAtomic(p, body)
  def delete(p: String): Unit = { base.delete(p); coord.remove(p) }
  def deleteTree(p: String): Unit = {
    base.deleteTree(p)
    coord.list(p + "/").foreach { case (k, _) => coord.remove(k) }
    coord.remove(p)
  }
  def rename(src: String, dst: String): Unit = base.rename(src, dst)
  def identity(p: String): AnyRef = { recoverEntry(p); base.identity(p) }
  def modifiedMs(p: String): Long = { recoverEntry(p); base.modifiedMs(p) }
  def treeBytes(p: String): Long = base.treeBytes(p)
  def cloneTree(src: String, dst: String): Unit = base.cloneTree(src, dst)
}
