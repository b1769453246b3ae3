package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import org.apache.spark.sql.DataFrame

/** Disk-staged materialized intermediates — the "pipeline stages a
  * table once, every downstream job reads it" contract a real warehouse
  * runs on. Composition queries (x36/x43/x65 over x28's cluster
  * labels) are narrow aggregations over an ALREADY-BUILT intermediate
  * at 100 TB; without a staging story each standalone invocation
  * re-paid the full upstream pipeline (shingle → minhash → band join →
  * label propagation) from scratch. `ensure` gives them the production
  * shape: first consumer builds and atomically publishes the parquet,
  * every later consumer — across queries AND across JVMs — pays one
  * scan.
  *
  * Staleness safety: the stage key embeds a fingerprint of the source
  * table's file metadata (relative path, length, mtime of every data
  * file), so a regenerated dataset at the same path gets a fresh stage
  * instead of silently serving stale labels. Publication is
  * write-to-temp + atomic rename; a concurrent builder that loses the
  * race discards its copy and reads the winner's.
  */
object Staging {
  private def root: Path = Paths.get(
    sys.env.getOrElse("GRAFT_STAGE_DIR",
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-stage"))

  /** Metadata fingerprint (no data read) of the given source tables. */
  private def fingerprint(dir: String, tables: Seq[String]): String = {
    val md = MessageDigest.getInstance("MD5")
    tables.sorted.foreach { t =>
      val p = Paths.get(dir, s"$t.parquet")
      val files: Seq[Path] =
        if (Files.isDirectory(p)) {
          val s = Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.filter(Files.isRegularFile(_)).toVector
              .sortBy(_.toString)
          } finally s.close()
        } else if (Files.exists(p)) Seq(p)
        else Seq.empty
      files.foreach { f =>
        md.update(
          s"${p.relativize(f.toAbsolutePath.normalize())}|${Files.size(f)}|${Files.getLastModifiedTime(f).toMillis}\n"
            .getBytes("UTF-8"))
      }
    }
    md.digest().map("%02x".format(_)).mkString.take(16)
  }

  /** Return the staged parquet path for (`name`, `dir`), building it
    * via `build` exactly once per dataset version. */
  def ensure(name: String, dir: String, sourceTables: Seq[String])
            (build: => DataFrame): String =
    ensurePath(name, dir, sourceTables)(p =>
      build.write.mode("overwrite").parquet(p.toString))

  private val Marker = "_GRAFT_STAGED"

  /** Generalized form: `build` materializes an arbitrary directory
    * (e.g. a DimStore bucketed layout) at the path it is handed; the
    * directory is then atomically published under the fingerprinted
    * stage key. In-JVM callers serialize on the monitor; cross-JVM
    * losers of the rename race fall back to the published copy. */
  def ensurePath(name: String, dir: String, sourceTables: Seq[String])
                (build: java.nio.file.Path => Unit): String = synchronized {
    val key = s"$name-${fingerprint(dir, sourceTables)}"
    val target = root.resolve(key)
    if (!Files.exists(target.resolve(Marker))) {
      Files.createDirectories(root)
      val tmp = Files.createTempDirectory(root, s".$key-build-")
      // build INTO the temp dir then move the result up: writers
      // (Spark among them) need a non-existent target
      val stage = tmp.resolve("data")
      build(stage)
      // the marker travels INSIDE the dir, so its presence at the
      // final path implies a complete, atomically-published build; its
      // CONTENT records which source dir this version came from, so
      // retirement can distinguish "predecessor of the same dataset"
      // from "same-named stage of a different dataset" (sf0.001/0.01/
      // 0.1 and test fixtures all stage under the same names)
      Files.writeString(stage.resolve(Marker), dir)
      try Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // rename onto an existing dir surfaces as FileAlreadyExists /
        // DirectoryNotEmpty depending on the fs — usually another
        // process published first (use theirs). But an existing dir
        // WITHOUT the marker is debris, not a publication — clear it
        // and retry once rather than serve a broken stage
        case _: java.nio.file.FileSystemException =>
          if (!Files.exists(target.resolve(Marker))) {
            val t = Files.walk(target)
            try {
              import scala.jdk.CollectionConverters._
              t.iterator().asScala.toVector.sortBy(-_.getNameCount)
                .foreach(f => Files.deleteIfExists(f))
            } finally t.close()
            Files.move(stage, target, StandardCopyOption.ATOMIC_MOVE)
          }
      }
      // best-effort cleanup of the (now empty or superseded) temp dir
      try {
        val s = Files.walk(tmp)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toVector.sortBy(-_.getNameCount)
            .foreach(f => Files.deleteIfExists(f))
        } finally s.close()
      } catch { case _: java.io.IOException => () }
      // retire STALE versions of this stage — same name, SAME source
      // dir (per the marker), different fingerprint: a regenerated
      // dataset leaves its predecessor's stage unreachable (every
      // future lookup keys on the new fingerprint), so retiring it is
      // safe within this lifecycle (readers hold the current
      // fingerprint for their whole session; a production deployment
      // would add a grace window) and stops the stage root growing one
      // dead copy per regeneration. Same-named stages of OTHER
      // datasets (the other scale factors, test fixtures) are live and
      // untouched.
      try {
        val siblings = Files.list(root)
        try {
          import scala.jdk.CollectionConverters._
          siblings.iterator().asScala.toVector
            .filter { d =>
              val b = d.getFileName.toString
              b.startsWith(s"$name-") && b != key &&
                // same "name-<16 hex>" shape only: never touch a
                // different stage whose name merely shares a prefix
                b.length == name.length + 17 &&
                Files.isDirectory(d) &&
                (try Files.readString(d.resolve(Marker)) == dir
                 catch { case _: java.io.IOException => false })
            }
            .foreach { d =>
              val w = Files.walk(d)
              try w.iterator().asScala.toVector.sortBy(-_.getNameCount)
                .foreach(f => Files.deleteIfExists(f))
              finally w.close()
            }
        } finally siblings.close()
      } catch { case _: java.io.IOException => () }
    }
    target.toString
  }

  /** Hardlink-clone a staged directory into `dest` — O(file count),
    * zero data copied. The use case: a probe that needs to MUTATE a
    * staged table (w18's merge probe) clones it first; staged parquet
    * files are immutable (mutation replaces whole bucket dirs, so
    * shared inodes are never written through). */
  def linkClone(src: String, dest: java.nio.file.Path): Unit = {
    val srcP = Paths.get(src)
    val s = Files.walk(srcP)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.foreach { f =>
        val rel = srcP.relativize(f)
        val to = dest.resolve(rel.toString)
        if (Files.isDirectory(f)) Files.createDirectories(to)
        else {
          Files.createDirectories(to.getParent)
          // cross-device / no-hardlink fs: degrade to a real copy
          try Files.createLink(to, f)
          catch {
            case _: UnsupportedOperationException | _: java.io.IOException =>
              Files.copy(f, to, StandardCopyOption.REPLACE_EXISTING)
          }
        }
      }
    } finally s.close()
  }
}
