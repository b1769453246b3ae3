package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A file-backed topic: the in-container stand-in for the Kafka
  * transport (S1/K1), faithful to its delivery contract so the
  * exactly-once-EFFECTS claim (K2) is testable without a broker.
  *
  * The reference's producer (utils/MyKafkaUtil.java:52-87) configures
  * retries WITHOUT enable.idempotence, and its consumers commit after
  * processing — both ends are at-least-once: a lost ack means the same
  * records land in the log twice, and a crash between processing and
  * commit means redelivery. This transport reproduces exactly that:
  *
  *  - `produce` appends one immutable segment file per call; the caller
  *    retrying an unacked publish writes the SAME records into a NEW
  *    segment — duplication is the contract, never loss.
  *  - `stream` tails the directory as a Structured Streaming file
  *    source; Spark's checkpoint replays unfinished micro-batches on
  *    restart — consumer-side redelivery.
  *
  * Exactly-once is therefore the SINK's job, same as production: an
  * idempotent keyed merge (DimStore's LWW upsert) or a batchId-keyed
  * overwrite. StreamingTransportSpec drives duplicate publishes AND a
  * mid-stream restart through this transport into DimStore and asserts
  * single-copy effects.
  */
object FileTopic {

  /** Publish one segment of records (at-least-once: retried calls
    * append duplicates, matching a producer resend after a lost ack).
    * The segment is written to a hidden temp name and atomically
    * renamed, so a concurrent streaming consumer never lists a
    * half-written file. Returns the segment file name. */
  def produce(dir: String, records: Seq[String]): String = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val name = s"seg-${java.util.UUID.randomUUID}.txt"
    // dot-prefix: Spark's file source ignores hidden files, so the
    // not-yet-renamed temp is invisible to a concurrent consumer
    val tmp = d.resolve(s".$name.tmp")
    Files.write(tmp, records.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, d.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    name
  }

  /** Executor-side half of a DISTRIBUTED produce: write one staged
    * (hidden, consumer-invisible) segment carrying the producing
    * partition's index, streaming the iterator straight to disk — no
    * driver materialization, no partition-sized buffer. Task retries
    * leave extra staged copies of the same partition;
    * [[publishStaged]] dedupes them, so the visible log gets exactly
    * one segment per partition while the transport's at-least-once
    * contract is untouched. */
  def produceStaged(dir: String, part: Int, records: Iterator[String]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    // write-to-temp + atomic rename, same dance as produce(): a task
    // attempt killed mid-write must leave debris that publishStaged's
    // regex NEVER matches — otherwise the dedup could keep a truncated
    // attempt and delete the complete retry, silently losing events
    val name = f".seg-p$part%05d-${java.util.UUID.randomUUID}.stage"
    val tmp = d.resolve(s"$name.tmp")
    val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try {
      var first = true
      records.foreach { r =>
        if (!first) w.write("\n")
        w.write(r); first = false
      }
    } finally w.close()
    Files.move(tmp, d.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Driver-side half: publish every staged segment, in partition
    * order, as a visible segment whose modification time is strictly
    * ascending — Spark's file source replays files in mod-time order,
    * so a range-partitioned-by-event-time write drains in event-time
    * order, the same catching-up-consumer shape the sequential
    * producer gave. O(#segments) metadata ops on the driver; the data
    * bytes never pass through it. Returns segments published. */
  private val StagedSeg = """\.seg-p(\d+)-[0-9a-f-]+\.stage""".r

  def publishStaged(dir: String): Int = {
    val d = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    val s = Files.list(d)
    // partition index via regex capture, grouped and ordered
    // NUMERICALLY: produceStaged zero-pads to 5 digits, but the
    // f-interpolator WIDENS past 99999 — a fixed-width prefix key
    // would silently mis-group and lexically mis-order those
    val staged = try s.iterator().asScala.map(p => p.getFileName.toString -> p)
      .collect { case (n @ StagedSeg(part), p) => (part.toInt, n, p) }
      .toVector finally s.close()
    val byPart = staged.groupBy(_._1).toSeq.sortBy(_._1)
    val base = System.currentTimeMillis() - byPart.size * 1000L - 60000L
    byPart.zipWithIndex.foreach { case ((_, copies0), i) =>
      // deterministic keep among retry copies: lowest name
      val copies = copies0.sortBy(_._2)
      val keep = copies.head._3
      copies.tail.foreach { case (_, _, p) => Files.deleteIfExists(p) }
      val name = keep.getFileName.toString.stripPrefix(".").stripSuffix(".stage") + ".txt"
      Files.setLastModifiedTime(keep,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
      Files.move(keep, d.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    }
    byPart.size
  }

  // -------------------------------------------------------------------
  // cross-sink atomic publish: N topics see micro-batch B entirely or
  // not at all. The commit point is a per-batch marker file (atomic
  // create-if-absent, the same primitive as DimStore's manifest claim);
  // staged segments are invisible until the marker exists, and the
  // post-marker visibility flips are deterministic + idempotent, so a
  // crash anywhere is healed by the next publish (or an explicit
  // recover) — Delta's commit-then-finish-visibility shape applied to
  // the reference's 5-way side-output fan-out (BaseLogApp writes five
  // Kafka topics; a crash between its producer sends exposes batch N
  // in some topics and N−1 in others — this closes that hole).
  //
  // Real-broker mapping: on Kafka the same all-five-or-none contract
  // is the transactional producer — one transaction spanning the five
  // topics' sends, read_committed consumers seeing it atomically
  // (public Kafka EOS semantics). The staged-segments + marker
  // protocol is that transaction's file analogue: staging = sends
  // inside the txn, the marker = the commit record, flips+recovery =
  // the LSO advancing past the commit.

  /** Executor-side: stage one hidden segment for (`batchId`,
    * `part`) in `dir`. Same streamed write-to-temp + atomic-rename
    * dance as [[produceStaged]]; task retries leave extra copies that
    * [[publishBatch]] dedupes deterministically. */
  def produceStagedBatch(dir: String, batchId: Long, part: Int,
                         records: Iterator[String]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val name =
      f".b$batchId%020d-p$part%05d-${java.util.UUID.randomUUID}.stage"
    val tmp = d.resolve(s"$name.tmp")
    val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try {
      var first = true
      records.foreach { r =>
        if (!first) w.write("\n")
        w.write(r); first = false
      }
    } finally w.close()
    Files.move(tmp, d.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  private def batchStagedRe(batchId: Long) =
    ("""\.b""" + f"$batchId%020d" + """-p(\d+)-[0-9a-f-]+\.stage""").r

  /** Flip batch `batchId`'s staged segments in `dir` to visible.
    * Deterministic and idempotent: the visible name is a pure function
    * of (batch, partition), so a replayed flip sees the target exists
    * and just discards its staged duplicates — exactly-once visible
    * segments from at-least-once staging. */
  private[graft] def flipBatch(dir: String, batchId: Long): Int = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return 0
    val Re = batchStagedRe(batchId)
    import scala.jdk.CollectionConverters._
    val s = Files.list(d)
    val staged = try s.iterator().asScala.map(p => p.getFileName.toString -> p)
      .collect { case (n @ Re(part), p) => (part.toInt, n, p) }
      .toVector finally s.close()
    var flipped = 0
    staged.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (part, copies0) =>
      val visible = d.resolve(f"b$batchId%020d-p$part%05d.txt")
      if (Files.exists(visible)) copies0.foreach(c => Files.deleteIfExists(c._3))
      else {
        val copies = copies0.sortBy(_._2)
        copies.tail.foreach(c => Files.deleteIfExists(c._3))
        Files.move(copies.head._3, visible, StandardCopyOption.ATOMIC_MOVE)
        flipped += 1
      }
    }
    flipped
  }

  private def markers(manifestDir: java.nio.file.Path): Seq[Long] =
    if (!Files.isDirectory(manifestDir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(manifestDir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("b") && n.endsWith(".commit") =>
          n.stripPrefix("b").stripSuffix(".commit").toLong }
        .toVector.sorted
      finally s.close()
    }

  private def newestMarker(manifestDir: java.nio.file.Path): Option[Long] =
    markers(manifestDir).lastOption

  /** How many batch markers the manifest dir retains. Markers exist to
    * (a) make a batch's commit detectable and (b) heal its flips after
    * a crash — and since batch N's flips complete before batch N+1's
    * marker is ever written, only the NEWEST marker can need healing;
    * everything older is pure history. Pruning bounds the manifest
    * dir's metadata at O(retention) instead of O(stream lifetime) —
    * a month-long micro-batch stream must not accrete millions of
    * marker files that every listing pays for. A replayed batch older
    * than the horizon (impossible under Spark's checkpoint contract,
    * which replays at most the last uncommitted batch) would merely
    * re-create its marker and re-flip idempotently — deterministic
    * visible names make convergence order-free. */
  val MarkerRetention = 100

  private def pruneMarkers(manifestDir: java.nio.file.Path): Unit =
    markers(manifestDir).dropRight(MarkerRetention).foreach { b =>
      Files.deleteIfExists(manifestDir.resolve(f"b$b%020d.commit")); ()
    }

  /** Driver-side commit of micro-batch `batchId` across `dirs`.
    * Protocol: (1) finish any pending flips of the NEWEST existing
    * marker — a crash can only leave the most recent committed batch
    * partially flipped, and closing it here means batch N's visibility
    * completes before batch N+1's ever begins; (2) claim the batch
    * marker by atomic create-if-absent; (3) flip this batch in every
    * dir. Crash anywhere: before the marker, nothing is visible in ANY
    * topic and the replayed batch re-stages + dedupes; after the
    * marker, the next publish (or [[recoverBatches]]) completes the
    * flips — readers never see a batch that lacks its marker, and a
    * marked batch becomes fully visible before any later batch.
    * Returns true when this call claimed the marker (false: replay of
    * an already-committed batch — effects already in place). */
  def publishBatch(manifestDir: String, batchId: Long,
                   dirs: Seq[String]): Boolean = {
    val md = Paths.get(manifestDir)
    Files.createDirectories(md)
    newestMarker(md).foreach(b => dirs.foreach(flipBatch(_, b)))
    val marker = md.resolve(f"b$batchId%020d.commit")
    val already = Files.exists(marker)
    if (!already) {
      val tmp = Files.createTempFile(md, ".commit-", "")
      try {
        Files.write(tmp, dirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
        try Files.createLink(marker, tmp)
        catch {
          case _: java.nio.file.FileAlreadyExistsException => ()
          case _: UnsupportedOperationException =>
            try Files.move(tmp, marker)
            catch { case _: java.nio.file.FileAlreadyExistsException => () }
        }
      } finally { Files.deleteIfExists(tmp); () }
    }
    dirs.foreach(flipBatch(_, batchId))
    pruneMarkers(md)
    !already
  }

  /** Standalone recovery: finish the flips of every marked batch (a
    * restart path that wants the topics consistent before any new
    * publish). Idempotent. */
  def recoverBatches(manifestDir: String, dirs: Seq[String]): Unit = {
    val md = Paths.get(manifestDir)
    if (!Files.isDirectory(md)) return
    import scala.jdk.CollectionConverters._
    val s = Files.list(md)
    val batches = try s.iterator().asScala.map(_.getFileName.toString)
      .collect { case n if n.startsWith("b") && n.endsWith(".commit") =>
        n.stripPrefix("b").stripSuffix(".commit").toLong }
      .toVector.sorted
    finally s.close()
    batches.foreach(b => dirs.foreach(flipBatch(_, b)))
  }

  /** Consume the topic as an unbounded stream of raw string records
    * (the shape Sources.kafkaStringStream yields from a real broker).
    * `maxFilesPerTrigger` bounds each micro-batch to that many
    * segments — the file-source analogue of Kafka's maxOffsetsPerTrigger,
    * which is what gives a drained topic a realistic multi-batch replay
    * (StreamBench uses it to measure per-micro-batch latency). */
  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val r = spark.readStream.schema("value STRING")
    maxFilesPerTrigger.foreach(n => r.option("maxFilesPerTrigger", n))
    r.text(dir)
  }

  /** Batch replay of the full log from offset zero (the backfill path,
    * Sources.kafkaStringBatch's analogue). */
  def replay(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema("value STRING").text(dir)
}
