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
  def publishStaged(dir: String): Int = {
    val d = Paths.get(dir)
    import scala.jdk.CollectionConverters._
    val s = Files.list(d)
    val staged = try s.iterator().asScala.map(p => p.getFileName.toString -> p)
      .filter(_._1.matches("""\.seg-p\d{5}-[0-9a-f-]+\.stage"""))
      .toVector.sortBy(_._1) finally s.close()
    val byPart = staged.groupBy(_._1.take(11)).toSeq.sortBy(_._1) // ".seg-pNNNNN"
    val base = System.currentTimeMillis() - byPart.size * 1000L - 60000L
    byPart.zipWithIndex.foreach { case ((_, copies), i) =>
      val keep = copies.head._2
      copies.tail.foreach { case (_, p) => Files.deleteIfExists(p) }
      val name = keep.getFileName.toString.stripPrefix(".").stripSuffix(".stage") + ".txt"
      Files.setLastModifiedTime(keep,
        java.nio.file.attribute.FileTime.fromMillis(base + i * 1000L))
      Files.move(keep, d.resolve(name), StandardCopyOption.ATOMIC_MOVE)
    }
    byPart.size
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
