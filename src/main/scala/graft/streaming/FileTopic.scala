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
