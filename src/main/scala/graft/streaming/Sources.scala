package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1, §2.7).
  *
  * S1/K1/K2 are the Kafka endpoints; they are thin declarative wrappers
  * because Structured Streaming's Kafka connector IS the idiomatic
  * implementation — there is nothing engine-side to add. This container
  * ships no kafka connector jar (zero egress), so these compile but are
  * exercised in production deployments only; tests use the file and
  * memory sources below, which share every downstream operator.
  */
object Sources {

  /** The source provider name the Kafka path resolves against. */
  val KafkaFormat = "kafka"

  /** The value-decode projection applied over the Kafka wire schema:
    * binary `value` → nullable string (tombstones survive as SQL NULL —
    * the behavior the reference needed a custom deserializer for,
    * MyKafkaUtil.java:26-35). Pinned by SourcesPlanSpec against the
    * documented wire schema, jar or no jar. */
  val KafkaValueProjection = "CAST(value AS STRING) AS value"

  /** One Kafka endpoint declaration, exposed as plain data so the
    * option wiring is testable in this connector-less container
    * (SourcesPlanSpec) and auditable before a real cluster sees it. */
  final case class KafkaSpec(bootstrap: String, topic: String,
                             groupId: Option[String] = None) {
    def sourceOptions: Map[String, String] =
      Map("kafka.bootstrap.servers" -> bootstrap, "subscribe" -> topic) ++
        groupId.map("kafka.group.id" -> _)
    def sinkOptions(checkpoint: String): Map[String, String] =
      Map("kafka.bootstrap.servers" -> bootstrap, "topic" -> topic,
        "checkpointLocation" -> checkpoint)
  }

  /** S1 — Kafka topic as a stream of nullable strings
    * (utils/MyKafkaUtil.java:20-51). */
  def kafkaStringStream(spark: SparkSession, bootstrap: String,
                        topic: String, groupId: String): DataFrame =
    spark.readStream.format(KafkaFormat)
      .options(KafkaSpec(bootstrap, topic, Some(groupId)).sourceOptions)
      .load()
      .selectExpr(KafkaValueProjection)

  /** S1 batch flavor for replay/backfill. */
  def kafkaStringBatch(spark: SparkSession, bootstrap: String,
                       topic: String): DataFrame =
    spark.read.format(KafkaFormat)
      .options(KafkaSpec(bootstrap, topic).sourceOptions)
      .load()
      .selectExpr(KafkaValueProjection)

  /** S3-analog — newline-JSON files as a stream (the test/replay
    * source; schema-on-read like the reference's JSON.parseObject). */
  def jsonFileStream(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** P1/P2 — parse raw JSON strings against a schema; callers split on
    * `parsed` nullness for the clean/dirty fork (from_json yields null
    * on malformed input — the side-output analogue). */
  def parseJson(raw: DataFrame, schema: StructType,
                rawCol: String = "value"): DataFrame =
    raw.withColumn("parsed", from_json(col(rawCol), schema))

  /** K1 — at-least-once Kafka sink (MyKafkaUtil.java:52-54). K2's
    * exactly-once variant does not exist in Structured Streaming's
    * Kafka sink; end-to-end exactly-once needs an idempotent or
    * transactional consumer, or a Delta sink (exactly-once per
    * micro-batch) — documented semantic difference (SURVEY §2.7). */
  def kafkaSink[T](ds: DataStreamWriter[T], bootstrap: String,
                   topic: String, checkpoint: String): DataStreamWriter[T] =
    ds.format(KafkaFormat)
      .options(KafkaSpec(bootstrap, topic).sinkOptions(checkpoint))

  /** K5 — console/debug sink. */
  def consoleSink[T](ds: DataStreamWriter[T]): DataStreamWriter[T] =
    ds.format("console")
}
