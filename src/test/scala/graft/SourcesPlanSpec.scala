package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.streaming.Sources

/** S1/K1 plan-level contract. The Kafka connector jar is absent in this
  * container (zero egress), so no test can EXECUTE a Kafka plan; these
  * pin the declarative wiring instead — provider name, option keys, and
  * the value-decode projection over the documented wire schema — so a
  * regression in the Kafka path is caught here, before a real cluster
  * ever sees it. */
class SourcesPlanSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("kafka source options: bootstrap, subscribe, optional group id") {
    Sources.KafkaSpec("broker:9092", "topic_log", Some("g1"))
      .sourceOptions shouldBe Map(
        "kafka.bootstrap.servers" -> "broker:9092",
        "subscribe" -> "topic_log",
        "kafka.group.id" -> "g1")
    Sources.KafkaSpec("broker:9092", "t").sourceOptions.keySet should
      not contain "kafka.group.id"
  }

  test("kafka sink options: bootstrap, topic, checkpoint location") {
    Sources.KafkaSpec("broker:9092", "dwd_page_log")
      .sinkOptions("/chk/page") shouldBe Map(
        "kafka.bootstrap.servers" -> "broker:9092",
        "topic" -> "dwd_page_log",
        "checkpointLocation" -> "/chk/page")
  }

  test("value projection over the kafka wire schema: binary to nullable " +
       "string, tombstones survive as NULL") {
    val s = spark
    import s.implicits._
    // the connector's documented output schema, as far as the
    // projection consumes it: nullable binary key/value + metadata
    val wire = Seq(
      (Option("k1".getBytes("UTF-8")),
        Option("""{"mid":"m1"}""".getBytes("UTF-8")), "t", 0, 0L),
      (Option("k2".getBytes("UTF-8")),
        Option.empty[Array[Byte]], "t", 0, 1L)) // tombstone
      .toDF("key", "value", "topic", "partition", "offset")
    val out = wire.selectExpr(Sources.KafkaValueProjection)
    out.schema.fields.map(f =>
      (f.name, f.dataType.simpleString, f.nullable)) shouldBe
      Array(("value", "string", true))
    out.collect().map(r => Option(r.getString(0))) should
      contain theSameElementsAs Seq(Some("""{"mid":"m1"}"""), None)
  }

  test("stream and batch builders reach the kafka provider lookup") {
    // with no jar the resolution fails NAMING the kafka source — which
    // proves the format string is wired through; any other failure
    // (option validation, analysis) would surface differently
    Seq(
      intercept[Exception] {
        Sources.kafkaStringStream(spark, "broker:9092", "t", "g")
      },
      intercept[Exception] {
        Sources.kafkaStringBatch(spark, "broker:9092", "t")
      }).foreach(_.getMessage.toLowerCase should include("kafka"))
  }
}
