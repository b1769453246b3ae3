package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** K2's semantics, made concrete: Structured Streaming's Kafka sink is
  * at-least-once, but foreachBatch + an idempotent (batchId-keyed)
  * sink gives exactly-once per micro-batch across restarts — a retried
  * batch overwrites its own directory instead of duplicating. This
  * spec kills the query mid-stream and restarts from the checkpoint.
  */
class StreamingRecoverySpec extends AnyFunSuite with Matchers with SparkFixture {

  test("restart from checkpoint: every input row lands exactly once") {
    val s = spark
    import s.implicits._
    val in  = Files.createTempDirectory("rec_in").toString
    val out = Files.createTempDirectory("rec_out").toString
    val chk = Files.createTempDirectory("rec_chk").toString

    def startQuery() =
      s.readStream
        .schema(StructType(Seq(StructField("value", StringType))))
        .text(in)
        .writeStream
        .option("checkpointLocation", chk)
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          // idempotent sink: a replayed batch rewrites its own dir
          batch.write.mode("overwrite").parquet(s"$out/batch_$batchId")
          ()
        }
        .start()

    Files.write(Paths.get(s"$in/a.txt"), "r1\nr2\nr3".getBytes)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // second epoch: new data arrives while the query is down
    Files.write(Paths.get(s"$in/b.txt"), "r4\nr5".getBytes)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val rows = s.read.parquet(s"$out/batch_*").as[String].collect().sorted
    rows shouldBe Array("r1", "r2", "r3", "r4", "r5")
  }
}
