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

  // --- IncrementalCdc: S2's snapshot-then-changelog contract ---------

  private def cdcFixture(n: Int) = {
    val s = spark
    import s.implicits._
    // 3 versions per key, interleaved so no batch boundary aligns with
    // a key boundary
    (1 to n).flatMap(v => (0L until 8L).map(k =>
      (k, s"payload_${k}_v$v", v.toLong * 100 + k)))
      .toDF("id", "payload", "version")
  }

  test("IncrementalCdc: snapshot + cursor-bounded tail == full re-read") {
    val s = spark
    import graft.streaming.IncrementalCdc
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("cdc_inc").toString
    val all = cdcFixture(3)
    // incremental store: snapshot at version<=100-range, then two applies
    val inc = s"$work/inc"
    IncrementalCdc.bootstrap(s, all.filter(col("version") < 200), inc,
      "id", "version")
    val chlog = s"$work/chlog"
    all.filter(col("version") >= 200).write.parquet(chlog)
    val tail = s.read.parquet(chlog)
    val n1 = IncrementalCdc.applyOnce(s, tail, inc, "id", "version",
      upTo = Some(250L))
    val n2 = IncrementalCdc.applyOnce(s, tail, inc, "id", "version")
    n1 shouldBe 8L
    n2 shouldBe 8L
    // full-re-read store: everything in one bootstrap
    val full = s"$work/full"
    IncrementalCdc.bootstrap(s, all, full, "id", "version")
    val got = IncrementalCdc.read(s, inc).orderBy("id")
      .collect().map(_.toSeq)
    val want = IncrementalCdc.read(s, full).orderBy("id")
      .collect().map(_.toSeq)
    got shouldBe want
    got.length shouldBe 8
    // the store holds the LATEST version of every key
    got.foreach(r => r(2) shouldBe 300L + r(0).asInstanceOf[Long])
  }

  test("IncrementalCdc: replayed apply after a cursor crash is idempotent") {
    val s = spark
    import graft.streaming.IncrementalCdc
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("cdc_replay").toString
    val all = cdcFixture(2)
    val store = s"$work/store"
    IncrementalCdc.bootstrap(s, all.filter(col("version") < 200), store,
      "id", "version")
    val chlog = s"$work/chlog"
    all.filter(col("version") >= 200).write.parquet(chlog)
    val tail = s.read.parquet(chlog)
    IncrementalCdc.applyOnce(s, tail, store, "id", "version") shouldBe 8L
    val before = IncrementalCdc.read(s, store).orderBy("id")
      .collect().map(_.toSeq)
    // simulate a crash BETWEEN merge-commit and cursor-advance: the
    // cursor file says the tail was never applied, so the whole batch
    // redelivers — the LWW merge must absorb it without changing state.
    // (Write through the Hadoop fs so the checksum sidecar stays
    // consistent — the module reads through the same fs.)
    val hfs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = hfs.create(new org.apache.hadoop.fs.Path(s"$store.__cursor"), true)
    out.write("199".getBytes); out.close()
    IncrementalCdc.applyOnce(s, tail, store, "id", "version") shouldBe 8L
    val after = IncrementalCdc.read(s, store).orderBy("id")
      .collect().map(_.toSeq)
    after shouldBe before
    // cursor healed to the true high-water mark
    IncrementalCdc.readCursor(s, store) shouldBe Some(207L)
  }

  test("IncrementalCdc: a current store applies nothing") {
    val s = spark
    import graft.streaming.IncrementalCdc
    val work = Files.createTempDirectory("cdc_noop").toString
    val all = cdcFixture(2)
    val store = s"$work/store"
    IncrementalCdc.bootstrap(s, all, store, "id", "version")
    val chlog = s"$work/chlog"
    all.write.parquet(chlog)
    val tail = s.read.parquet(chlog)
    // everything is at or below the cursor: 0 records applied, store
    // untouched (steady-state cost is the pruned scan, not a rewrite)
    IncrementalCdc.applyOnce(s, tail, store, "id", "version") shouldBe 0L
    IncrementalCdc.read(s, store).count() shouldBe 8L
  }
}
