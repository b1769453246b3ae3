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
    // drop the versioned cursor entries and regress via the LEGACY file
    // (also exercising the pre-versioned-cursor read-compat path)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$store.__cursors"), true)
    val out = hfs.create(new org.apache.hadoop.fs.Path(s"$store.__cursor"), true)
    out.write("199".getBytes); out.close()
    IncrementalCdc.applyOnce(s, tail, store, "id", "version") shouldBe 8L
    val after = IncrementalCdc.read(s, store).orderBy("id")
      .collect().map(_.toSeq)
    after shouldBe before
    // cursor healed to the true high-water mark
    IncrementalCdc.readCursor(s, store) shouldBe Some(207L)
  }

  test("cursor crash window: a stale extra entry (interrupted sweep) " +
       "never regresses the cursor, and no window presents NO cursor") {
    val s = spark
    import graft.streaming.IncrementalCdc
    import org.apache.spark.sql.functions.col
    val work = Files.createTempDirectory("cdc_cursorwin").toString
    val all = cdcFixture(2)
    val store = s"$work/store"
    IncrementalCdc.bootstrap(s, all.filter(col("version") < 200), store,
      "id", "version")
    val chlog = s"$work/chlog"
    all.filter(col("version") >= 200).write.parquet(chlog)
    val tail = s.read.parquet(chlog)
    IncrementalCdc.applyOnce(s, tail, store, "id", "version") shouldBe 8L
    val hw = IncrementalCdc.readCursor(s, store).get
    // simulate the advance crashing between new-entry creation and the
    // sweep of old entries: BOTH entries present → max-resolution wins
    val hfs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    hfs.create(new org.apache.hadoop.fs.Path(s"$store.__cursors/v150"), true)
      .close()
    IncrementalCdc.readCursor(s, store) shouldBe Some(hw)
    // already-current: the pruned scan applies nothing (O(new records)
    // holds through the crash, unlike a lost-cursor full-history replay)
    IncrementalCdc.applyOnce(s, tail, store, "id", "version") shouldBe 0L
    // the next real advance sweeps the stale entry
  }

  test("IncrementalCdc model fuzz: random snapshot cuts, batch slicings " +
       "and replays always converge to the full re-read state") {
    val s = spark
    import s.implicits._
    import graft.streaming.IncrementalCdc
    import org.apache.spark.sql.functions.col
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // global versions 1..n over 6 keys: every key's latest is well-
      // defined and the expected state is a plain max-version fold
      val n = 20 + rnd.nextInt(20)
      val rows = (1 to n).map { v =>
        val k = rnd.nextInt(6).toLong
        (k, s"p${k}_v$v", v.toLong)
      }
      val all = rows.toDF("id", "payload", "version")
      val work = Files.createTempDirectory(s"cdc_fuzz_$seed").toString
      // cut < n: a fully-consumed snapshot would make the changelog an
      // EMPTY parquet write, which Spark cannot re-read (no schema)
      val cut = rnd.nextInt(n).toLong
      val store = s"$work/store"
      IncrementalCdc.bootstrap(s, all.filter(col("version") <= cut), store,
        "id", "version", nBuckets = 4)
      val chlog = s"$work/chlog"
      all.filter(col("version") > cut).write.parquet(chlog)
      val tail = s.read.parquet(chlog)
      // random ascending upper bounds, then an unbounded drain; with a
      // 1-in-3 chance replay a batch by regressing the cursor first
      // (the crash-window double delivery)
      val bounds = Seq.fill(rnd.nextInt(3))(cut + 1 + rnd.nextInt(n))
        .sorted.map(Some(_)) :+ None
      var applied = 0L
      bounds.foreach { up =>
        val before = IncrementalCdc.readCursor(s, store).get
        applied += IncrementalCdc.applyOnce(s, tail, store, "id", "version", up)
        if (rnd.nextInt(3) == 0) {
          // regress the cursor (as if the advance was lost) and re-apply
          val hfs = new org.apache.hadoop.fs.Path(store)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          hfs.delete(new org.apache.hadoop.fs.Path(s"$store.__cursors"), true)
          val out = hfs.create(
            new org.apache.hadoop.fs.Path(s"$store.__cursor"), true)
          out.write(before.toString.getBytes); out.close()
          IncrementalCdc.applyOnce(s, tail, store, "id", "version", up)
        }
      }
      applied shouldBe (n.toLong - cut)
      val expected = rows.groupBy(_._1).values
        .map(g => g.maxBy(_._3)).toSeq.sortBy(_._1)
      val got = IncrementalCdc.read(s, store).orderBy("id")
        .as[(Long, String, Long)].collect().toSeq
      withClue(s"seed=$seed cut=$cut bounds=$bounds: ") {
        got shouldBe expected
      }
    }
  }

  test("Jobs.dimAppIncremental routes per config and applies only past " +
       "each sink's cursor") {
    val s = spark
    import s.implicits._
    import graft.streaming.{Jobs, TableProcess}
    val work = Files.createTempDirectory("cdc_route").toString
    val config = Seq(
      TableProcess("user_info", "dim_user", "id,name", "id"),
      TableProcess("sku_info", "dim_sku", "id,price", "id"))
    val chlog = s"$work/chlog"
    def row(src: String, id: Long, name: String, price: Long, v: Long) =
      (src, id, name, price, v)
    Seq(row("user_info", 1, "ann", 0, 1), row("sku_info", 7, "", 99, 2),
        row("user_info", 1, "anne", 0, 3))
      .toDF("source_table", "id", "name", "price", "v")
      .write.mode("append").parquet(chlog)
    val n1 = Jobs.dimAppIncremental(s.read.parquet(chlog), config,
      s"$work/dim", "v", nBuckets = 4)
    n1 shouldBe Map("dim_user" -> 2L, "dim_sku" -> 1L)
    // second poll with no new data: stores current, nothing applied
    Jobs.dimAppIncremental(s.read.parquet(chlog), config,
      s"$work/dim", "v", nBuckets = 4) shouldBe
      Map("dim_user" -> 0L, "dim_sku" -> 0L)
    // changelog grows; only the new record is applied, to its sink only
    Seq(row("user_info", 2, "bo", 0, 4))
      .toDF("source_table", "id", "name", "price", "v")
      .write.mode("append").parquet(chlog)
    Jobs.dimAppIncremental(s.read.parquet(chlog), config,
      s"$work/dim", "v", nBuckets = 4) shouldBe
      Map("dim_user" -> 1L, "dim_sku" -> 0L)
    // final state: config projection applied, LWW per pk
    graft.ops.DimStore.read(s, s"$work/dim/dim_user")
      .orderBy("id").as[(Long, String, Long)].collect() shouldBe
      Array((1L, "anne", 3L), (2L, "bo", 4L))
    graft.ops.DimStore.read(s, s"$work/dim/dim_sku")
      .as[(Long, Long, Long)].collect() shouldBe Array((7L, 99L, 2L))
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
