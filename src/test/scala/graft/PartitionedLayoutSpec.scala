package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.Tables

/** Physical-layout levers the fixtures (single parquet files) can't
  * show directly: date-partitioned table layout with partition pruning
  * at the scan — the first thing a 100 TB warehouse relies on — and
  * source-format parity (the same rows through CSV and JSON-lines
  * land identically to the parquet source). */
class PartitionedLayoutSpec extends AnyFunSuite with Matchers with SparkFixture {

  test("date-partitioned write: scans prune to the predicate's partitions") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("partlayout").toString + "/events_dt"
    val ev = Tables.load(s, sf0001, "events")
      .withColumn("dt", date_format($"ts", "yyyy-MM-dd"))
    ev.write.partitionBy("dt").mode("overwrite").parquet(dir)

    val allDts = ev.select($"dt").distinct().as[String].collect().sorted
    allDts.length should be > 3 // layout actually split by day
    val pick = allDts(allDts.length / 2)

    val pruned = s.read.parquet(dir).filter($"dt" === pick)
    val plan = pruned.queryExecution.executedPlan.toString
    // the predicate must resolve at the FileIndex, not as a data filter
    plan should include("PartitionFilters")
    plan should include(pick)
    pruned.count() shouldBe ev.filter($"dt" === pick).count()
    // the layout really is hive-style one-directory-per-day, so the
    // PartitionFilter above maps to skipping whole directories
    // (inputFiles can't witness this: it lists the relation pre-pruning)
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("dt=")).map(_.getName).sorted
    partDirs.length shouldBe allDts.length
    partDirs should contain(s"dt=$pick")
  }

  test("CSV and JSON-lines sources produce the same rows as the parquet source") {
    val s = spark
    import s.implicits._
    val base = Files.createTempDirectory("srcparity").toString
    val ev = Tables.load(s, sf0001, "events")
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts".cast("timestamp")).as("ts_us"))
    ev.write.option("header", "true").mode("overwrite").csv(s"$base/csv")
    ev.write.mode("overwrite").json(s"$base/json")

    val schema = ev.schema
    val viaCsv = s.read.option("header", "true").schema(schema).csv(s"$base/csv")
    val viaJson = s.read.schema(schema).json(s"$base/json")
    viaCsv.except(ev).count() shouldBe 0
    ev.except(viaCsv).count() shouldBe 0
    viaJson.except(ev).count() shouldBe 0
    ev.except(viaJson).count() shouldBe 0
  }
}
