package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every query receives the scale-factor directory at call time, so the
  * same code runs on sf0.001 smoke, sf0.01 oracle, and sf0.1 bench — and,
  * unchanged, on a 100 TB table: `spark.read.parquet` scans are
  * partition-parallel, filters and projections are pushed to the parquet
  * reader by Catalyst, and nothing here materializes on the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    // reader rejects outright; read it as a nanos long and truncate to
    // micros with integer division (matches DuckDB's nanos→micros
    // truncation; a double division would lose precision at 1e18).
    // The legacy flag is session-wide and sticky — scope the mutation
    // to the one table that needs it (the scan consults the conf at
    // execution, so set-and-restore would break the deferred read).
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
