package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for spark.sql paths). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
