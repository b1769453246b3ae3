package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Spark-first configuration tuned for the contest environment
  * (single-JVM `local[32]`, 128 GiB) while staying valid for a real
  * multi-executor cluster:
  *
  *   - AQE on: runtime coalescing of shuffle partitions, skew-join
  *     splitting, and dynamic broadcast conversion — the knobs that make a
  *     plan survive a 100x scale-up without hand-retuning.
  *   - `spark.sql.shuffle.partitions` defaults to the local core count
  *     (32), not 200; on a real cluster this would be ~2-3x total cores
  *     and AQE coalesces the rest.
  *   - Session timezone pinned to UTC so date semantics match the DuckDB
  *     oracle (the reference hardcodes UTC+8 at
  *     `utils/DateFormatUtil.java:10-22`; we make the offset explicit at
  *     call sites instead of baking it into the session).
  */
object GraftSession {

  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // graft extensions: vec_cosine, TopKPerKey strategy, row_number
      // top-k rewrite (functions/GraftExtensions.scala)
      .withExtensions(new graft.functions.GraftExtensions)

  /** Get-or-create with graft defaults; used by tests and local mains.
    * `SparkEntry.queries` functions never call this — they accept whatever
    * session the driver hands them.
    */
  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
