package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics
  * are SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract (what makes the driver's hash-compare pass):
  *   - every query ends in a total ORDER BY (unique tie-break keys);
  *   - every floating-point aggregate goes through exact DECIMAL(18,4)
  *     arithmetic and is cast to DOUBLE at the end, so Spark and DuckDB
  *     produce bit-identical doubles regardless of summation order;
  *   - column aliases match the oracle SQL exactly.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in Bench headline timings */
    headline: Boolean = false)

object Registry {
  def all: Seq[Q] =
    Relational.queries ++ Warehouse.queries ++ Extensions.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
