package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when the semantics
  * are SQL-expressible) an equivalent DuckDB oracle.
  *
  * Determinism contract (what makes the driver's hash-compare pass):
  *   - every floating-point aggregate goes through exact DECIMAL(18,4)
  *     arithmetic and is cast to DOUBLE at the end, so Spark and DuckDB
  *     produce bit-identical doubles regardless of summation order;
  *   - column aliases match the oracle SQL exactly.
  *
  * Output-ordering policy: the driver's compare canonicalizes row order
  * (it hash-compares value multisets over un-coalesced parquet — the
  * round-1 review's "let the oracle sort"), so queries do NOT impose a
  * final total order on fact-sized outputs. A global ORDER BY would make
  * the range-partitioner's sampling job re-execute the entire upstream
  * pipeline — measured ~2x on map-only pipelines — and is the canonical
  * 100 TB anti-pattern. Final sorts remain only where they carry
  * semantics (top-k before LIMIT → TakeOrderedAndProject) or on tiny
  * aggregate outputs where presentation order is free.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** flagship query marker: reported as the `headline` group in the
      * Bench JSON alongside the uniform all-query timings */
    headline: Boolean = false)

object Q {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, pmod, sum}
  import org.apache.spark.sql.types.{DecimalType, DoubleType}

  /** Shared exact-arithmetic helpers for the determinism contract —
    * one definition so Relational/Warehouse/Extensions can't drift. */
  val DEC: DecimalType = DecimalType(18, 4)
  def dec(c: Column): Column = c.cast(DEC)
  /** Exact-arithmetic sum: identical bits in Spark and DuckDB. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Epoch micros → whole seconds with FLOOR semantics, matching the
    * oracle's `epoch_us(ts) // 1000000`. A bare `(c / 1000000L)
    * .cast("long")` truncates toward zero instead — off by one for any
    * pre-1970 timestamp not on a second boundary. The pmod subtraction
    * makes the numerator an exact second multiple and the division runs
    * in DECIMAL, so the result is exact integer arithmetic over the
    * FULL long range (a double division would silently lose exactness
    * past |µs| ≥ 2^53, ~year 2255). */
  def epochS(c: Column): Column =
    ((c - pmod(c, lit(1000000L))).cast(DecimalType(28, 0)) / 1000000L)
      .cast("long")

  /** Normalized-content fingerprint shared by the batch exact dedup
    * (x01), the curation pipeline (x25), and the STREAMING curation
    * dedup — one definition so the streaming dedup provably agrees with
    * the batch historical pass. */
  def normFingerprint(c: Column): Column = {
    import org.apache.spark.sql.functions.{lower, regexp_replace, sha2, trim}
    sha2(regexp_replace(trim(lower(c)), "\\s+", " "), 256)
  }
}

object Registry {
  def all: Seq[Q] =
    Relational.queries ++ Warehouse.queries ++ Extensions.queries

  def byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
