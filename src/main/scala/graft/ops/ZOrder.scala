package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering: lay a table out so each
  * output file covers a compact rectangle in a 2-D key space, making
  * file-level min/max statistics selective for predicates on EITHER or
  * BOTH dimensions — the layout `OPTIMIZE ... ZORDER BY` produces in
  * Delta/Iceberg, built here from public Spark primitives only.
  *
  * Why it matters at 100 TB: a table range-partitioned by one key prunes
  * scans on that key alone; a 2-D box predicate (customer x time,
  * user x page, ...) then touches every file. Interleaving the key bits
  * makes both dimensions' min/max ranges tight per file, so the same box
  * predicate skips most files (see ZOrderSpec for the measured ratio).
  *
  * All-expression implementation: the interleave is shifts/masks/ORs —
  * whole-stage-codegen friendly, no UDF.
  */
object ZOrder {

  /** Morton interleave of two non-negative keys, `bits` bits each
    * (x occupies the odd bit positions, y the even ones). Keys wider
    * than `bits` must be bucketed by the caller first. */
  def zval(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` into `nFiles` z-clustered partitions: rows land in
    * range-partitioned, internally sorted z-runs, so a subsequent
    * parquet write yields one compact z-rectangle per file. */
  def clusterBy(df: DataFrame, x: Column, y: Column,
                bits: Int, nFiles: Int): DataFrame =
    df.withColumn("__z", zval(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** [[zval]] over ARBITRARY numeric columns: one min/max aggregation
    * pass scales both into the `bits`-bit grid [[zval]] requires
    * (negative/fractional values included; nulls land in cell 0). The
    * extra job is the clustering price — O(scan) with partial agg, no
    * shuffle — and what Delta's OPTIMIZE ZORDER pays for its range-id
    * computation too. Returns a grid-cell Morton column usable in any
    * repartitionByRange/sort. */
  def zvalNormalized(df: DataFrame, x: String, y: String, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits must be in [1,20], got $bits")
    val r = df.agg(
      min(col(x)).cast("double"), max(col(x)).cast("double"),
      min(col(y)).cast("double"), max(col(y)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) lit(0L)
    else {
      val cells = (1 << bits) - 1
      def scale(c: String, lo: Double, hi: Double): Column = {
        val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
        least(lit(cells.toLong), greatest(lit(0L),
          (((coalesce(col(c).cast("double"), lit(lo)) - lit(lo)) / lit(span))
            * lit(cells.toDouble)).cast("long")))
      }
      zval(scale(x, r.getDouble(0), r.getDouble(1)),
           scale(y, r.getDouble(2), r.getDouble(3)), bits)
    }
  }
}
