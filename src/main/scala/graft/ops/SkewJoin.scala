package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the joins AQE can't fix.
  *
  * AQE's skew-join splitting (on by default in GraftSession) handles
  * sort-merge joins; when a handful of hot keys still dominate — or the
  * skewed side feeds a non-SMJ operator — salting is the standard
  * remedy: the skewed (big) side scatters each hot key across `salts`
  * sub-keys, the small side replicates each row `salts` times, and the
  * join key becomes (key, salt). Shuffle partitions then bound at
  * |key|×salts instead of one straggler per hot key.
  *
  * Cost model: replicating the small side ×salts is cheap exactly when
  * the small side is small (the usual fact⋈dim skew case); for
  * fact⋈fact skew, prefer AQE or isolate the hot keys and union a
  * broadcast join for just those.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * Result rows are identical to `big.join(small, key)` — salting only
    * changes the shuffle distribution. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Deterministic per-row scatter: hash of the row id spreads rows of
    // the same hot key uniformly without an RNG (replayable plans).
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
