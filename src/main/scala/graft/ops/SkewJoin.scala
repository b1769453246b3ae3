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

  private val SupportedTypes = Set("inner", "left", "leftouter", "left_outer")

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways. Result rows
    * are identical to `big.join(small, Seq(key), joinType)` — salting
    * only changes the shuffle distribution.
    *
    * Scatter note: the salt derives from
    * `hash(monotonically_increasing_id())`, whose VALUES depend on the
    * physical partition layout and so may differ between runs over
    * differently-split inputs. The JOIN RESULT is layout-independent
    * regardless: the small side carries every salt for every key, so
    * each big row matches the same small rows whatever salt it drew
    * (x69's oracle pins exactly this).
    *
    * Join types: `inner` and `left` (big side preserved). A LEFT join
    * is correct under salting with no extra compensation — an unmatched
    * big row null-extends exactly once, because each big row exists
    * once (with one salt) and the replicated small side either has its
    * key at that salt or nowhere. `right`/`full` are REJECTED: an
    * unmatched SMALL key exists `salts` times after replication and
    * would null-extend once per salt — de-duplicating those would need
    * a post-join collapse that re-introduces the hot-key shuffle the
    * salting exists to avoid. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(SupportedTypes.map(_.replace("_", "")).contains(jt),
      s"saltedJoin supports inner and left joins, not '$joinType': the " +
      "replicated small side would null-extend an unmatched small key " +
      "once PER SALT under right/full outer semantics")
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salt count derived from the EXACT key histogram: one
    * partial-aggregated count pass (map-side combine collapses hot
    * keys per partition, so the pass itself doesn't straggle) yields
    * the hottest key's row count; the salt count is what's needed to
    * shrink that key's largest (key, salt) group to roughly an average
    * shuffle partition's share. Uniform input derives 1 (salting
    * degenerates to the plain join); a key holding P× its fair share
    * derives ~P, capped at `maxSalts` so the small-side replication
    * factor stays bounded. */
  def adaptiveSaltsExact(big: DataFrame, key: String, maxSalts: Int = 64): Int = {
    require(maxSalts >= 1, "maxSalts must be at least 1")
    val parts = big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val row = big.groupBy(col(key)).count()
      .agg(max(col("count")), sum(col("count"))).head()
    if (row.isNullAt(0) || row.isNullAt(1)) 1
    else {
      val hottest = row.getLong(0)
      val total = row.getLong(1)
      saltsFor(hottest, total, parts, maxSalts)
    }
  }

  private def saltsFor(hottest: Long, total: Long,
                       parts: Int, maxSalts: Int): Int =
    math.min(maxSalts.toLong,
      math.max(1L, math.ceil(hottest.toDouble * parts / total).toLong)).toInt

  /** Below this many SAMPLED rows the hottest-share estimate is too
    * noisy to trust — and a table this small aggregates exactly for
    * pennies anyway, so the sampled path hands off to
    * [[adaptiveSaltsExact]]. */
  val SampleFloor = 10000L

  /** [[adaptiveSaltsExact]] from a SAMPLED histogram: at 100× scale
    * the exact pass is a full extra aggregation job over the big side
    * per call, while the quantity it derives is a RATIO (the hottest
    * key's share of all rows), which a seeded few-percent sample
    * estimates within ±1 salt for any key hot enough to matter — a
    * key too rare for the sample to see is by the same token too rare
    * to straggle a partition. Deterministic (fixed seed); falls back
    * to exact when the sample is under [[SampleFloor]] rows. */
  def adaptiveSalts(big: DataFrame, key: String, maxSalts: Int = 64,
                    sampleFraction: Double = 0.05): Int = {
    require(maxSalts >= 1, "maxSalts must be at least 1")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0,1], got $sampleFraction")
    val parts = big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val row = big.sample(withReplacement = false, sampleFraction, seed = 8191L)
      .groupBy(col(key)).count()
      .agg(max(col("count")), sum(col("count"))).head()
    if (row.isNullAt(0) || row.isNullAt(1)) adaptiveSaltsExact(big, key, maxSalts)
    else {
      val hottest = row.getLong(0)
      val total = row.getLong(1)
      if (total < SampleFloor) adaptiveSaltsExact(big, key, maxSalts)
      else saltsFor(hottest, total, parts, maxSalts)
    }
  }

  /** [[saltedJoin]] with the salt count measured by [[adaptiveSalts]]
    * — a sampled histogram pass (exact below the sample floor), the
    * measured-not-guessed salt count at a few percent of the old
    * full-aggregation price, amortized against the straggler it
    * prevents. */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String,
                     joinType: String = "inner", maxSalts: Int = 64): DataFrame =
    saltedJoin(big, small, key, adaptiveSalts(big, key, maxSalts), joinType)
}
