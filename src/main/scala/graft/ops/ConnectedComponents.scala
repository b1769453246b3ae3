package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contraction (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * O(log n)-round counterpart to min-label propagation (x28), which
  * needs O(graph diameter) rounds and carries the full adjacency list
  * through every one of them.
  *
  * Why a second algorithm for the same answer: near-dup graphs at
  * corpus scale are mostly tiny cliques, where propagation wins — but
  * one boilerplate template shared by a crawl slice can chain tens of
  * thousands of documents into a path-shaped component whose diameter,
  * not the corpus size, becomes the round count. Star contraction
  * halves the effective height per round pair regardless of shape
  * (provably O(log² n), empirically ~log n), and each round SHRINKS
  * the edge set it carries (every rewrite points an edge at a
  * component-local minimum, and duplicates collapse in the per-round
  * dedup), so late rounds touch a fraction of the input instead of
  * re-joining all of it. Both operations are one keyed aggregation +
  * one keyed join per round — the same shuffle shape as propagation,
  * just fewer rounds on deep graphs.
  *
  * Contract: input is an undirected edge list (any orientation, self
  * loops ignored); output is one row per distinct endpoint,
  * `(id, rep)` with `rep` = the component's minimum node id — byte-
  * identical to what [[graft.queries.Extensions]] x28's propagation
  * emits, which is exactly what a dedup pass wants (the canonical
  * keeper id per duplicate cluster).
  *
  * Determinism: min() everywhere — no hashing, no randomness; the
  * fixpoint (disjoint stars centered at component minima) is unique,
  * so replays and speculative tasks cannot change the answer.
  */
object ConnectedComponents {

  /** Large-star: for every node u (as the center of its symmetrized
    * neighborhood), connect each STRICTLY LARGER neighbor to
    * m = min(N(u) ∪ {u}). Emitted edges always run strictly downhill
    * (v > u ≥ m), so the output is a directed big→small edge set. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val m = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(m, "u").filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
    // No trailing distinct: the (v, m) duplicates this can emit (two
    // centers pointing the same v at the same m) are absorbed for free
    // by small-star's groupBy combiner and final distinct in the SAME
    // round, so the per-round edge SET is unchanged while each round
    // drops one full exchange (measured: the contraction loop is one
    // of the two shuffles-per-op paths this file pays per round).
  }

  /** Small-star: input edges run big→small (`a > b`, large-star's
    * postcondition). For every large endpoint a, connect each member
    * of {its smaller neighbors} ∪ {a} except the minimum itself to
    * m = min(smaller neighbors). Output again runs big→small. */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy(col("a")).agg(min(col("b")).as("m"))
    val members = e.select(col("a"), col("b"))
      .union(e.select(col("a"), col("a").as("b")))
    members.join(m, "a").filter(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
  }

  // The convergence witness — (row count, XOR of a per-edge hash), an
  // order-independent SET checksum — is computed inside [[truncatedW]]'s
  // materializing pass. An equal witness only NOMINATES a fixpoint; the
  // loop confirms it with one real set-difference job before
  // terminating, so checksum quality governs how often the confirm job
  // runs (effectively once), never correctness. XOR-fold is total on
  // the full Long id range (an arithmetic Σ would overflow under ANSI
  // mode on hash-range ids).

  /** Run alternating rounds to the unique fixpoint and return
    * `(id, rep)` labels. `maxRounds` is a loud failsafe, not a quality
    * knob — contraction provably converges in O(log² n) rounds, so
    * hitting the cap means a broken invariant, and silently returning
    * a half-contracted forest would be WRONG labels. */
  /** Per-round lineage truncation: each round's plan references the
    * previous round's frame SEVERAL times (large-star self-unions,
    * small-star self-joins), so an uncut lineage grows exponentially
    * and Catalyst's canonicalization OOMs the driver around round 8 —
    * checkpointing makes every round a leaf scan of stored blocks.
    * When the session has a reliable `spark.checkpoint.dir`
    * configured, rounds checkpoint THERE (fault-tolerant: an executor
    * loss mid-contraction recovers from durable blocks instead of
    * failing the job — what a multi-hour production run wants);
    * otherwise eager executor-block localCheckpoint, which suffices
    * because the algorithm is deterministic — on executor loss the
    * job fails and a retry recomputes the same fixpoint.
    *
    * Returns the truncated frame AND a release handle that deletes
    * the round's durable copy. Spark never cleans reliable checkpoint
    * files on its own (only the off-by-default
    * `spark.cleaner.referenceTracking.cleanCheckpoints` does, on GC),
    * so without the handle a 30-round contraction would strand ~30
    * full edge-set copies in the checkpoint dir per invocation. The
    * reliable route therefore checkpoints an RDD we hold (public
    * `RDD.checkpoint`/`getCheckpointFile`), persisted around the
    * materializing count so the checkpoint write reads cached blocks
    * instead of recomputing the round. */
  private def truncated(df: DataFrame): (DataFrame, () => Unit) = {
    val (f, _, r) = truncatedW(df); (f, r)
  }

  /** [[truncated]] with the convergence witness computed IN the
    * materializing action: the checkpoint used to pay one job to
    * materialize (`count`) and the loop a second to checksum
    * ([[witness]]) — per round, at ~50 ms job-scheduling floor each.
    * The witness only ever compares round-to-round, so any
    * deterministic order-independent set checksum works; this one is a
    * splitmix-style mix of (a, b) XOR-folded per partition, reduced
    * driver-side — one pass, one job, and the pass itself is the
    * checkpoint materialization. */
  private def truncatedW(df: DataFrame): (DataFrame, (Long, Long), () => Unit) = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (reliable) rdd.checkpoint() else rdd.localCheckpoint()
    val w = rdd.mapPartitions { it =>
      var c = 0L; var x = 0L
      while (it.hasNext) {
        val r = it.next()
        var h = r.getLong(0) * 0x9E3779B97F4A7C15L
        h ^= (h >>> 32)
        h += r.getLong(1) * 0xC2B2AE3D27D4EB4FL
        h ^= (h >>> 29)
        h *= 0x165667B19E3779F9L
        c += 1; x ^= h
      }
      Iterator((c, x))
    }.fold((0L, 0L))((p, q) => (p._1 + q._1, p._2 ^ q._2))
    val release: () => Unit =
      if (reliable) {
        rdd.unpersist(blocking = false) // later reads hit the durable copy
        () => rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          p.getFileSystem(sc.hadoopConfiguration).delete(p, true); ()
        }
      } else {
        // localCheckpoint lives in the persisted blocks themselves —
        // releasing here means dropping them when superseded
        () => { rdd.unpersist(blocking = false); () }
      }
    (spark.createDataFrame(rdd, df.schema), w, release)
  }

  def starContraction(edges: DataFrame, maxRounds: Int = 32): DataFrame =
    starContractionReleasable(edges, maxRounds)._1

  /** As [[starContraction]], plus a release handle for the labels'
    * durable checkpoint copy on the reliable-checkpoint route (a
    * no-op on the eager-local route). Spark never deletes reliable
    * checkpoint files on its own, so a long-lived session that
    * contracts per consultation strands one O(nodes) copy per call
    * unless something runs the handle; a caller that materializes or
    * writes the labels elsewhere should call it — after release, the
    * persisted blocks are the only copy (executor loss can then no
    * longer recompute this frame from the durable file). */
  def starContractionReleasable(edges: DataFrame, maxRounds: Int = 32)
      : (DataFrame, () => Unit) = {
    // drop self loops, orient big→small once so round 1 can start on
    // small-star's precondition without a wasted symmetrize; truncate
    // per round (see [[truncated]])
    var (e, prev, releaseE) = truncatedW(edges
      .select(greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    var rounds = 0
    var done = prev._1 == 0L
    // Scale the loop's shuffle width to the EDGE COUNT, not the session
    // default: every round pays two keyed aggregations and a join whose
    // exchanges inherit spark.sql.shuffle.partitions, and on a
    // fixture-sized graph (hundreds of edges) a 32-wide exchange is
    // pure task-launch overhead repeated per round. Derived from the
    // measured initial count (~100k edges per partition, capped at the
    // session's own setting so a 100 TB graph is unaffected); restored
    // in finally.
    val sess = edges.sparkSession
    val partsKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevParts = sess.conf.get(partsKey)
    val prevAqe = sess.conf.get(aqeKey)
    val sessionParts = sess.sessionState.conf.numShufflePartitions
    val loopParts = math.max(1, math.min(
      sessionParts, (prev._1 / 100000L + 1).toInt))
    sess.conf.set(partsKey, loopParts.toString)
    // In the small-graph regime (loop width below the session setting)
    // AQE has nothing left to coalesce, but still splits every round's
    // materialization into one Spark job per exchange — at the ~50 ms
    // job floor that's most of a fixture-scale round. Left untouched
    // when the loop runs at session width (the 100 TB regime, where
    // AQE's skew handling matters).
    if (loopParts < sessionParts)
      sess.conf.set(aqeKey, "false")
    try {
    while (!done && rounds < maxRounds) {
      val (next, cur, releaseNext) = truncatedW(smallStar(largeStar(e)))
      // equal witness nominates a fixpoint; confirm with a real
      // set-difference before terminating (both frames are distinct()
      // with equal counts, so one-directional exceptAll suffices) —
      // a hash-xor checksum alone can't prove set equality, and a
      // spurious match would return WRONG labels
      done = cur == prev && next.exceptAll(e).isEmpty
      e.unpersist()
      releaseE() // the superseded round's durable copy is now unreferenced
      e = next
      releaseE = releaseNext
      prev = cur
      rounds += 1
    }
    lastRounds.set(rounds)
    if (!done)
      throw new IllegalStateException(
        s"star contraction did not converge in $rounds rounds")
    // fixpoint = disjoint stars: leaves carry their center, centers
    // label themselves. Persist + force BEFORE releasing the fixpoint
    // cache — labels are lazy, and dropping `e` first would send every
    // later consumer back through the whole iterative lineage. The
    // returned frame is persisted (MEMORY_AND_DISK, matching the query
    // layer's cache level so its wrapper persist is a no-op on the
    // same frame); callers that materialize elsewhere may unpersist.
    val labelsRaw = e.select(col("a").as("id"), col("b").as("rep"))
      .union(e.select(col("b").as("id"), col("b").as("rep")).distinct())
    val (labels, releaseLabels) =
      if (edges.sparkSession.sparkContext.getCheckpointDir.isDefined) {
        // reliable route: land the labels in their OWN durable copy so
        // the final edge round's (much larger) checkpoint can be
        // released too. The labels' copy stays in the dir for the
        // result's lifetime — the price of surviving executor loss
        // after this method returns — and the returned handle is how
        // a caller reclaims it once the labels are materialized
        // elsewhere.
        truncated(labelsRaw)
      } else (labelsRaw, () => ())
    labels.persist()
    labels.count()
    e.unpersist()
    releaseE()
    (labels, releaseLabels)
    } finally {
      sess.conf.set(partsKey, prevParts)
      sess.conf.set(aqeKey, prevAqe)
    }
  }

  /** Rounds taken by the LAST `starContraction` on this thread — a test
    * hook (same pattern as DimStore's listing counter), not an API. */
  val lastRounds = new ThreadLocal[Int] { override def initialValue(): Int = -1 }
}
