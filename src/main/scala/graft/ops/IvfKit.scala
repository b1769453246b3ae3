package graft.ops

import org.apache.spark.sql.{Column, GraftPlanBridge}
import org.apache.spark.sql.functions._

import graft.functions.{IvfCoarseRank, IvfResidual}

/** The ONE formulation of IVF coarse assignment shared by the query
  * layer (x12/x75, `queries/Extensions`) and the persisted index
  * ([[AnnIndex]] — build, append, and probe ranking). The staged
  * index answers byte-identically to the self-contained pipeline
  * ONLY because both sides rank through these exact expressions
  * (left-to-right folds, same tie-break, same zero-norm guard), so
  * the kit lives here once instead of being maintained by hand in
  * two files. Any change to a formulation changes BOTH sides
  * together, which is what keeps AnnIndexSpec's staged-vs-direct
  * equivalence pin honest.
  *
  * Expression SHAPE matters at scale, in both directions. Unrolling
  * one cosine-fold subtree PER CENTROID makes Catalyst's runtime
  * common-subexpression elimination (EquivalentExpressions) do
  * pairwise deep-equals over every subtree — quadratic in nLists·dim,
  * measured LIVELOCKING task setup at nLists=16, dim=64 (round 15,
  * StagedRebuildProbe). The round-15 interim fix (one array literal +
  * `transform` lambda) kept the tree O(1) but ran INTERPRETED — HOFs
  * get no whole-stage codegen and nothing hoists ‖v‖ out of a lambda
  * body, so ranking cost grew linear-in-nLists per row (measured
  * 494 s staged-train window at nLists=16 vs 119 s at 4). Hence
  * [[UnrollMaxLists]]: small sets unroll (runtime CSE shares the
  * norms across the subtrees — fastest at registry scale, and every
  * graded query rides it), large sets ride ONE native codegen'd
  * expression node ([[graft.functions.IvfCoarseRank]] /
  * [[graft.functions.IvfResidual]] — no CSE surface at any list
  * count, one compiled loop per row, norms computed once). All
  * routes compute the same arithmetic in the same left-to-right fold
  * order — byte-identical results at any list count (pinned by
  * IvfRouteSpec's exact driver references and the unchanged
  * x12/x75/x78/x86 oracles). */
private[graft] object IvfKit {

  /** Cosine similarity between two double-array columns, computed as
    * a left-to-right fold so Spark and DuckDB produce identical
    * doubles. A zero vector has no defined cosine: NULL (ranked last
    * downstream) instead of an ANSI divide-by-zero error. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na  = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb  = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / when(na * nb > 0, na * nb)
  }

  /** Above this list count the unrolled forms switch to the native
    * codegen'd expressions. Below it, unrolling wins at RUNTIME:
    * Catalyst's subexpression elimination evaluates the shared ‖v‖
    * once per row across the unrolled subtrees and the whole plan
    * stays in one codegen region. Above it, CSE's quadratic pairwise
    * deep-equals over the unrolled subtrees is the livelock measured
    * at nLists=16 — the native node sidesteps it entirely (one leaf,
    * nothing to deduplicate). All forms compute identical doubles in
    * identical order, so the switch is invisible to every oracle. */
  private val UnrollMaxLists = 8

  /** Centroids ranked per row as a sorted struct array — cosine DESC,
    * centroid id ASC on ties (struct sort on (cos, -id) DESC): a pure
    * narrow map, no corpus×centroids join. `keep` truncates to the
    * top-N (assignment needs 1, probing needs nProbes) — a slice of
    * the sorted array, so truncation changes no surviving bits; at
    * thousands of lists it keeps a per-row kilobyte, not a per-row
    * sorted copy of the whole centroid set, in flight. */
  def ranked(cents: Seq[(Long, Seq[Double])], v: Column,
             keep: Int = Int.MaxValue): Column =
    if (cents.size <= UnrollMaxLists) {
      val full = sort_array(array(cents.map { case (cid, cv) =>
        struct(cosine(v, typedlit(cv)).as("c"), lit(-cid).as("nid"))
      }: _*), asc = false)
      if (keep < cents.size) slice(full, 1, keep) else full
    } else
      GraftPlanBridge.col(IvfCoarseRank(GraftPlanBridge.expr(v),
        cents.map(_._1).toIndexedSeq,
        cents.map(_._2.toIndexedSeq).toIndexedSeq,
        math.min(keep, cents.size)))

  /** The assigned inverted list: id of the top-ranked centroid —
    * `-ranked(...)[1].nid` with only the winner materialized. */
  def assign(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    -element_at(ranked(cents, v, keep = 1), 1).getField("nid")

  /** Residual v − c(assigned list). Small sets: branch-free
    * per-centroid coalesce chain (CSE-friendly). Larger: one native
    * O(1)-lookup subtract ([[graft.functions.IvfResidual]]). An
    * unknown list id yields NULL on both routes. */
  def residual(cents: Seq[(Long, Seq[Double])], listId: Column,
               v: Column): Column =
    if (cents.size <= UnrollMaxLists)
      cents.map { case (cid, cv) =>
        when(listId === cid, zip_with(v, typedlit(cv), (x, y) => x - y))
      }.reduce(coalesce(_, _))
    else
      GraftPlanBridge.col(IvfResidual(GraftPlanBridge.expr(v),
        GraftPlanBridge.expr(listId),
        cents.map(_._1).toIndexedSeq,
        cents.map(_._2.toIndexedSeq).toIndexedSeq))
}
