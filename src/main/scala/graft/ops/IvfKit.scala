package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  * StagedRebuildProbe). But the lambda form pays per ROW: CSE cannot
  * hoist anything out of a lambda body, so ‖v‖ re-evaluates per
  * centroid (measured +86 % on x75). Hence [[UnrollMaxLists]]: small
  * sets unroll (CSE shares the norms), large sets ride ONE array
  * literal + `transform` lambda (O(1)-in-nLists tree). Both compute
  * the same arithmetic in the same left-to-right fold order —
  * byte-identical results at any list count (pinned by the unchanged
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

  /** Above this list count the unrolled forms switch to the
    * array-literal + lambda forms. Below it, unrolling wins at RUNTIME:
    * Catalyst's subexpression elimination evaluates the shared ‖v‖ (and
    * PQ's slices) once per row across the unrolled subtrees, while a
    * lambda body re-evaluates everything per element (no CSE inside
    * lambdas — measured +86 % on x75 when the lambda form ran
    * unconditionally). Above it, CSE's quadratic pairwise deep-equals
    * over the unrolled subtrees is the livelock measured at nLists=16.
    * Both forms compute identical doubles in identical order, so the
    * switch is invisible to every oracle. */
  private val UnrollMaxLists = 8

  /** The centroid set as one array<struct<id, vec>> literal — a single
    * leaf in the expression tree however many lists the index has. */
  private def centsLit(cents: Seq[(Long, Seq[Double])]): Column =
    typedlit(cents.map { case (cid, cv) => (cid, cv) })

  /** Centroids ranked per row as a sorted struct array — cosine DESC,
    * centroid id ASC on ties (struct sort on (cos, -id) DESC): a pure
    * narrow map, no corpus×centroids join. Small centroid sets unroll
    * (runtime CSE shares ‖v‖ across the subtrees); larger ones rank
    * through one `transform` lambda over [[centsLit]] so the expression
    * tree stays O(1) in nLists. Arithmetic order is identical on both
    * routes: dot folds v·c left-to-right, the norm product is ‖v‖·‖c‖. */
  def ranked(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    if (cents.size <= UnrollMaxLists)
      sort_array(array(cents.map { case (cid, cv) =>
        struct(cosine(v, typedlit(cv)).as("c"), lit(-cid).as("nid"))
      }: _*), asc = false)
    else
      sort_array(transform(centsLit(cents), c => {
        val cv  = c.getField("_2")
        val dot = aggregate(zip_with(v, cv, (x, y) => x * y), lit(0.0),
          (acc, x) => acc + x)
        val nv  = sqrt(aggregate(transform(v, x => x * x), lit(0.0),
          (acc, x) => acc + x))
        val nc  = sqrt(aggregate(transform(cv, x => x * x), lit(0.0),
          (acc, x) => acc + x))
        struct((dot / when(nv * nc > 0, nv * nc)).as("c"),
          (-c.getField("_1")).as("nid"))
      }), asc = false)

  /** Residual v − c(assigned list). Small sets: branch-free
    * per-centroid coalesce chain (CSE-friendly). Larger: one array
    * lookup by list id. An unknown list id yields NULL on both routes;
    * `filter` + `try_element_at` stays NULL-safe under ANSI. */
  def residual(cents: Seq[(Long, Seq[Double])], listId: Column,
               v: Column): Column =
    if (cents.size <= UnrollMaxLists)
      cents.map { case (cid, cv) =>
        when(listId === cid, zip_with(v, typedlit(cv), (x, y) => x - y))
      }.reduce(coalesce(_, _))
    else {
      val cv = try_element_at(
        filter(centsLit(cents), c => c.getField("_1") === listId),
        lit(1)).getField("_2")
      when(cv.isNotNull, zip_with(v, cv, (x, y) => x - y))
    }
}
