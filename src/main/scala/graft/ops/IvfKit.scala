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
  * Expression SHAPE matters at scale: the original formulation
  * unrolled one cosine-fold subtree PER CENTROID into the projection,
  * and Catalyst's runtime common-subexpression elimination
  * (EquivalentExpressions) does pairwise deep-equals over every
  * subtree — quadratic in nLists·dim, measured LIVELOCKING task setup
  * at nLists=16, dim=64 (round 15, StagedRebuildProbe). The
  * formulation here carries the centroid set as ONE array literal and
  * ranks with a single higher-order `transform` lambda, so the
  * expression tree is O(1) in nLists and the per-row work is the same
  * arithmetic in the same left-to-right fold order — byte-identical
  * results (pinned by the unchanged x12/x75/x78/x86 oracles), at any
  * list count. */
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

  /** The centroid set as one array<struct<id, vec>> literal — a single
    * leaf in the expression tree however many lists the index has. */
  private def centsLit(cents: Seq[(Long, Seq[Double])]): Column =
    typedlit(cents.map { case (cid, cv) => (cid, cv) })

  /** Centroids ranked per row as a sorted struct array — cosine DESC,
    * centroid id ASC on ties (struct sort on (cos, -id) DESC): a pure
    * narrow map, no corpus×centroids join, O(1)-in-nLists expression
    * size. Arithmetic order matches [[cosine]](v, centroid) exactly:
    * dot folds v·c left-to-right, the norm product is ‖v‖·‖c‖. */
  def ranked(cents: Seq[(Long, Seq[Double])], v: Column): Column =
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

  /** Residual v − c(assigned list): one array lookup by list id, not a
    * per-centroid branch chain. An unknown list id yields NULL (the
    * old coalesce chain's semantics); `filter` + `try_element_at`
    * stays NULL-safe under ANSI. */
  def residual(cents: Seq[(Long, Seq[Double])], listId: Column,
               v: Column): Column = {
    val cv = try_element_at(
      filter(centsLit(cents), c => c.getField("_1") === listId),
      lit(1)).getField("_2")
    when(cv.isNotNull, zip_with(v, cv, (x, y) => x - y))
  }
}
