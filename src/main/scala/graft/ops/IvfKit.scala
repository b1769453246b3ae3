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
  * equivalence pin honest. */
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

  /** Centroids ranked per row as a sorted struct array — cosine DESC,
    * centroid id ASC on ties (struct sort on (cos, -id) DESC): a pure
    * narrow map, no corpus×centroids join. */
  def ranked(cents: Seq[(Long, Seq[Double])], v: Column): Column =
    sort_array(array(cents.map { case (cid, cv) =>
      struct(cosine(v, typedlit(cv)).as("c"), lit(-cid).as("nid"))
    }: _*), asc = false)

  /** Residual v − c(assigned list), branch-free per centroid. */
  def residual(cents: Seq[(Long, Seq[Double])], listId: Column,
               v: Column): Column =
    cents.map { case (cid, cv) =>
      when(listId === cid, zip_with(v, typedlit(cv), (x, y) => x - y))
    }.reduce(coalesce(_, _))
}
