package graft.ops

/** Word n-gram SQL expressions over a `toks` (ARRAY<STRING>) column —
  * single-sourced so the Gopher quality rules (x81), boilerplate span
  * detection (x82), and the text-operator scale probe count EXACTLY
  * the same grams (a drifted copy would silently diverge the graded
  * query from its probe). Space-joined, positional order.
  *
  * Callers must pre-filter `size(toks) >= n`: `sequence(n, size)`
  * runs DESCENDING when size < n and would fabricate reversed grams.
  */
object TextGrams {
  val WordBigramExpr: String =
    "transform(sequence(2, size(toks)), i -> " +
    "concat(element_at(toks, i-1), ' ', element_at(toks, i)))"
  val WordTrigramExpr: String =
    "transform(sequence(3, size(toks)), i -> " +
    "concat(element_at(toks, i-2), ' ', element_at(toks, i-1), ' ', " +
    "element_at(toks, i)))"
}
