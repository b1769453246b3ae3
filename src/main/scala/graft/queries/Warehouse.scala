package graft.queries

/** The reference's own warehouse surface (SURVEY.md §2.2, §2.4-§2.7)
  * re-expressed as oracle-checkable batch queries over the `events`
  * fixture. Filled in incrementally; every entry lands in Registry.all.
  */
object Warehouse {
  def queries: Seq[Q] = Seq.empty
}
