package graft.queries

/** LLM-training-data pipeline operators (dedup, similarity search,
  * text analysis, multimodal plumbing) over the `documents` and
  * `embeddings` fixtures. Filled in incrementally.
  */
object Extensions {
  def queries: Seq[Q] = Seq.empty
}
