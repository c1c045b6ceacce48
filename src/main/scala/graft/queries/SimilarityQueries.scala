package graft.queries

/** Embedding similarity-search query pack over the `embeddings` table. */
object SimilarityQueries extends QueryPack {
  override def queries: Seq[GraftQuery] = Seq()
}
