package graft.queries

/** Text-analysis / dedup query pack over the `documents` table — filled by
  * graft.operators.{TextAnalysis, Dedup}. See SURVEY.md §2 + the
  * training-data-pipeline extensions.
  */
object TextQueries extends QueryPack {
  override def queries: Seq[GraftQuery] = Seq()
}
