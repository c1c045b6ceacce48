package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan over the synthetic tables plus
  * (when SQL-expressible) an equivalent DuckDB oracle. `surveyIds` ties the
  * query back to SURVEY.md §2's operator inventory.
  */
final case class GraftQuery(
    name: String,
    surveyIds: Seq[String],
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryPack {
  def queries: Seq[GraftQuery]
}

/** All registered query packs; SparkEntry derives its maps from here. */
object Registry {
  lazy val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TextQueries,
    SimilarityQueries,
    PipelineQueries,
    PickaxeQueries,
    GovernanceQueries)

  lazy val all: Seq[GraftQuery] = {
    val qs = packs.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
