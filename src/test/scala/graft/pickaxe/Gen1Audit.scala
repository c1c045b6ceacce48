package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic (test scope): per-rule / per-generation reaction and
  * product counts for the filter fixture, plus the full gen-1 product
  * list — small enough (9 substrates x 10 generic rules) to audit by
  * hand against RDKit RunReactants semantics when chasing the
  * 1860-vs-1740 count divergence (test_filters.py:122).
  */
object Gen1Audit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dataDir = "/root/reference/tests/data/test_filters"
    def lines(p: String) = Files.readAllLines(Paths.get(p)).asScala.toSeq
    val core = PickaxeEngine.parseCoreactants(
      lines(s"$dataDir/metacyc_coreactants.tsv"))
    val rules = PickaxeEngine.parseRules(
      lines(s"$dataDir/test_filter_rules.tsv"), core)
    val engine = new PickaxeEngine(spark, rules, core)
    val starts = lines(s"$dataDir/test_filter_compounds.csv")
      .tail.filter(_.trim.nonEmpty).map(_.split(",")(1).trim)
    val st = engine.run(starts, generations = 2)
    import spark.implicits._

    val cpdGen = st.compounds.select("_id", "Generation", "Type", "SMILES")
      .as[(String, Long, String, String)].collect()
    val genOf = cpdGen.map(t => t._1 -> t._2).toMap
    val smilesOf = cpdGen.map(t => t._1 -> t._4).toMap

    // per reaction: operator, products, and the generation = max gen
    // of its products
    val rxns = st.reactions
      .select(col("Operators"), col("Products"), col("SMILES_rxn"))
      .as[(Seq[String], Seq[(Int, String)], String)].collect()

    println(s"[g1] compounds by (gen, type): " +
      cpdGen.groupBy(t => (t._2, t._3)).view.mapValues(_.length)
        .toSeq.sortBy(_._1).mkString(", "))

    def rxnGen(ps: Seq[(Int, String)]): Long =
      ps.map(p => genOf.getOrElse(p._2, 0L)).max

    for (g <- 1 to 2) {
      val inGen = rxns.filter(r => rxnGen(r._2) == g)
      val byOp = inGen.flatMap(r => r._1.map(_ -> r))
        .groupBy(_._1).view.mapValues(_.length).toSeq.sorted
      println(s"[g1] gen$g reactions=${inGen.length} byOp: " +
        byOp.map { case (o, k) => s"$o=$k" }.mkString(", "))
      // distinct NEW products born in this generation per op
      val newCpd = cpdGen.filter(t => t._2 == g && t._3 == "Predicted")
        .map(_._1).toSet
      val bornBy = inGen.flatMap { r =>
        r._2.collect { case (_, pid) if newCpd(pid) =>
          r._1.map(_ -> pid)
        }.flatten
      }.distinct.groupBy(_._1).view.mapValues(_.length).toSeq.sorted
      println(s"[g1] gen$g newPredicted=${newCpd.size} byOp(first-born " +
        s"multi-credit): " +
        bornBy.map { case (o, k) => s"$o=$k" }.mkString(", "))
    }

    // full gen-1 product dump, grouped by substrate for hand-audit
    val gen1 = rxns.filter(r => rxnGen(r._2) == 1)
    println(s"[g1] ---- gen-1 reactions (${gen1.length}) ----")
    gen1.sortBy(r => (r._1.mkString, r._3)).foreach { r =>
      println(s"[g1] ${r._1.mkString("/")}: ${r._3.take(220)}")
    }
    spark.stop()
  }
}
