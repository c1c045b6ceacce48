package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.chem.{Formula, Smiles}
import graft.expressions.BitTanimoto

/** Diagnostic: distribution of gen-1 target similarities under the
  * current path fingerprint, around the 0.5 cutoff of the 436-pin
  * test (test_filters.py:55). If the mass sits near 0.5, exact
  * RDKFingerprint hash parity decides the pin; if bimodal, the gap
  * is structural.
  */
object SimDistDiag {
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
    val target = lines(s"$dataDir/test_filter_targets.csv")
      .tail.head.split(",")(1).trim

    import spark.implicits._
    val st = engine.run(starts, generations = 1)
    val gen1 = st.compounds.where("Generation = 1 AND Type = 'Predicted'")
      .select("SMILES").as[String].collect()
    val tFp = BitTanimoto.pack(
      Formula.fingerprint(Smiles.parse(target)), 2048)
    def sim(s: String) = BitTanimoto.tanimoto(
      BitTanimoto.pack(Formula.fingerprint(Smiles.parse(s)), 2048), tFp)
    val sims = gen1.map(s => (sim(s), s)).sortBy(-_._1)
    println(s"[sim] gen1=${gen1.length} " +
      s"ge0.5=${sims.count(_._1 >= 0.5)} " +
      s"ge0.3=${sims.count(_._1 >= 0.3)}")
    val hist = sims.groupBy(t => (t._1 * 10).toInt / 10.0)
      .view.mapValues(_.length).toSeq.sorted
    println(s"[sim] histogram: " +
      hist.map { case (b, k) => f"$b%.1f=$k" }.mkString(", "))
    sims.take(45).foreach { case (v, s) =>
      println(f"[sim] $v%.3f ${s.take(90)}")
    }
    // also: the starts themselves (gen-0 filter pass)
    val s0 = starts.map { s =>
      val canon = Smiles.write(graft.chem.Chem.neutralize(Smiles.parse(s)))
      (sim(canon), s)
    }
    println("[sim] gen0: " + s0.map { case (v, s) =>
      f"$v%.2f ${s.take(30)}" }.mkString(" | "))
    spark.stop()
  }
}
