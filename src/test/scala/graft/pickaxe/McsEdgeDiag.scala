package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.chem.{MCS, Smiles}

/** Diagnostic for the 383-vs-382 MCS parity one-off
  * (test_filters.py:219): run the MCS-filtered expansion the way
  * MCSFilter does, and report every frontier compound whose best
  * target score lands NEAR its generation's threshold — the knife-edge
  * set. The reference blocks exactly one compound we keep, so the
  * divergent molecule is the kept compound closest above the cut.
  */
object McsEdgeDiag {
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
    val tMol = Smiles.parse(target)

    import spark.implicits._
    val thresholds = Seq(0.1, 0.5)
    val st = engine.run(starts, generations = 2,
      filters = Seq(MCSFilter(Seq(target), thresholds)))
    println(s"[diag] filtered run total = ${st.compounds.count()}")
    (1 to 2).foreach { gen =>
      val crit = thresholds(math.min(gen, thresholds.length - 1))
      val frontier = st.compounds
        .where(s"Generation = $gen AND Type = 'Predicted'")
        .select("SMILES").as[String].collect()
      println(s"[diag] gen $gen: ${frontier.length} predicted, crit=$crit")
      val scored = frontier.map { smi =>
        val m = Smiles.parse(smi)
        (smi, MCS.mcsScore(m, tMol, 20000))
      }
      scored.filter { case (_, s) => math.abs(s - crit) < 0.06 }
        .sortBy(_._2)
        .foreach { case (smi, s) =>
          val m = Smiles.parse(smi).withoutExplicitH
          val (at, bo) = MCS.mcsSize(m, tMol, 20000)
          // budget-stability audit: a 10x budget must not change the
          // answer, or the knife-edge verdicts are budget artifacts
          val (at2, bo2) = MCS.mcsSize(m, tMol, 5000000)
          val stable = if (at == at2 && bo == bo2) "stable"
            else s"UNSTABLE(10x: $at2/$bo2)"
          println(f"[diag]   score=$s%.4f atoms=$at bonds=$bo " +
            f"$stable n=${m.n} smiles=$smi")
        }
    }
    val t = tMol.withoutExplicitH
    println(s"[diag] target: n=${t.n} bonds=${t.bonds.length} $target")
    spark.stop()
  }
}
