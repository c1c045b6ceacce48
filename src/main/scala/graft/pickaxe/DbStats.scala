package graft.pickaxe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Network-statistics data prep — the aggregations behind the
  * reference's `Scripts/db_plots.py` (violin/box property comparison
  * :11-51, fingerprint-prevalence heatmap :54-73). The matplotlib
  * rendering is out of scope; what the script actually computes is:
  * per-Type property distributions of non-coreactant compounds, and
  * per-generation fingerprint-bit prevalence normalized by the
  * generation's max, top-N bits by cross-generation range.
  *
  * Spark-first shape: the script streams every compound document
  * through a Mongo cursor into a driver-side pandas frame; here the
  * property profile is ONE unpivot + map-side-combined aggregate (a
  * group per (Type, property), never raw rows on the driver) and the
  * heatmap is explode → two small aggregates with the per-generation
  * max and per-bit range both broadcast back — at 100 TB the only
  * full-data passes are the scan and one shuffle each.
  */
object DbStats {

  /** Annotate the chemistry properties the plots use (db_plots.py:11:
    * Mass, logP, NP_likeness). One sanctioned chemistry UDF parsing
    * each SMILES once for both scores; Mass rides the row.
    */
  def withProperties(compounds: DataFrame): DataFrame = {
    val props = udf { (smiles: String) =>
      val m = graft.chem.Smiles.parse(smiles)
      (graft.chem.Formula.logPEstimate(m), graft.chem.NPScore.score(m))
    }
    compounds
      .withColumn("p", props(col("SMILES")))
      .withColumn("logP", col("p._1"))
      .withColumn("NP_likeness", round(col("p._2"), 6))
      .drop("p")
  }

  /** Box-plot statistics per (Type, property) over non-coreactant
    * compounds (make_box_plots' data frame, summarized): exact
    * five-number summary + count. `percentile` is the exact sort-based
    * aggregate (deterministic under any partitioning); swap to
    * percentile_approx for a 100 TB profile where ±ε quantiles are
    * acceptable at a fraction of the shuffle.
    */
  def propertyBox(compounds: DataFrame): DataFrame = {
    val longForm = withProperties(compounds)
      .where(col("Type") =!= "Coreactant") // db_plots.py:16
      .select(col("Type"), expr(
        "stack(3, 'Mass', Mass, 'logP', logP, " +
          "'NP_likeness', NP_likeness) AS (prop, value)"))
    longForm
      .groupBy("Type", "prop")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.0)"), 4).as("min"),
        round(expr("percentile(value, 0.25)"), 4).as("q1"),
        round(expr("percentile(value, 0.5)"), 4).as("median"),
        round(expr("percentile(value, 0.75)"), 4).as("q3"),
        round(expr("percentile(value, 1.0)"), 4).as("max"))
  }

  /** Fingerprint-prevalence heatmap data (make_fp_heatmap): for each
    * generation, count compounds setting each fingerprint bit,
    * normalize by the generation's max bit count, rank bits by
    * (max − min) normalized prevalence across generations, keep the
    * top `nRows`. Returns (bit, Generation, prevalence) long-form —
    * the heatmap cell values.
    */
  def fpPrevalence(compounds: DataFrame, nRows: Int = 25): DataFrame = {
    val bitsOf = udf { (smiles: String) =>
      graft.chem.Formula.fingerprint(graft.chem.Smiles.parse(smiles))
    }
    val counts = compounds
      .where(col("Generation") >= 0) // script: int(Generation) > -1
      .select(col("Generation"),
        explode(bitsOf(col("SMILES"))).as("bit"))
      .groupBy("Generation", "bit")
      .agg(count(lit(1)).as("cnt"))
    // normalize by the generation's max bit count (df.div(df.max))
    val genMax = counts.groupBy("Generation")
      .agg(max("cnt").as("mx"))
    val norm = counts
      .join(broadcast(genMax), Seq("Generation"))
      .withColumn("prevalence", round(col("cnt") / col("mx"), 6))
    // range = max − min across generations; ABSENT generations count
    // as 0 like the pandas frame's NaN→fillna-free max/min over
    // columns... pandas max/min skip NaN, so range uses PRESENT
    // generations only — mirror that exactly.
    val top = norm.groupBy("bit")
      .agg((max("prevalence") - min("prevalence")).as("range"))
      .orderBy(desc("range"), asc("bit")) // deterministic tie-break
      .limit(nRows)
    norm.join(broadcast(top.select("bit")), Seq("bit"))
      .select("bit", "Generation", "prevalence")
  }
}
