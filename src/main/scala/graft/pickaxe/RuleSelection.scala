package graft.pickaxe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rule-set selection (S6/S7, rules.py:28-439): pick a subset of rules
  * by mapped-reaction coverage — counts join + cumulative-coverage
  * window + regex include/exclude — as one declarative plan.
  */
object RuleSelection {

  /** @param rules    (Name, Reactants, SMARTS, Products) rule catalog
    * @param coverage (Name, Reaction) mapping rows (one per reaction a
    *                 rule maps; rules.py:105-110 groups + counts these)
    * @param fractionCoverage stop at the first rule whose cumulative
    *                 share of mapped reactions reaches this (bisect_right
    *                 semantics: the crossing rule IS included)
    * @param nRules   hard top-n cut (applied instead of fraction if set)
    * @param excludeSmarts drop rules whose SMARTS matches (anaerobic =
    *                 exclude O2-consuming patterns, rules.py:123-128)
    * @param includeSmarts keep only matching rules (rules.py:130-150)
    */
  def select(
      rules: DataFrame,
      coverage: DataFrame,
      fractionCoverage: Option[Double] = None,
      nRules: Option[Int] = None,
      excludeSmarts: Option[String] = None,
      includeSmarts: Option[String] = None): DataFrame = {
    val counts = coverage.groupBy("Name")
      .agg(count(lit(1)).as("counts"))
    // INNER join: rules with no mapped reactions are dropped, like the
    // reference's merge (rules.py:164-167 — 1224 TSV rows -> 1216 rules)
    var r = rules.join(counts, Seq("Name"))
    for (pat <- excludeSmarts) r = r.where(!col("SMARTS").rlike(pat))
    for (pat <- includeSmarts) r = r.where(col("SMARTS").rlike(pat))

    val ord = Seq(col("counts").desc, col("Name").asc)
    val cut = (nRules, fractionCoverage) match {
      case (Some(n), _) => r.orderBy(ord: _*).limit(n)
      case (_, Some(f)) =>
        val running = Window.orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val total = Window.orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        r.withColumn("cdf", sum("counts").over(running) /
            sum("counts").over(total))
          .withColumn("prev_cdf",
            coalesce(lag("cdf", 1).over(Window.orderBy(ord: _*)), lit(0.0)))
          // keep every rule that starts below the target fraction — the
          // rule crossing the threshold is included (bisect_right)
          .where(col("prev_cdf") < f)
          .drop("prev_cdf")
      case _ => r.orderBy(ord: _*)
    }
    cut
  }

  /** S7 (metacyc_intermediate, rules.py:286-439): intermediate rules are
    * kept when their name extends a kept generalized rule's name
    * (prefix containment, rules.py:358-372 — e.g. `rule0001_02` under
    * `rule0001`), then ordered by mapped-reaction counts descending.
    * The intermediate rule data file is not shipped with the reference;
    * the machinery is data-independent.
    */
  def intermediate(
      intermediateRules: DataFrame, // Name, SMARTS, ... + counts column
      generalizedSelection: DataFrame // output of select(): Name, ...
  ): DataFrame = {
    val kept = generalizedSelection.select(col("Name").as("gen_name"))
    intermediateRules.join(broadcast(kept),
        col("Name").startsWith(concat(col("gen_name"), lit("_"))) ||
          col("Name") === col("gen_name"))
      .drop("gen_name")
      .dropDuplicates("Name")
      .orderBy(col("counts").desc, col("Name").asc)
  }
}
