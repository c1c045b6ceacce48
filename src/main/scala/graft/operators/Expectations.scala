package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation pass a
  * production table runs before anything consumes it (the
  * Deequ / Great Expectations capability): each rule declares a
  * constraint, evaluation computes every scalar metric in ONE
  * aggregate over ONE scan (completeness, uniqueness, ranges all ride
  * the same map-side-combined pass), and referential rules add one
  * LEFT ANTI join each against their parent table. Output is one row
  * per rule: (rule, column, metric, threshold, pass) — integer-exact
  * metrics, so a gate oracle reproduces the verdicts bit for bit.
  */
object Expectations {

  sealed trait Rule { def name: String; def column: String }
  /** Fraction of NULLs must be 0. */
  final case class NotNull(column: String) extends Rule {
    val name = "not_null"
  }
  /** Column values must be globally unique. */
  final case class Unique(column: String) extends Rule {
    val name = "unique"
  }
  /** min(column) >= lo AND max(column) <= hi (inclusive, long). */
  final case class InRange(column: String, lo: Long, hi: Long)
      extends Rule { val name = "in_range" }
  /** Every non-null child value exists in parent's key column. */
  final case class ForeignKey(
      column: String, parent: DataFrame, parentCol: String)
      extends Rule { val name = "foreign_key" }

  /** Evaluate all rules. Scalar rules share one aggregate; each
    * ForeignKey adds one anti-join count. Returns
    * (rule, col_name, violations, pass) — `violations` is the count
    * of offending rows (not-null: nulls; unique: duplicate rows;
    * in_range: out-of-range rows; foreign_key: orphans), so
    * pass == (violations == 0) uniformly. The per-rule scalars (one
    * long each) land on the driver — the report is rule-sized by
    * definition; the scans stay distributed.
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    require(rules.nonEmpty, "check: no rules")
    val scalarAggs: Seq[(Rule, Column)] = rules.collect {
      case r @ NotNull(c) =>
        r -> sum(when(col(c).isNull, 1L).otherwise(0L))
      case r @ Unique(c) =>
        r -> (count(col(c)) - countDistinct(col(c)))
      case r @ InRange(c, lo, hi) =>
        r -> sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
    }
    val scalarRows: Seq[(String, String, Long)] =
      if (scalarAggs.isEmpty) Seq.empty
      else {
        val row = df.agg(scalarAggs.head._2,
          scalarAggs.tail.map(_._2): _*).head()
        scalarAggs.zipWithIndex.map { case ((r, _), i) =>
          (r.name, r.column,
            if (row.isNullAt(i)) 0L else row.getLong(i))
        }
      }
    val fkRows: Seq[(String, String, Long)] = rules.collect {
      case ForeignKey(c, parent, pc) =>
        val orphans = df.select(col(c)).where(col(c).isNotNull)
          .join(parent.select(col(pc).as(c)), Seq(c), "left_anti")
          .count()
        ("foreign_key", c, orphans)
    }
    import spark.implicits._
    (scalarRows ++ fkRows).toDF("rule", "col_name", "violations")
      .withColumn("pass", col("violations") === 0L)
  }
}
