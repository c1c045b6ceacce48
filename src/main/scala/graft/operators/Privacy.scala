package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits for release/training-data governance: k-anonymity
  * and l-diversity profiles over quasi-identifier (QI) columns, plus a
  * one-pass generalization ladder that finds the coarsest-necessary
  * bucketing of a numeric QI.
  *
  * Reference cousin: the PII scrub pass (TextOps.scrubProjection) removes
  * direct identifiers from free text; these audits quantify the
  * RE-IDENTIFICATION risk that remains in structured columns — the
  * Sweeney (2002) k-anonymity / Machanavajjhala (2007) l-diversity
  * measures a dataset release gate computes before publication.
  *
  * Scale shape: every audit is one hash groupBy over the QI columns
  * followed by a one-row (or ladder-sized) reduce — map-side combined,
  * no window, no self-join, no driver materialization beyond the report
  * itself. All metrics are integer-exact (counts and LONG bucket keys),
  * so a SQL oracle reproduces the verdicts bit for bit.
  */
object Privacy {

  /** k-anonymity profile: group the table by its quasi-identifiers and
    * report the equivalence-class statistics. One row:
    * (k_anonymity, n_classes, n_rows, classes_at_risk, rows_at_risk)
    * where "at risk" = classes smaller than `k` (the release threshold).
    * k_anonymity is the classical measure: the size of the SMALLEST
    * equivalence class — an attacker who knows a row's QI values can
    * narrow it to at least k_anonymity candidate rows.
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity: no quasi-identifier columns")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"))
      .agg(
        min("sz").as("k_anonymity"),
        count(lit(1)).as("n_classes"),
        sum("sz").as("n_rows"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_at_risk"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .as("rows_at_risk"))
  }

  /** l-diversity profile: within each QI equivalence class, how many
    * DISTINCT values of the sensitive attribute appear. A class with
    * l = 1 leaks the sensitive value outright (homogeneity attack) even
    * when it is k-anonymous. One row:
    * (l_diversity, n_classes, classes_below_l, rows_below_l).
    */
  def lDiversity(
      df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversity: no quasi-identifier columns")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
      .agg(
        min("ldiv").as("l_diversity"),
        count(lit(1)).as("n_classes"),
        sum(when(col("ldiv") < l, 1L).otherwise(0L)).as("classes_below_l"),
        sum(when(col("ldiv") < l, col("sz")).otherwise(0L))
          .as("rows_below_l"))
  }

  /** Floor-division bucket key, portable across engines for NEGATIVE
    * values: Spark's integer `div` truncates toward zero while a floor
    * semantics is wanted (bucket of -1 at width 10 must be -1, not 0),
    * so derive it as (v - pmod(v, w)) / w — pmod is the always-positive
    * remainder, making the numerator an exact multiple of w. The SQL
    * oracle twin is (v - ((v % w + w) % w)) / w.
    */
  def floorBucket(v: Column, width: Long): Column =
    ((v - pmod(v, lit(width))) / width).cast("long")

  /** One-pass generalization ladder: audit EVERY candidate bucket width
    * for a numeric QI in a single shuffle, and mark the coarsest level
    * actually needed. Each input row explodes into one row per ladder
    * level (bounded fan-out: |widths|, typically ≤ 8); one groupBy over
    * (level, fixed QIs, bucket) computes all equivalence classes of all
    * levels together; a ladder-sized reduce profiles each level. The
    * `chosen` flag marks the SMALLEST width whose k_anonymity reaches
    * `k` — the least-generalized release that passes, found without
    * re-scanning the table per level (the naive ladder re-aggregates
    * once per width; at 100 TB that is |widths| full scans vs one).
    *
    * Output: one row per level, ordered by width:
    * (width, n_classes, k_anonymity, classes_at_risk, rows_at_risk,
    *  satisfies, chosen).
    */
  def generalizationLadder(
      df: DataFrame, fixedQiCols: Seq[String], numCol: Column,
      widths: Seq[Long], k: Long): DataFrame = {
    require(widths.nonEmpty && widths.forall(_ > 0),
      "generalizationLadder: widths must be positive")
    require(widths == widths.sorted && widths.distinct == widths,
      "generalizationLadder: widths must be strictly increasing")
    val leveled = df
      .select(fixedQiCols.map(col) :+ numCol.cast("long").as("__v"): _*)
      .withColumn("__w", explode(array(widths.map(lit): _*)))
    // the bucket uses the per-row exploded width, so it is derived as a
    // column (same floor-div identity as [[floorBucket]]) not a constant
    val bucketed = leveled.withColumn("__b",
      ((col("__v") - pmod(col("__v"), col("__w"))) / col("__w"))
        .cast("long"))
    val sizes = bucketed
      .groupBy((col("__w") +: fixedQiCols.map(col)) :+ col("__b"): _*)
      .agg(count(lit(1)).as("sz"))
    val perLevel = sizes.groupBy(col("__w").as("width"))
      .agg(
        count(lit(1)).as("n_classes"),
        min("sz").as("k_anonymity"),
        sum(when(col("sz") < k, 1L).otherwise(0L)).as("classes_at_risk"),
        sum(when(col("sz") < k, col("sz")).otherwise(0L))
          .as("rows_at_risk"))
      .withColumn("satisfies", col("k_anonymity") >= k)
    // chosen = smallest satisfying width. The reduce output is
    // ladder-sized, so the 1-row argmin broadcast-joins back for free —
    // no unpartitioned window (keeps the plan-audit window rule intact).
    val best = perLevel.agg(
      min(when(col("satisfies"), col("width"))).as("__best"))
    perLevel.join(broadcast(best))
      .withColumn("chosen",
        col("__best").isNotNull && col("width") === col("__best"))
      .drop("__best")
      .orderBy("width")
  }
}
