package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based per-group quantile bucketing — the documented
  * memory-scale swap for the exact window path (q_text_quantile's
  * cume_dist over a per-lang sort): per-group cut points from ONE
  * aggregation of mergeable Greenwald-Khanna sketches
  * (`percentile_approx` — partial sketches combine map-side, so no
  * group ever needs its rows co-resident or sorted), broadcast back,
  * and bucket assignment by comparison in a projection.
  *
  * Cost shape at 100 TB: the exact path hash-shuffles and SORTS every
  * row of a group into one task's window (a hot language = half the
  * corpus on one task); this path's only shuffle is the k-groups
  * aggregation of constant-size sketch partials, and assignment is
  * embarrassingly parallel. The trade is exactness at bucket EDGES
  * only: a row within `1/accuracy` rank-fraction of a cut can land one
  * bucket off (GK guarantee); bucket membership away from edges is
  * exact. Ties across an edge follow value order (a tie-run lands in
  * ONE bucket — cume_dist puts a tie-run in one bucket too).
  *
  * Reference analog: the per-generation similarity-threshold sampling
  * windows (similarity_sampling.py) rank by score per generation; this
  * is the bounded-memory form of the same "keep the top X% per group"
  * shape.
  */
object Quantiles {

  /** Append a `bucket` column (0 .. buckets-1) to `df`: the value
    * column's per-`groupCol` quantile bucket. Rows with a null value
    * get a null bucket (they have no rank); a group too small to fill
    * every bucket uses the buckets its cut points define.
    *
    * @param accuracy GK accuracy knob (rank error <= 1/accuracy); the
    *                 default 10000 bounds each sketch partial to a few
    *                 KB while placing edges within 0.01% rank
    */
  /** Per-group GK-sketch cut points: (groupCol, __graft_cuts) with
    * buckets-1 interior quantile values per group — the broadcastable
    * table both [[quantileBuckets]] and the streaming bucket scorer
    * (`StreamingOps.qualityBucketStream`) join against.
    */
  def cutPoints(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      buckets: Int = 10,
      accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val ps = (1 until buckets).map(i => i / buckets.toDouble)
    df.where(col(valueCol).isNotNull)
      .groupBy(groupCol)
      .agg(expr(s"percentile_approx($valueCol, " +
        s"array(${ps.mkString(",")}), $accuracy)").as("__graft_cuts"))
  }

  /** Append a `bucket` column via a broadcast join against
    * [[cutPoints]]. The cut table is BROADCAST, so `groupCol` must be
    * low-cardinality (languages, generations, sources — the documented
    * uses); a high-cardinality group column makes the cut table itself
    * large and belongs in a plain shuffled join, not this operator.
    * The bucket comparison uses the Column-API `filter` lambda — no
    * SQL-string interpolation, so a value column named `c` (or one
    * needing backticks) resolves correctly.
    */
  def quantileBuckets(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      buckets: Int = 10,
      accuracy: Int = 10000): DataFrame = {
    require(!df.columns.contains("__graft_cuts"),
      "quantileBuckets: input already has a __graft_cuts column")
    val cuts = cutPoints(df, groupCol, valueCol, buckets, accuracy)
    df.join(broadcast(cuts), Seq(groupCol), "left")
      .withColumn("bucket",
        when(col(valueCol).isNull, lit(null))
          .otherwise(size(filter(col("__graft_cuts"),
            c => c < col(valueCol)))))
      .drop("__graft_cuts")
  }
}
