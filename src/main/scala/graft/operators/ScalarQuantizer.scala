package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third compression point on the ANN
  * memory/recall curve beside PQ (ProductQuantizer) and IVF-PQ: one
  * byte per DIMENSION (vs PQ's one byte per SUBSPACE), no codebook
  * training, distances exact on the 256-level grid. FAISS calls this
  * index family `SQ8`; it is the standard first step down from float32
  * (4x smaller, near-lossless recall) before PQ's more aggressive 32x.
  *
  * Everything stays on the pack's quantized-integer grid
  * (`VectorOps.quantize`), so codes and distances are bit-identical to
  * the DuckDB oracle:
  *   code[i] = ((qe[i] - mn[i]) * 255) div max(1, mx[i] - mn[i])
  * with per-dimension min/max from one map-side-combined aggregation
  * broadcast back as a single row.
  */
object ScalarQuantizer {

  val Levels = 255L

  /** Per-dimension [min, max] of the corpus as ONE row with two
    * position-ordered arrays (`mns`, `mxs`) — a posexplode + dim-keyed
    * min/max (exact integer partials, order-independent) folded into
    * arrays. The result is bytes-sized (2 longs per dimension):
    * broadcast it.
    */
  def stats(e: DataFrame, vecCol: String = "qe"): DataFrame =
    e.select(posexplode(col(vecCol)).as(Seq("__graft_pos", "__graft_x")))
      .groupBy("__graft_pos")
      .agg(min("__graft_x").as("__graft_mn"),
        max("__graft_x").as("__graft_mx"))
      .agg(collect_list(struct(col("__graft_pos"), col("__graft_mn"),
        col("__graft_mx"))).as("__graft_s"))
      .select(
        expr("transform(array_sort(__graft_s), p -> p.__graft_mn)")
          .as("mns"),
        expr("transform(array_sort(__graft_s), p -> p.__graft_mx)")
          .as("mxs"))

  /** Append `codeCol`: the SQ8 code array (one 0..255 long per
    * dimension). `st` must be the 1-row [[stats]] frame; it rides a
    * broadcast cross join, the encode itself is a codegen'd transform.
    *
    * Values inside the stats grid land on exactly
    * `((x - mn) * 255) div max(1, mx - mn)` — the formula the DuckDB
    * oracles replay; the outer clamp only fires for OUT-OF-GRID values
    * (vectors appended after the grid froze, the
    * [[VectorIndex.appendSq8]] contract), which must still code to a
    * valid byte instead of escaping the codebook range.
    */
  def encode(
      e: DataFrame, st: DataFrame, vecCol: String = "qe",
      codeCol: String = "code"): DataFrame =
    e.crossJoin(broadcast(st))
      .withColumn(codeCol, expr(
        s"transform($vecCol, (x, i) -> greatest(0L, least($Levels, " +
          s"((x - mns[i]) * $Levels) div " +
          "greatest(1L, mxs[i] - mns[i]))))"))
      .drop("mns", "mxs")

  /** Exact squared L2 between two code arrays (<= 255^2 * dim — far
    * inside long range).
    */
  def sqDist(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "0L, (acc, v) -> acc + v)")
}
