package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for algebraic aggregates — the
  * materialized-view refresh that never rescans the base table: keep a
  * keyed STATE table of mergeable partials (sum/count/min/max, avg as
  * its (sum, count) pair), fold each arriving delta batch into it with
  * one delta-sized aggregate + one state-keyed combine, and finalize
  * on read. `merge(state, aggState(delta))` equals
  * `aggState(base ∪ delta)` exactly when the partials are integers —
  * the associativity/commutativity IVM rests on — so an incremental
  * refresh is bit-identical to a full recompute (q_agg_incremental
  * gates exactly that equality against a full-scan oracle).
  *
  * Insert-only deltas: min/max are not retractable partials (a delete
  * would need a rescan of the survivors); retractable sum/count under
  * deletes is the CDC-merge + re-aggregate path (`Merge.cdcMerge`).
  *
  * At 100 TB the state table is |keys|-sized and partitions by key;
  * each refresh shuffles only the delta and the state — never the
  * accumulated base.
  */
object Ivm {

  /** Supported spec values: "sum", "count", "min", "max", "avg".
    *
    * NOTE: "count" is SQL `count(col)` — null-skipping — NOT
    * `count(*)`. To maintain a row count, spec "count" on a column
    * that is never null (a key); only then does the partial equal
    * `count(*)` of the batch.
    */
  private def partial(fn: String, c: String) = fn match {
    case "sum"   => Seq(sum(col(c)).as(s"${c}__sum"))
    case "count" => Seq(count(col(c)).as(s"${c}__count"))
    case "min"   => Seq(min(col(c)).as(s"${c}__min"))
    case "max"   => Seq(max(col(c)).as(s"${c}__max"))
    case "avg"   => Seq(sum(col(c)).as(s"${c}__sum"),
      count(col(c)).as(s"${c}__cnt"))
    case other   => throw new IllegalArgumentException(
      s"Ivm supports sum/count/min/max/avg, got: $other")
  }

  private def combine(fn: String, c: String) = fn match {
    case "sum"   => Seq(sum(col(s"${c}__sum")).as(s"${c}__sum"))
    case "count" => Seq(sum(col(s"${c}__count")).as(s"${c}__count"))
    case "min"   => Seq(min(col(s"${c}__min")).as(s"${c}__min"))
    case "max"   => Seq(max(col(s"${c}__max")).as(s"${c}__max"))
    case "avg"   => Seq(sum(col(s"${c}__sum")).as(s"${c}__sum"),
      sum(col(s"${c}__cnt")).as(s"${c}__cnt"))
    case other   => throw new IllegalArgumentException(other)
  }

  /** Aggregate a batch into its keyed partial-state table. */
  def aggState(
      df: DataFrame, keys: Seq[String],
      specs: Seq[(String, String)]): DataFrame = {
    val aggs = specs.flatMap { case (c, fn) => partial(fn, c) }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a delta's state into the accumulated state (union + keyed
    * combine — both inputs already |keys|-sized).
    */
  def merge(
      state: DataFrame, delta: DataFrame, keys: Seq[String],
      specs: Seq[(String, String)]): DataFrame = {
    val aggs = specs.flatMap { case (c, fn) => combine(fn, c) }
    state.unionByName(delta)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Resolve partials to final values (avg = sum / count, one terminal
    * division; everything else passes through under its plain name).
    */
  def finalize(
      state: DataFrame, keys: Seq[String],
      specs: Seq[(String, String)]): DataFrame = {
    val outs = specs.map {
      case (c, "avg") =>
        (col(s"${c}__sum").cast("double") / col(s"${c}__cnt"))
          .as(s"${c}_avg")
      case (c, fn) => col(s"${c}__$fn").as(s"${c}_$fn")
    }
    state.select(keys.map(col) ++ outs: _*)
  }

  /** Re-combine the finest-grain state under a SUBSET of its keys —
    * the coarser-grain view derived from the state table, never the
    * base: mergeable partials make `regroup(state, S)` equal the full
    * recompute grouped by S for every S ⊆ keys. The input is
    * |finest-keys|-sized, so deriving any rollup level costs a
    * state-sized aggregate.
    */
  def regroup(
      state: DataFrame, coarserKeys: Seq[String],
      specs: Seq[(String, String)]): DataFrame = {
    val aggs = specs.flatMap { case (c, fn) => combine(fn, c) }
    if (coarserKeys.isEmpty) state.agg(aggs.head, aggs.tail: _*)
    else state.groupBy(coarserKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The full CUBE derived from the finest-grain state: one
    * state-sized [[regroup]] per of the 2^d dimension subsets, rolled-
    * up dimensions filled with the `all` sentinel (dims are emitted as
    * strings for a uniform union schema — the GROUPING-bit encoding
    * without nullable grouping columns). This is the incremental-cube
    * refresh contract: fold deltas into the finest state with
    * [[merge]] (delta-sized work), then derive EVERY grain from the
    * state (2^d × |state| work) — the base table is never rescanned,
    * which at 100 TB is the difference between a cube refresh costing
    * |delta| + 2^d·|keys| and one costing 2^d·|base|.
    *
    * NULL dimension values coalesce to the `all` sentinel (matching
    * the GROUP BY CUBE + coalesce replay this is verified against), so
    * a data-NULL and a rolled-up grain are indistinguishable in the
    * output — exactly as in the SQL replay. A real dim value EQUAL to
    * the sentinel would collide with the rollup marker; pick a
    * sentinel outside the dim domain (the `__all__` default is safe
    * for any sane dimension).
    */
  def cubeFromState(
      state: DataFrame, dims: Seq[String],
      specs: Seq[(String, String)], all: String = "__all__"): DataFrame = {
    require(dims.nonEmpty && dims.size <= 8,
      s"cubeFromState: 1..8 dims, got ${dims.size}")
    (0 until (1 << dims.size)).map { mask =>
      val keep = dims.zipWithIndex.collect {
        case (d, i) if (mask & (1 << i)) != 0 => d
      }
      val outs = dims.map { d =>
        if (keep.contains(d))
          coalesce(col(d).cast("string"), lit(all)).as(d)
        else lit(all).as(d)
      }
      val fin = finalize(regroup(state, keep, specs), keep, specs)
      fin.select(outs ++ fin.columns.filterNot(keep.contains)
        .map(col): _*)
    }.reduce(_ unionByName _)
  }
}
