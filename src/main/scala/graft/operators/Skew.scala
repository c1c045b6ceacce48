package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot aggregation keys.
  *
  * A single groupBy on a skewed key sends every row of the hot key to
  * one reduce task; at 100 TB that task is the job. For ALGEBRAIC
  * aggregates (sum/count/min/max) the classic fix is exact: spread each
  * key over `salts` sub-keys for a partial aggregate (map-side-combine
  * friendly, at most `salts` rows per key survive), then combine the
  * partials in a second, tiny aggregate.
  *
  * This complements AQE's runtime skew-JOIN splitting
  * (spark.sql.adaptive.skewJoin.enabled) — AQE does not re-balance a
  * skewed aggregation key, only join partitions; salting does.
  *
  * The salt mixes a hash of the key and value columns with the row's
  * partition-stable position (monotonically_increasing_id), so IDENTICAL
  * duplicate rows — the classic hot-key shape — still spread across
  * sub-keys instead of collapsing into one salt bucket. Both inputs
  * are deterministic for a stable input layout (why not rand(): a
  * speculative task retry would re-draw salts and double-count rows
  * under partial-output commit; mi_id re-derives from partition id +
  * row offset on retry).
  */
object Skew {

  /** Supported algebraic combine rules: partial agg -> final agg. */
  private def partialOf(fn: String, c: String): Column = fn match {
    case "sum"   => sum(col(c)).as(c)
    case "count" => count(col(c)).as(c)
    case "min"   => min(col(c)).as(c)
    case "max"   => max(col(c)).as(c)
    case other   => throw new IllegalArgumentException(
      s"saltedAgg supports sum/count/min/max, got: $other")
  }
  private def finalOf(fn: String, c: String): Column = fn match {
    case "sum" | "count" => sum(col(c)).as(c) // counts combine by summing
    case "min"           => min(col(c)).as(c)
    case "max"           => max(col(c)).as(c)
    case other           => throw new IllegalArgumentException(other)
  }

  /** Exact skew-spread equi-join for a hot-keyed BIG side against a
    * small-but-not-broadcastable dimension: every big row takes one
    * deterministic salt from its partition-stable position, the small
    * side is replicated across all `salts` sub-keys, and the join runs
    * on (keys, salt) — a hot key's rows land on `salts` reduce tasks
    * instead of one. Output equals `big.join(small, keys, joinType)`
    * row for row.
    *
    * This is the manual fallback for engines/paths where AQE's
    * skew-join splitting cannot kick in (disabled AQE, stream-static
    * joins, bucket-pinned layouts). Cost: the small side shuffles
    * `salts`x — keep `salts` modest.
    *
    * Left-family joins (inner/left/left_semi/left_anti) run directly:
    * each big row carries exactly ONE salt, so its match/no-match
    * outcome is unchanged. Right/full joins cannot — the replicated
    * small side would emit every unmatched small row `salts` times —
    * so they decompose instead: the salted INNER core plus the
    * unmatched rows of the outer side(s), recovered by an anti-join
    * against the other side's DISTINCT keys (distinct collapses the
    * hot key map-side, so no skewed shuffle reappears) with the
    * missing side's columns as typed nulls. Exact for all families.
    * Right/full requires disjoint non-key column names between the
    * two inputs (the null-extension is built by name).
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    require(!big.columns.contains("__salt") &&
      !small.columns.contains("__salt"),
      "saltedJoin: an input already has a __salt column")
    val lt = joinType.toLowerCase.replace("_", "")
    val leftFamily = Set("inner", "left", "leftouter", "leftsemi",
      "leftanti")
    val rightOuter = Set("right", "rightouter")
    val fullOuter = Set("full", "fullouter", "outer")
    require(leftFamily(lt) || rightOuter(lt) || fullOuter(lt),
      s"saltedJoin: unsupported join type $joinType")
    if (leftFamily(lt)) {
      val bigS = big.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      // SHUFFLE_HASH on the replicated side: left alone the planner
      // broadcasts it (estimated size ignores the x`salts` explode),
      // which (a) builds a salts-times-inflated hash relation on the
      // driver and (b) makes the salting pointless — a broadcast join
      // never shuffles the big side, so there is no skewed exchange to
      // spread. The shuffled-hash join on (keys, salt) is exactly the
      // shape manual salting exists to feed: every reduce task sees
      // ~1/salts of a hot key, and the per-partition build side stays
      // small-side-sized. Same rows either way (guide §3.1).
      val smallS = small.withColumn("__salt",
        explode(sequence(lit(0L), lit(salts - 1L))))
        .hint("shuffle_hash")
      val out = bigS.join(smallS, keys :+ "__salt", joinType)
      if (out.columns.contains("__salt")) out.drop("__salt") else out
    } else {
      val bigOthers = big.columns.filterNot(keys.contains).toSeq
      val smallOthers = small.columns.filterNot(keys.contains).toSeq
      require((bigOthers ++ smallOthers).distinct.sizeIs ==
        bigOthers.size + smallOthers.size,
        "saltedJoin right/full: non-key column names must be disjoint " +
          s"between the inputs, got ${bigOthers.intersect(smallOthers)}")
      val keyC = keys.map(col)
      val inner = saltedJoin(big, small, keys, "inner", salts)
      val bigNulls = big.schema.filter(f => !keys.contains(f.name))
        .map(f => lit(null).cast(f.dataType).as(f.name))
      val unmatchedSmall = small
        .join(big.select(keyC: _*).distinct(), keys, "left_anti")
        .select(keyC ++ bigNulls ++ smallOthers.map(col): _*)
      val withSmall = inner.unionByName(unmatchedSmall)
      if (rightOuter(lt)) withSmall
      else {
        val smallNulls = small.schema.filter(f => !keys.contains(f.name))
          .map(f => lit(null).cast(f.dataType).as(f.name))
        // the anti-join's left side is the full (skewed) big relation,
        // so it must be salted too — recursing through the left-family
        // path spreads the hot key over the salt space; the keys-only
        // right side stays tiny (distinct keys x salts)
        val unmatchedBig = saltedJoin(big,
            small.select(keyC: _*).distinct(), keys, "left_anti", salts)
          .select(keyC ++ bigOthers.map(col) ++ smallNulls: _*)
        withSmall.unionByName(unmatchedBig)
      }
    }
  }

  /** Exact two-phase aggregation over possibly-skewed `keyCols`:
    * `aggs` maps a value column to one of sum/count/min/max. The output
    * equals `df.groupBy(keyCols).agg(...)` row for row, but no reduce
    * task ever sees more than ~1/salts of a hot key's rows.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      aggs: Map[String, String],
      salts: Int = 64): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    require(aggs.nonEmpty, "no aggregates given")
    require(!df.columns.contains("__salt"),
      "saltedAgg: input already has a __salt column")
    // Hash only the columns the aggregation reads (keys + values) plus
    // the partition-stable row position — passthrough columns of
    // unhashable types (xxhash64 rejects MapType) must not break the
    // salt, and identical duplicate rows still spread via mi_id.
    val hashedCols = (keyCols ++ aggs.keys.toSeq.sorted).distinct
    val salted = df.withColumn("__salt",
      pmod(xxhash64(hashedCols.map(col) :+
        monotonically_increasing_id(): _*), lit(salts.toLong)))
    val aggList = aggs.toSeq.sortBy(_._1)
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(partialOf(aggList.head._2, aggList.head._1),
        aggList.tail.map { case (c, fn) => partialOf(fn, c) }: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(finalOf(aggList.head._2, aggList.head._1),
        aggList.tail.map { case (c, fn) => finalOf(fn, c) }: _*)
  }
}
