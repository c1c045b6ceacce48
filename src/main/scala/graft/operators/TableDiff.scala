package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-based snapshot reconciliation — the data-engineering diff
  * behind migration sign-offs, replication checks, and backfill
  * audits: which keys were ADDED, REMOVED, or CHANGED between snapshot
  * `a` (before) and `b` (after)?
  *
  * One full-outer join on the keys with each side's non-key columns
  * folded into a struct; "changed" is a null-safe struct comparison,
  * so a NULL→value flip counts as a change and NULL==NULL does not.
  * Unchanged rows — the overwhelming majority of any real
  * reconciliation — are dropped before anything else happens, so the
  * output is difference-sized, not table-sized. At 100 TB both sides
  * shuffle once on the key (or not at all when both snapshots are
  * bucketed on it — the save-layout family's contract).
  */
object TableDiff {

  def diff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = a.columns.filterNot(keys.contains)
    require(dataCols.nonEmpty, "diff: no non-key columns to compare")
    require(b.columns.sorted.sameElements(a.columns.sorted),
      s"diff: snapshots carry different columns — " +
        s"a: ${a.columns.sorted.mkString(",")} " +
        s"b: ${b.columns.sorted.mkString(",")}")
    val av = a.select(keys.map(col) :+
      struct(dataCols.map(col).toIndexedSeq: _*).as("__graft_a")
        : _*)
    val bv = b.select(keys.map(col) :+
      struct(dataCols.map(col).toIndexedSeq: _*).as("__graft_b")
        : _*)
    av.join(bv, keys, "full_outer")
      .withColumn("status",
        when(col("__graft_a").isNull, "added")
          .when(col("__graft_b").isNull, "removed")
          .when(!(col("__graft_a") <=> col("__graft_b")), "changed"))
      .where(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
  }
}
