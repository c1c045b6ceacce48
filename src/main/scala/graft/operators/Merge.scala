package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic CDC merge — the lakehouse `MERGE INTO` semantic
  * (upsert + delete from a change feed) expressed as pure relational
  * algebra over immutable inputs, so it runs identically on a table or
  * a snapshot at any scale.
  *
  * `changes` carries the base's data columns plus an op column
  * (`"u"` = upsert, `"d"` = delete) and a version column; several
  * versions of the same key may arrive in one feed (the normal CDC
  * batch shape) and LATEST WINS. The reduce is the pack's best-hit
  * max-of-struct with the version leading, so the winner is
  * deterministic under any partitioning even when versions tie (the
  * remaining fields break the tie lexicographically).
  *
  * Plan shape at 100 TB: one key-partitioned aggregate over the
  * (small) change feed, one LEFT ANTI join of base against the change
  * keys (broadcastable when the feed is small — the common case), and
  * a union with the surviving upserts. The base is never shuffled
  * beyond the anti join; no window, no global sort.
  */
object Merge {

  def cdcMerge(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val dataCols = base.columns.filterNot(keys.contains)
    require(dataCols.forall(changes.columns.contains) &&
      changes.columns.contains(opCol) && changes.columns.contains(seqCol),
      s"cdcMerge: changes must carry ${dataCols.mkString(",")} + " +
        s"$opCol + $seqCol")
    // latest-wins per key: version leads the struct so it dominates
    // the comparison; op + data follow as deterministic tie-breaks
    val m = changes.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max(struct(
        (col(seqCol) +: col(opCol) +: dataCols.map(col)).toIndexedSeq: _*))
        .as("__graft_m"))
    val latest = m.select(
      keys.map(col) ++
        Seq(col(s"__graft_m.$opCol").as(opCol)) ++
        dataCols.map(c => col(s"__graft_m.$c").as(c)): _*)
    val untouched = base.join(
      latest.select(keys.map(col): _*), keys, "left_anti")
    val upserts = latest.where(col(opCol) === "u")
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }
}
