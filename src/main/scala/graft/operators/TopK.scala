package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k as a MAP-SIDE-COMBINING Aggregator — the
  * scale-correct form of "top 3 per group". The window form
  * (q_win_topk_rank: row_number over a partitioned sort) must
  * co-locate and SORT every group's full row set; this aggregator's
  * partial buffers carry AT MOST k rows per group per map task, so
  * only k·groups·partitions tiny tuples ever cross the shuffle — the
  * difference between a bounded reduce and a hot-group straggler at
  * 100 TB.
  *
  * Ranking: value desc, id asc (the pack's tie rule). The buffer trim
  * keeps the ordering total, so merges are associative/commutative and
  * the result is layout-independent (spec-pinned).
  */
final case class TopKAgg(k: Int)
    extends Aggregator[(String, Long, Long), Seq[(Long, Long)],
      Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1: $k")

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sortBy { case (v, id) => (-v, id) }.take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty
  override def reduce(
      b: Seq[(Long, Long)], a: (String, Long, Long)): Seq[(Long, Long)] =
    trim(b :+ ((a._2, a._3)))
  override def merge(
      x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(x ++ y)
  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()

  /** The typed column form for `groupByKey(...).agg(...)`. */
  def column: TypedColumn[(String, Long, Long), Seq[(Long, Long)]] =
    this.toColumn.name("topk")
}
