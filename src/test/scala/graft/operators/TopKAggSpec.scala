package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** TopKAgg: layout independence, exact window parity, and the
  * partial-combine plan shape (no partitioned sort anywhere).
  */
class TopKAggSpec extends SparkSuite {
  import spark.implicits._

  private def run(repart: Int) = {
    val base = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100) as long)").as("c"),
        col("o_orderkey"))
    (if (repart > 0) base.repartition(repart) else base)
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(TopKAgg(3).column)
      .collect().toMap
  }

  test("equals the window definition and is layout-independent") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(col("c").desc, col("o_orderkey").asc)
    val want = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100) as long)").as("c"),
        col("o_orderkey"))
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 3)
      .as[(String, Long, Long, Int)].collect()
      .groupBy(_._1)
      .map { case (k, rows) =>
        k -> rows.sortBy(_._4).map(r => (r._2, r._3)).toSeq
      }
    assert(run(0) === want)
    assert(run(7) === want)
  }

  test("plans as an object-hash aggregate with partial combine, " +
    "never a partitioned sort of the rows") {
    val plan = graft.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority"),
        expr("cast(round(o_totalprice * 100) as long)").as("c"),
        col("o_orderkey"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .agg(TopKAgg(3).column)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
  }
}
