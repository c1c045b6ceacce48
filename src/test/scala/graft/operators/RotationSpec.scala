package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Pins the Walsh-Hadamard rotation's two contracts: the compiled FWHT
  * is bit-identical to the O(d²) expression twin (which is what the
  * DuckDB oracle evaluates), and the rotation scales every squared L2
  * distance by exactly d — so the exact-NN ranking is PROVABLY
  * unchanged, which is why q_sim_recall_rotpq may reuse the unrotated
  * exact side as ground truth.
  */
class RotationSpec extends SparkSuite {
  import spark.implicits._

  private val D = 64

  private def base = Tables.load(spark, sf, "embeddings")
    .withColumn("qe", VectorOps.quantize("embedding"))
    .select("vec_id", "qe")

  test("compiled FWHT equals the expression twin bit-for-bit on the " +
    "real embeddings") {
    val n = base
      .withColumn("r1", VectorOps.hadamardCompiled(D)(col("qe")))
      .withColumn("r2", VectorOps.hadamard("qe", D))
      .where(expr("r1 != r2 or r1 is null"))
      .count()
    assert(n === 0L)
  }

  test("rotation scales every pairwise squared distance by exactly d") {
    val e = base.limit(20).localCheckpoint()
    val r = e.select(col("vec_id").as("rid"),
      VectorOps.hadamardCompiled(D)(col("qe")).as("rqe"))
    val pairs = e.crossJoin(e.select(col("vec_id").as("vid2"),
        col("qe").as("qe2")))
      .where(col("vec_id") < col("vid2"))
      .withColumn("dist", VectorOps.normSq("qe") + VectorOps.normSq("qe2")
        - lit(2L) * VectorOps.dot("qe", "qe2"))
    val rpairs = r.crossJoin(r.select(col("rid").as("rid2"),
        col("rqe").as("rqe2")))
      .where(col("rid") < col("rid2"))
      .withColumn("rdist", VectorOps.normSq("rqe") + VectorOps.normSq("rqe2")
        - lit(2L) * VectorOps.dot("rqe", "rqe2"))
    val bad = pairs.select(col("vec_id"), col("vid2"), col("dist"))
      .join(rpairs.select(col("rid").as("vec_id"),
        col("rid2").as("vid2"), col("rdist")), Seq("vec_id", "vid2"))
      .where(col("rdist") =!= col("dist") * lit(D.toLong))
      .count()
    assert(bad === 0L)
  }

  test("exact top-3 neighbor sets are identical before and after " +
    "rotation (ranking preservation, ties included)") {
    import org.apache.spark.sql.expressions.Window
    def top3(e: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val q = e.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("query_id"), col("qe").as("qqe"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("dist").asc, col("vec_id").asc)
      e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("dist", VectorOps.normSq("qqe") + VectorOps.normSq("qe")
          - lit(2L) * VectorOps.dot("qqe", "qe"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("query_id").cast("long"), col("vec_id").cast("long"))
        .as[(Long, Long)].collect().toSet
    }
    val plain = top3(base)
    val rotated = top3(base.select(col("vec_id"),
      VectorOps.hadamardCompiled(D)(col("qe")).as("qe")))
    assert(plain === rotated)
  }

  test("non-power-of-two and wrong-length inputs fail loudly") {
    intercept[IllegalArgumentException] {
      VectorOps.hadamard("qe", 48)
    }
    val err = intercept[Exception] {
      Seq(Seq(1L, 2L, 3L)).toDF("qe")
        .select(VectorOps.hadamardCompiled(4)(col("qe"))).collect()
    }
    assert(err.getMessage != null)
  }
}
