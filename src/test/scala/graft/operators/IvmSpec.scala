package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** IVM algebra pins: folding deltas in any grouping/order equals the
  * one-shot state, and unsupported aggregates fail loudly.
  */
class IvmSpec extends SparkSuite {
  import spark.implicits._

  test("incremental merge equals one-shot state under any batching") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select(col("l_returnflag").as("k"),
        col("l_quantity").cast("long").as("v"))
    val keys = Seq("k")
    val specs = Seq("v" -> "sum", "v" -> "count", "v" -> "min",
      "v" -> "max")
    val oneShot = Ivm.finalize(Ivm.aggState(li, keys, specs), keys, specs)
      .orderBy("k").collect().toSeq
    // 5 uneven deltas, folded left; then the same 5 folded in a
    // different association order
    val deltas = (0 to 4).map(i => li.where(pmod(col("v"), lit(5)) === i))
      .map(b => Ivm.aggState(b, keys, specs))
    val foldedL = deltas.reduce((a, b) => Ivm.merge(a, b, keys, specs))
    val foldedR = deltas.reverse.reduce((a, b) =>
      Ivm.merge(a, b, keys, specs))
    assert(Ivm.finalize(foldedL, keys, specs).orderBy("k")
      .collect().toSeq === oneShot)
    assert(Ivm.finalize(foldedR, keys, specs).orderBy("k")
      .collect().toSeq === oneShot)
  }

  test("unsupported aggregate fails loudly") {
    val df = Seq((1L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Ivm.aggState(df, Seq("k"), Seq("v" -> "median"))
    }
    assert(e.getMessage.contains("median"))
  }
}
