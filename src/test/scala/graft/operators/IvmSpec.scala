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

  test("cubeFromState equals the native full-scan cube at every grain") {
    val base = graft.Tables.load(spark, sf, "orders").select(
      col("o_orderpriority").as("a"), col("o_orderstatus").as("b"),
      expr("cast(round(o_totalprice * 100) as long)").as("v"))
    val keys = Seq("a", "b")
    val specs = Seq("v" -> "sum", "v" -> "count", "v" -> "max")
    // state folded from 4 uneven deltas, cube derived from state only
    val state = (0 to 3).map(i =>
        Ivm.aggState(base.where(pmod(col("v"), lit(4)) === i),
          keys, specs))
      .reduce((x, y) => Ivm.merge(x, y, keys, specs))
    val got = Ivm.cubeFromState(state, keys, specs)
      .as[(String, String, Long, Long, Long)].collect().sorted.toSeq
    // native cube over the base, sentinel-mapped like cubeFromState
    val want = base.cube(col("a"), col("b"))
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("m"))
      .select(coalesce(col("a"), lit("__all__")),
        coalesce(col("b"), lit("__all__")),
        col("s"), col("n"), col("m"))
      .as[(String, String, Long, Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got.size === want.size && got.nonEmpty)
    // every grain present: (a,b), (a,*), (*,b), (*,*)
    assert(got.exists(r => r._1 == "__all__" && r._2 == "__all__"))
    assert(got.exists(r => r._1 == "__all__" && r._2 != "__all__"))
    assert(got.exists(r => r._1 != "__all__" && r._2 == "__all__"))
  }
}
