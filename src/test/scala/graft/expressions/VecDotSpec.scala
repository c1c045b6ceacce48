package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class VecDotKernelSpec extends AnyFunSuite {
  private def arr(xs: Long*): ArrayData = ArrayData.toArrayData(xs.toArray)

  test("kernel: exact integer dot product") {
    assert(VecDot.dot(arr(1, 2, 3), arr(4, 5, 6)) === 32L)
    assert(VecDot.dot(arr(), arr()) === 0L)
    assert(VecDot.dot(arr(1000000, -1000000), arr(1000000, 1000000)) === 0L)
    // 64-bit headroom: 1e6-grid quantization squares to 1e12 per element
    assert(VecDot.dot(arr(1000000), arr(1000000)) === 1000000000000L)
    // mismatched lengths: common prefix
    assert(VecDot.dot(arr(2, 3), arr(5)) === 10L)
  }
}

class VecDotSparkSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.VectorOps

  test("vec_dot equals the interpreted HOF expression on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Seq.fill(64)(rnd.nextFloat() * 2 - 1),
        Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("ea", "eb")
      .withColumn("qa", VectorOps.quantize("ea"))
      .withColumn("qb", VectorOps.quantize("eb"))
    val hof = "aggregate(zip_with(qa, qb, (x, y) -> x * y), " +
      "cast(0 as bigint), (acc, v) -> acc + v)"
    val diff = df
      .withColumn("native", VectorOps.dot("qa", "qb"))
      .withColumn("interp", expr(hof))
      .where(col("native") =!= col("interp"))
      .count()
    assert(diff === 0L)
    // normSq is vec_dot with itself and stays non-negative and exact
    val normDiff = df
      .withColumn("native", VectorOps.normSq("qa"))
      .withColumn("interp",
        expr("aggregate(qa, cast(0 as bigint), (a, x) -> a + x * x)"))
      .where(col("native") =!= col("interp"))
      .count()
    assert(normDiff === 0L)
  }

  test("vec_dot is null-safe and survives both codegen and interpreted eval") {
    VecDot.ensureRegistered(spark)
    val df = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    assert(df.selectExpr("vec_dot(a, b)").as[Long].head() === 11L)
    assert(df.selectExpr("vec_dot(a, cast(null as array<bigint>))")
      .as[Option[Long]].head() === None)
    // interpreted path (codegen off) must agree with the codegen path
    val prev = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try
      assert(df.selectExpr("vec_dot(a, b)").as[Long].head() === 11L)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("vec_dot registers via ensureRegistered idempotently") {
    VecDot.ensureRegistered(spark)
    VecDot.ensureRegistered(spark) // second call is a no-op
    assert(spark.sql("SELECT vec_dot(array(2L, 3L), array(4L, 5L)) AS d")
      .as[Long].head() === 23L)
  }
}
