package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom membership probe over a string key — the hot per-row
  * check of [[graft.operators.IncrementalDedup]]. A Scala UDF here costs
  * an InternalRow→String conversion and a lambda dispatch per shard row;
  * this expression stays inside whole-stage codegen and hashes the
  * UTF8String's UTF-8 bytes directly (`mightContainBinary`), which is
  * bit-identical to the `putString` hashing `stat.bloomFilter` used to
  * build the sketch — both hash the UTF-8 encoding. Null keys return
  * false (a null matches nothing under anti-join semantics, so a null
  * is always "definitely new"), making the expression non-nullable.
  *
  * The serialized filter rides in the expression tree like Spark's own
  * runtime-filter `BloomFilterMightContain` subquery results do: the
  * task binary is broadcast once per stage, and each executor
  * deserializes the sketch lazily exactly once.
  */
final case class BloomMightContain(
    child: Expression,
    filterBytes: Array[Byte]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string key, got ${child.dataType}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  /** Shared by interpreted eval and generated code. */
  def test(s: UTF8String): Boolean =
    s != null && bloom.mightContainBinary(s.getBytes)

  override def eval(input: InternalRow): Any =
    test(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "bloomMightContain", this, classOf[BloomMightContain].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        final boolean ${ev.value} =
          $ref.test(${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
