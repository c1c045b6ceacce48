package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The pack's shared 60-bit md5-derived hash as ONE fused expression:
  * `cast(conv(substring(md5(x),1,15),16,10) as bigint)` semantics —
  * BIT-IDENTICAL (the first 15 hex digits of an md5 are the digest's
  * first 60 bits, i.e. first-8-bytes-big-endian >>> 4) — without the
  * chain's per-call costs: the SQL route allocates a 32-char hex
  * string, substrings it, and re-parses 15 hex chars; this goes
  * digest → shift. The win is largest exactly where the hash runs
  * hottest: inside higher-order-function lambdas (minhash shingles,
  * rolling fingerprints, winnowing, simhash bit folds), which Spark
  * evaluates INTERPRETED — per-call allocations there are pure
  * overhead that whole-stage codegen never amortizes.
  *
  * Registered as the SQL function `graft_hash64`
  * ([[Hash64.register]]) so `TextOps.hash64`'s emitted SQL can name
  * it inside lambda bodies; the DuckDB oracles keep computing the
  * equivalent `('0x' || substr(md5(x),1,15))::BIGINT` — Hash64Spec
  * pins the three-way parity (this expression, the old SQL chain,
  * and the compiled Scala twin `VectorOps.hash64Scala`).
  */
final case class Hash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Hash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Hash64.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object Hash64 {

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8 bytes) = first 15 hex digits as an
    * unsigned value: first 8 digest bytes big-endian, >>> 4.
    */
  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    computeRange(b, 0, b.length)
  }

  /** Same hash over a byte RANGE — the shingle kernels hash thousands
    * of overlapping grams per document, so they slice one byte array
    * with rolling cursors instead of materializing a UTF8String per
    * position (UTF8String.substringSQL re-scans from byte 0 each call,
    * which made the naive fused kernel quadratic).
    */
  def computeRange(b: Array[Byte], off: Int, len: Int): Long = {
    val d = md.get()
    d.reset()
    d.update(b, off, len)
    val dig = d.digest()
    val be =
      (dig(0) & 0xffL) << 56 | (dig(1) & 0xffL) << 48 |
        (dig(2) & 0xffL) << 40 | (dig(3) & 0xffL) << 32 |
        (dig(4) & 0xffL) << 24 | (dig(5) & 0xffL) << 16 |
        (dig(6) & 0xffL) << 8 | (dig(7) & 0xffL)
    be >>> 4
  }

  /** Idempotently register `graft_hash64` in the session's function
    * registry so parser-built lambdas can call it by name. Run once
    * per session — `Tables.load` and the DataFrame-bearing TextOps /
    * StreamingOps entry points call it, so every query, gate, bench,
    * and spec path is covered; standalone library users with a fresh
    * session call this (or any of those entry points) first.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hash64", (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_hash64 takes 1 argument, got ${exprs.length}")
        Hash64(exprs.head)
      }, "built-in")
    // the fused shingle kernels ride along so every call site that
    // registered the hash can also emit them in SQL strings
    def lit(e: Expression, what: String): Int = {
      require(e.foldable, s"$what must be a literal")
      e.eval().asInstanceOf[Number].intValue()
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_char_fps", (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"graft_char_fps takes (text, w, step), got ${exprs.length}")
        CharFps(exprs.head, lit(exprs(1), "w"), lit(exprs(2), "step"))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow", (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"graft_winnow takes (text, k, t), got ${exprs.length}")
        WinnowFps(exprs.head, lit(exprs(1), "k"), lit(exprs(2), "t"))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_overlap", (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"graft_sorted_overlap takes (a, b), got ${exprs.length}")
        SortedOverlap(exprs.head, exprs(1))
      }, "built-in")
  }
}
