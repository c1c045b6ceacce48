package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused char-w-gram fingerprint kernel — the codegen'd form of
  * `transform(sequence(1, greatest(length(t)-w+1, 1), step),
  *            i -> graft_hash64(substring(t, i, w)))`.
  *
  * The expression form walks an interpreted lambda per position (the
  * HOF tax whole-stage codegen never removes) and pays the Janino
  * cold-compile of the huge generated transform on first use — the
  * 13.8 s cold / 3.0 s warm gap the containment bench showed. This
  * expression is one tight loop: substring → md5-low-60 per position,
  * result packed as a primitive long array. BIT-IDENTICAL to the
  * expression form on non-null input (same 1-based char positions,
  * same trailing-short-gram inclusion for texts shorter than w, same
  * Hash64 value), so every DuckDB oracle mirroring the SQL chain is
  * unchanged. Null text returns SQL NULL (standard propagation; the
  * legacy HOF form produced the useless `[null]` — no query feeds
  * null text, both gates agree on the corpus).
  *
  * Registered as `graft_char_fps(text, w, step)` by [[Hash64.register]]
  * so TextOps can emit it inside SQL strings.
  */
final case class CharFps(child: Expression, w: Int, step: Int)
    extends UnaryExpression {

  require(w >= 1 && step >= 1, s"graft_char_fps: w=$w step=$step")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CharFps.compute(input.asInstanceOf[UTF8String], w, step)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.CharFps.compute($c, $w, $step)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Fused winnowing kernel (Schleimer/Wilkerson/Aiken, SIGMOD 2003) —
  * the codegen'd twin of `TextOps.winnow` / `winnowCompiled`: one
  * md5-low-60 per char position, window-of-(t-k+1) minima,
  * first-occurrence dedup, empty array below the t threshold. The
  * compiled UDF twin paid a UTF8String→String copy and an
  * ArrayData conversion per row; this evaluates in place.
  * Registered as `graft_winnow(text, k, t)`.
  */
final case class WinnowFps(child: Expression, k: Int, t: Int)
    extends UnaryExpression {

  require(t >= k && k >= 1, s"graft_winnow: k=$k t=$t")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string argument, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], k, t)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.WinnowFps.compute($c, $k, $t)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object CharFps {

  /** 1-based char positions 1, 1+step, ... up to max(n-w+1, 1); each
    * gram is substring(i, w) — the final grams of a short text are
    * shorter than w, exactly like the SQL chain. One forward pass:
    * rolling byte cursors for the gram start/end instead of
    * substringSQL (which re-scans from byte 0 per call — quadratic).
    */
  def compute(s: UTF8String, w: Int, step: Int): ArrayData = {
    val b = s.getBytes
    val nBytes = b.length
    val n = s.numChars()
    val last = math.max(n - w + 1, 1) // last 1-based start position
    val m = (last - 1) / step + 1
    val out = new Array[Long](m)
    var i = 0 // current 0-based char start
    var startB = 0 // byte offset of char i
    var e = 0 // end cursor: char count covered
    var endB = 0 // byte offset of char e
    var o = 0
    while (o < m) {
      val targetEnd = math.min(i + w, n)
      while (e < targetEnd) {
        endB += UTF8String.numBytesForFirstByte(b(endB)); e += 1
      }
      out(o) = Hash64.computeRange(b, startB, endB - startB)
      o += 1
      var st = 0
      while (st < step && startB < nBytes) {
        startB += UTF8String.numBytesForFirstByte(b(startB))
        i += 1; st += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object WinnowFps {

  private val EMPTY = UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])

  def compute(s: UTF8String, k: Int, t: Int): ArrayData = {
    val n = s.numChars()
    if (n < t) return EMPTY
    val grams = n - k + 1
    val hs = new Array[Long](grams)
    val b = s.getBytes
    // rolling byte cursors — one forward pass, not a substringSQL
    // rescan per position (quadratic)
    var i = 0
    var startB = 0
    var e = 0
    var endB = 0
    while (i < grams) {
      val targetEnd = i + k
      while (e < targetEnd) {
        endB += UTF8String.numBytesForFirstByte(b(endB)); e += 1
      }
      hs(i) = Hash64.computeRange(b, startB, endB - startB)
      startB += UTF8String.numBytesForFirstByte(b(startB))
      i += 1
    }
    // sliding-window minimum via a monotonic deque — O(1) amortized
    // per position (each index enters and leaves the deque once)
    // instead of an O(win) rescan per window; the per-window min VALUE
    // is identical either way, so first-occurrence dedup order (and
    // the fingerprint set) is bit-identical to the scan form
    val win = t - k + 1
    val seen = new java.util.LinkedHashSet[Long]
    val dq = new Array[Int](grams) // ascending indices, ascending values
    var head = 0
    var tail = 0 // live range [head, tail)
    var x = 0
    while (x < grams) {
      while (tail > head && hs(dq(tail - 1)) >= hs(x)) tail -= 1
      dq(tail) = x; tail += 1
      if (dq(head) <= x - win) head += 1
      if (x >= win - 1) seen.add(hs(dq(head)))
      x += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
