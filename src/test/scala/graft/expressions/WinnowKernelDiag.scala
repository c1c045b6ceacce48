package graft.expressions

import org.apache.spark.unsafe.types.UTF8String

/** Kernel-level timing of the winnow sliding-minimum: monotonic deque
  * (the shipped `WinnowFps.compute`) vs the O(window) rescan it
  * replaced, at the registry geometry (k=8, t=11 — window 4) and the
  * production decontamination geometry (k=8, t=50 — window 43).
  * Run: `sbt "Test/runMain graft.expressions.WinnowKernelDiag"`.
  */
object WinnowKernelDiag {

  /** The pre-deque kernel, kept verbatim for comparison. */
  private def scanCompute(s: UTF8String, k: Int, t: Int): Seq[Long] = {
    val n = s.numChars()
    if (n < t) return Nil
    val grams = n - k + 1
    val hs = new Array[Long](grams)
    val b = s.getBytes
    var i = 0; var startB = 0; var e = 0; var endB = 0
    while (i < grams) {
      val targetEnd = i + k
      while (e < targetEnd) {
        endB += UTF8String.numBytesForFirstByte(b(endB)); e += 1
      }
      hs(i) = Hash64.computeRange(b, startB, endB - startB)
      startB += UTF8String.numBytesForFirstByte(b(startB))
      i += 1
    }
    val win = t - k + 1
    val seen = new java.util.LinkedHashSet[Long]
    var j = 0
    while (j + win <= grams) {
      var m = hs(j)
      var x = j + 1
      while (x < j + win) { if (hs(x) < m) m = hs(x); x += 1 }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    var seed = 42L
    def next(): Long = { seed = seed * 6364136223846793005L +
      1442695040888963407L; seed >>> 16 }
    val docs = (1 to 2000).map { _ =>
      val len = 500 + (next() % 1500).toInt
      UTF8String.fromString(
        (0 until len).map(_ => ('a' + (next() % 27) % 27).toChar match {
          case c if c > 'z' => ' '
          case c => c
        }).mkString)
    }
    for (t <- Seq(11, 50)) {
      // parity first — the deque must select identical fingerprints
      docs.foreach { d =>
        val dq = WinnowFps.compute(d, 8, t)
        val got = (0 until dq.numElements()).map(dq.getLong)
        assert(got == scanCompute(d, 8, t), "kernel drift")
      }
      def time(f: => Unit): Double = {
        f // warm
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      val scanMs = (1 to 5).map(_ =>
        time(docs.foreach(scanCompute(_, 8, t)))).min
      val dqMs = (1 to 5).map(_ =>
        time(docs.foreach(WinnowFps.compute(_, 8, t)))).min
      println(f"[winnow-diag] k=8 t=$t%2d window=${t - 7}%2d: " +
        f"scan=$scanMs%8.1fms  deque=$dqMs%8.1fms  " +
        f"speedup=${scanMs / dqMs}%.2fx")
    }
  }
}
