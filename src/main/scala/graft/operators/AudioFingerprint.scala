package graft.operators

/** Integer-exact audio fingerprinting over PCM16: a fixed-point DFT
  * spectrogram, per-frame spectral peaks, and consecutive-peak-triple
  * landmarks — the retrieval-grade (Shazam-style: Wang, "An
  * Industrial-Strength Audio Search Algorithm", ISMIR 2003) upgrade of
  * [[AudioHeader.envelopeHash]]'s loudness profile. Everything is
  * integer arithmetic over a pinned Q11 trig table, so fingerprints
  * are bit-reproducible across engines and partitionings and the whole
  * computation replays relationally (the DuckDB oracle inlines
  * [[CosQ]]/[[SinQ]] as a VALUES relation, the DCT-table precedent
  * from the image pHash oracle).
  *
  * Frame geometry is deliberately small (16-sample frames, bins 1-8)
  * so the oracle's frame x bin join stays tractable; the landmark
  * SPACE is what matters for the banded join discipline — triples give
  * 8^3 = 512 buckets, so a catalog self-join on landmark id carries
  * bucket-collision slivers, never all-pairs, exactly like the image
  * pHash bands. A production tuning would widen frames/bins without
  * changing any of the relational shapes here.
  *
  * Overflow audit: |re| <= 32768 * 2048 * 16 = 2^30, re^2 + im^2 <=
  * 2^61 < Long.MaxValue — no intermediate can overflow.
  *
  * Reference analog: the reference has no media path at all; this is
  * part of the pipeline surface the survey adds beyond it (SURVEY.md
  * §2 multimodal extensions).
  */
object AudioFingerprint {

  /** Samples per analysis frame (non-overlapping). */
  val FrameSize = 16

  /** Spectral bins analysed: k = 1..Bins (DC excluded — a constant
    * offset says nothing about timbre).
    */
  val Bins = 8

  /** Fixed-point scale for the trig tables (Q11). */
  val Q = 2048L

  /** CosQ(k-1)(n) = round(cos(2 pi k n / 16) * 2048) — pinned here and
    * inlined into the oracle, one source of truth for both engines.
    */
  val CosQ: Array[Array[Long]] = Array.tabulate(Bins, FrameSize) {
    (ki, n) => math.round(math.cos(2 * math.Pi * (ki + 1) * n / FrameSize) * Q)
  }

  /** SinQ(k-1)(n) = round(sin(2 pi k n / 16) * 2048). */
  val SinQ: Array[Array[Long]] = Array.tabulate(Bins, FrameSize) {
    (ki, n) => math.round(math.sin(2 * math.Pi * (ki + 1) * n / FrameSize) * Q)
  }

  /** Squared DFT magnitudes per complete frame: out(t)(k-1) =
    * re^2 + im^2 with re = sum_n s(16t+n) CosQ(k)(n), im = sum_n
    * s(16t+n) SinQ(k)(n). The incomplete tail frame is dropped (both
    * engines must see the same frame count).
    */
  def binEnergies(samples: Array[Short]): Array[Array[Long]] = {
    val nFrames = samples.length / FrameSize
    val out = Array.ofDim[Long](nFrames, Bins)
    var t = 0
    while (t < nFrames) {
      var k = 0
      while (k < Bins) {
        val cq = CosQ(k)
        val sq = SinQ(k)
        var re = 0L
        var im = 0L
        var n = 0
        val base = t * FrameSize
        while (n < FrameSize) {
          val s = samples(base + n).toLong
          re += s * cq(n)
          im += s * sq(n)
          n += 1
        }
        out(t)(k) = re * re + im * im
        k += 1
      }
      t += 1
    }
    out
  }

  /** Per-frame spectral peak: the 1-based bin with the largest squared
    * magnitude, ties to the smallest bin (an all-zero frame peaks at
    * bin 1).
    */
  def framePeaks(samples: Array[Short]): Array[Int] = {
    val e = binEnergies(samples)
    Array.tabulate(e.length) { t =>
      var best = 0
      var k = 1
      while (k < Bins) {
        if (e(t)(k) > e(t)(best)) best = k
        k += 1
      }
      best + 1
    }
  }

  /** Consecutive-peak-triple landmarks: one per frame t with two
    * successors, id = (peak(t)-1)*64 + (peak(t+1)-1)*8 + (peak(t+2)-1)
    * in [0, 511]. Time-shift-covariant: a clip delayed by whole frames
    * emits the same ids at shifted t, which is exactly what the
    * aligned-offset match verify needs.
    */
  def landmarks(samples: Array[Short]): Array[(Int, Int)] = {
    val p = framePeaks(samples)
    Array.tabulate(math.max(p.length - 2, 0)) { t =>
      (t, (p(t) - 1) * 64 + (p(t + 1) - 1) * 8 + (p(t + 2) - 1))
    }
  }

  /** The trig tables as a SQL VALUES body `(k, n, cq, sq), ...` for
    * oracle inlining.
    */
  def trigValuesSql: String =
    (for (ki <- 0 until Bins; n <- 0 until FrameSize)
      yield s"(${ki + 1},$n,${CosQ(ki)(n)},${SinQ(ki)(n)})").mkString(",")
}
