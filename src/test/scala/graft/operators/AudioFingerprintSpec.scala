package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** AudioFingerprint (integer fixed-point spectrogram + peak-triple
  * landmarks) and the AudioHeader.pcm16Samples decode feeding it.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  test("pinned Q11 trig table endpoints match the closed forms") {
    // k=8: cos(pi n) alternates +-1, sin(pi n) = 0
    (0 until 16).foreach { n =>
      assert(AudioFingerprint.CosQ(7)(n) === (if (n % 2 == 0) 2048L else -2048L))
      assert(AudioFingerprint.SinQ(7)(n) === 0L)
    }
    // every bin: cos(0) = 1, sin(0) = 0
    (0 until 8).foreach { ki =>
      assert(AudioFingerprint.CosQ(ki)(0) === 2048L)
      assert(AudioFingerprint.SinQ(ki)(0) === 0L)
    }
    // k=4: cos(pi n / 2) cycles 1,0,-1,0
    assert(AudioFingerprint.CosQ(3).take(4).toSeq === Seq(2048L, 0L, -2048L, 0L))
  }

  test("a pure tone at bin k peaks at bin k; zero frames peak at 1") {
    // s(n) = 1000 * cos(2 pi * 4 * n / 16) is exactly integer-valued
    val tone4 = Array.tabulate(64)(i =>
      (Seq(1000, 0, -1000, 0)((i % 16) % 4)).toShort)
    assert(AudioFingerprint.framePeaks(tone4).toSeq === Seq(4, 4, 4, 4))
    val silent = new Array[Short](32)
    assert(AudioFingerprint.framePeaks(silent).toSeq === Seq(1, 1))
    // incomplete tail frame is dropped
    assert(AudioFingerprint.framePeaks(tone4.take(40)).length === 2)
  }

  test("landmarks are time-shift-covariant (whole-frame delay)") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill[Short](16 * 12)((rnd.nextInt(65536) - 32768).toShort)
    val shifted = new Array[Short](16) ++ base
    val lmBase = AudioFingerprint.landmarks(base).toMap
    val lmShift = AudioFingerprint.landmarks(shifted).toMap
    // triples not touching the injected zero frame appear 1 frame later
    (1 until 10).foreach { t =>
      assert(lmShift(t + 1) === lmBase(t))
    }
    // id range is the documented 512-bucket space
    (lmBase.values ++ lmShift.values).foreach { id =>
      assert(id >= 0 && id < 512)
    }
  }

  test("overflow audit: full-scale square wave stays within Long") {
    val fullScale = Array.tabulate[Short](32)(i =>
      if (i % 2 == 0) 32767 else -32768)
    val e = AudioFingerprint.binEnergies(fullScale)
    assert(e.forall(_.forall(v => v >= 0L))) // no wraparound to negative
    assert(AudioFingerprint.framePeaks(fullScale).toSeq === Seq(8, 8))
  }

  test("WAV PCM16 roundtrip: synthesize -> pcm16Samples is identity") {
    val rnd = new scala.util.Random(5)
    val s = Array.fill[Short](1000)((rnd.nextInt(65536) - 32768).toShort)
    val wav = AudioHeader.synthesizeWavPcm16(8000, s)
    assert(AudioHeader.pcm16Samples(wav).get.toSeq === s.toSeq)
    // landmarks through the real codec path == landmarks on raw samples
    assert(AudioFingerprint.landmarks(AudioHeader.pcm16Samples(wav).get)
      .toSeq === AudioFingerprint.landmarks(s).toSeq)
    // non-PCM16 and garbage bytes decode to None, never throw
    assert(AudioHeader.pcm16Samples("not a wav".getBytes("US-ASCII")) === None)
  }
}
