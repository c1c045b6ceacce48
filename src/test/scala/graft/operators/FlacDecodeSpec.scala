package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** FlacDecode: all four RFC 9639 subframe types (CONSTANT, VERBATIM,
  * FIXED 0-4, LPC 1-32) and all four channel assignments
  * (independent, left/side, right/side, mid/side), pinned by
  * encode->decode roundtrips (the synthesizer writes real frames
  * with real CRCs), hostility cases, and WAV/FLAC landmark parity —
  * the same PCM16 signal must fingerprint identically through
  * either container.
  */
class FlacDecodeSpec extends AnyFunSuite {

  private val tone: Array[Short] =
    Array.tabulate(1000)(i => (math.sin(i * 0.07) * 12000).toShort)

  test("encode->decode roundtrip is exact for every supported " +
    "subframe type, incl. a short last frame") {
    for (sf <- Seq("verbatim", "fixed0", "fixed1", "fixed2", "fixed3",
        "fixed4")) {
      val flac = FlacDecode.synthesizeFlacPcm16(8000, tone,
        blockSize = 256, subframe = sf)
      val d = FlacDecode.decode(flac).getOrElse(
        fail(s"decode failed for $sf"))
      assert(d.info.sampleRate === 8000, sf)
      assert(d.info.channels === 1, sf)
      assert(d.info.bitsPerSample === 16, sf)
      assert(d.info.totalSamples === 1000L, sf)
      assert(d.samples.toSeq === tone.map(_.toInt).toSeq, sf)
      // fixed2 compresses a smooth tone; verbatim never shrinks it
      if (sf == "fixed2") assert(flac.length < 42 + 2 * tone.length)
    }
    // constant subframe on a constant block (and its verbatim
    // fallback on a non-constant one)
    val const = Array.fill[Short](512)(-1234)
    val cf = FlacDecode.synthesizeFlacPcm16(8000, const,
      blockSize = 256, subframe = "constant")
    assert(FlacDecode.decode(cf).get.samples.toSeq ===
      const.map(_.toInt).toSeq)
    assert(cf.length < 42 + 30) // 2 frames, ~12 bytes each
    val mixed = FlacDecode.synthesizeFlacPcm16(8000, tone.take(256),
      blockSize = 256, subframe = "constant") // falls back to verbatim
    assert(FlacDecode.decode(mixed).get.samples.toSeq ===
      tone.take(256).map(_.toInt).toSeq)
  }

  test("partitioned Rice (2^k partitions), escape partitions, and " +
    "independent stereo all roundtrip exactly") {
    // half linear ramp (fixed2 residual = 0 -> escape partitions),
    // half noise (real Rice partitions) in every 256 block
    val mixed: Array[Short] = Array.tabulate(1024) { i =>
      if ((i / 128) % 2 == 0) (i % 128 * 9 - 500).toShort
      else ((i * 2654435761L % 20000) - 10000).toShort
    }
    for (po <- Seq(1, 2, 3); esc <- Seq(false, true)) {
      val flac = FlacDecode.synthesizeFlacPcm16(8000, mixed,
        blockSize = 256, subframe = "fixed2", partitionOrder = po,
        escapeZeroPartitions = esc)
      val d = FlacDecode.decode(flac).getOrElse(
        fail(s"decode failed po=$po esc=$esc"))
      assert(d.samples.toSeq === mixed.map(_.toInt).toSeq,
        s"po=$po esc=$esc")
    }
    // escape coding of the zero partitions must actually shrink the
    // stream (a 4+5-bit partition vs per-sample unary+remainder)
    val plain = FlacDecode.synthesizeFlacPcm16(8000, mixed,
      blockSize = 256, subframe = "fixed2", partitionOrder = 3)
    val escd = FlacDecode.synthesizeFlacPcm16(8000, mixed,
      blockSize = 256, subframe = "fixed2", partitionOrder = 3,
      escapeZeroPartitions = true)
    assert(escd.length < plain.length)
    // independent 2-channel stereo: interleaved roundtrip + header
    val stereo: Array[Short] = Array.tabulate(600)(i =>
      (if (i % 2 == 0) math.sin(i * 0.05) * 9000
       else math.cos(i * 0.03) * 7000).toShort)
    val sf = FlacDecode.synthesizeFlacPcm16(8000, stereo,
      blockSize = 100, subframe = "fixed1", channels = 2)
    val sd = FlacDecode.decode(sf).get
    assert(sd.info.channels === 2)
    assert(sd.info.totalSamples === 300L)
    assert(sd.samples.toSeq === stereo.map(_.toInt).toSeq)
    // the unified audio kernel pools both channels, like the WAV path
    val af = Multimodal.audioFeaturesOf(sf)
    assert(af.a_format === "flac" && af.channels === 2 &&
      af.n_samples === 300L)
    assert(af.peak === stereo.map(v => math.abs(v.toInt)).max)
  }

  test("pcm16Samples: FLAC and WAV containers of the SAME signal " +
    "yield identical samples and identical audio landmarks") {
    val flac = FlacDecode.synthesizeFlacPcm16(8000, tone,
      blockSize = 192, subframe = "fixed2")
    val wav = AudioHeader.synthesizeWavPcm16(8000, tone)
    val fs = FlacDecode.pcm16Samples(flac).get
    val ws = AudioHeader.pcm16Samples(wav).get
    assert(fs.toSeq === ws.toSeq)
    assert(AudioFingerprint.landmarks(fs).toSeq ===
      AudioFingerprint.landmarks(ws).toSeq)
  }

  test("audioFeaturesOf routes FLAC through the one audio kernel: " +
    "identical stats to the WAV container of the same signal") {
    val flac = FlacDecode.synthesizeFlacPcm16(8000, tone,
      blockSize = 256, subframe = "fixed1")
    val wav = AudioHeader.synthesizeWavPcm16(8000, tone)
    val ff = Multimodal.audioFeaturesOf(flac)
    val wf = Multimodal.audioFeaturesOf(wav)
    assert(ff.a_format === "flac" && wf.a_format === "wav")
    assert((ff.sample_rate, ff.channels, ff.bits_per_sample,
      ff.n_samples, ff.duration_ms, ff.peak, ff.rms_x1000,
      ff.n_clipped) ===
      ((wf.sample_rate, wf.channels, wf.bits_per_sample,
        wf.n_samples, wf.duration_ms, wf.peak, wf.rms_x1000,
        wf.n_clipped)))
    // a truncated FLAC falls to "unknown" — never wrong stats
    assert(Multimodal.audioFeaturesOf(flac.take(60)).a_format
      === "unknown")
  }

  test("LPC subframes roundtrip exactly across the order bands, on " +
    "smooth and on noise signals (the 5-bit Rice parameter method)") {
    // noise residuals through multi-tap LPC exceed the 4-bit Rice
    // parameter range, so the encoder's automatic 5-bit method and
    // the decoder's method-1 path are both exercised; a method slip
    // (or a coefficient/shift/warm-up mis-read) fails sample equality
    val noise: Array[Short] = Array.tabulate(1000)(i =>
      ((i * 2654435761L % 60000) - 30000).toShort)
    for (order <- Seq(1, 2, 5, 8, 12, 32); sig <- Seq(tone, noise)) {
      val flac = FlacDecode.synthesizeFlacPcm16(8000, sig,
        blockSize = 256, subframe = s"lpc$order")
      val d = FlacDecode.decode(flac).getOrElse(
        fail(s"decode failed for lpc$order"))
      assert(d.samples.toSeq === sig.map(_.toInt).toSeq, s"lpc$order")
    }
    // partitioned Rice under LPC
    val flac = FlacDecode.synthesizeFlacPcm16(8000, noise,
      blockSize = 250, subframe = "lpc6", partitionOrder = 2)
    assert(FlacDecode.decode(flac).get.samples.toSeq ===
      noise.map(_.toInt).toSeq)
  }

  test("stereo decorrelation roundtrips exactly: left/side, " +
    "right/side, mid/side x subframe types") {
    // interleaved L/R with channel-coupled content (decorrelation's
    // home turf) plus odd/even value mixes that exercise mid/side's
    // dropped-low-bit reconstruction
    val stereo: Array[Short] = Array.tabulate(1200) { i =>
      val f = i / 2
      val l = (math.sin(f * 0.05) * 11000).toInt
      (if (i % 2 == 0) l
       else l / 2 + ((f * 2654435761L % 400) - 200).toInt).toShort
    }
    for (mode <- Seq("leftside", "rightside", "midside");
        sf <- Seq("verbatim", "fixed2", "lpc4")) {
      val flac = FlacDecode.synthesizeFlacPcm16(8000, stereo,
        blockSize = 200, subframe = sf, channels = 2,
        channelMode = mode)
      val d = FlacDecode.decode(flac).getOrElse(
        fail(s"decode failed for $mode/$sf"))
      assert(d.info.channels === 2, s"$mode/$sf")
      assert(d.samples.toSeq === stereo.map(_.toInt).toSeq,
        s"$mode/$sf")
    }
    // decorrelated containers of the same signal match the
    // independent-channel decode bit-for-bit
    val indep = FlacDecode.decode(FlacDecode.synthesizeFlacPcm16(
      8000, stereo, blockSize = 200, subframe = "fixed2",
      channels = 2)).get
    val ms = FlacDecode.decode(FlacDecode.synthesizeFlacPcm16(
      8000, stereo, blockSize = 200, subframe = "fixed2",
      channels = 2, channelMode = "midside")).get
    assert(indep.samples.toSeq === ms.samples.toSeq)
  }

  test("bit-depth matrix: 8/12/20/24/32-bit streams decode exactly " +
    "and normalize to PCM16 like the WAV width legs") {
    // 24-bit built as PCM16 << 8: normalization recovers the original
    val s24 = tone.map(v => v.toInt << 8)
    val f24 = FlacDecode.synthesizeFlacWidth(48000, s24, 24,
      blockSize = 250, subframe = "lpc4")
    val d24 = FlacDecode.decode(f24).get
    assert(d24.info.bitsPerSample === 24)
    assert(d24.samples.toSeq === s24.toSeq)
    assert(FlacDecode.pcm16Samples(f24) === None) // strict-16 gate
    assert(FlacDecode.pcm16NormalizedSamples(f24).get.toSeq ===
      tone.toSeq)
    // the one audio kernel: 24-bit FLAC gets its 16-bit twin's stats
    // with the REAL depth reported
    val f16 = FlacDecode.synthesizeFlacPcm16(48000, tone,
      blockSize = 250, subframe = "lpc4")
    val a24 = Multimodal.audioFeaturesOf(f24)
    val a16 = Multimodal.audioFeaturesOf(f16)
    assert(a24.bits_per_sample === 24 && a16.bits_per_sample === 16)
    assert((a24.n_samples, a24.duration_ms, a24.peak, a24.rms_x1000,
      a24.n_clipped) ===
      ((a16.n_samples, a16.duration_ms, a16.peak, a16.rms_x1000,
        a16.n_clipped)))
    // every other depth roundtrips bit-exactly, incl. stereo mid/side
    for ((bps, scale) <- Seq((8, 1 << 8), (12, 1 << 4), (20, 1),
        (32, 1))) {
      val sig = tone.map(v => v.toInt / scale)
      val f = FlacDecode.synthesizeFlacWidth(8000, sig, bps,
        blockSize = 200, subframe = "fixed2")
      assert(FlacDecode.decode(f).get.samples.toSeq === sig.toSeq,
        s"bps $bps")
    }
    val st24 = Array.tabulate(800)(i =>
      (math.sin(i * 0.04) * 4000000).toInt)
    val fst = FlacDecode.synthesizeFlacWidth(48000, st24, 24,
      blockSize = 200, subframe = "lpc2", channels = 2,
      channelMode = "midside")
    assert(FlacDecode.decode(fst).get.samples.toSeq === st24.toSeq)
  }

  test("wasted-bits subframes roundtrip: quantized samples emit the " +
    "spec flag + unary count, shrink the stream, decode back exactly") {
    val quant: Array[Short] = tone.map(v => (v & ~7).toShort)
    for (sf <- Seq("verbatim", "constant", "fixed2", "lpc4")) {
      val flac = FlacDecode.synthesizeFlacPcm16(8000, quant,
        blockSize = 250, subframe = sf, wastedBits = 3)
      val d = FlacDecode.decode(flac).getOrElse(fail(s"decode $sf"))
      assert(d.samples.toSeq === quant.map(_.toInt).toSeq, sf)
      // the wasted bits must really leave the subframes
      val plain = FlacDecode.synthesizeFlacPcm16(8000, quant,
        blockSize = 250, subframe = sf)
      assert(flac.length < plain.length, sf)
    }
  }

  test("decode-bomb guard: a frame exceeding the declared stream " +
    "length bails before buffering it") {
    val flac = FlacDecode.synthesizeFlacPcm16(8000, tone.take(256),
      blockSize = 256, subframe = "fixed2")
    // patch STREAMINFO's totalSamples (36-bit field ending at header
    // byte 21) down to 64: the first 256-sample frame now exceeds
    // the declaration and must bail at the per-frame cap check
    val lying = flac.clone()
    lying(21) = (((64 >> 32) & 0xf) | (lying(21) & 0xf0)).toByte
    lying(22) = 0; lying(23) = 0; lying(24) = 0; lying(25) = 64.toByte
    assert(FlacDecode.decode(lying) === None)
  }

  test("hostility: CRC damage, reserved subframe types, truncation, " +
    "and garbage all return None; fuzz never throws") {
    val flac = FlacDecode.synthesizeFlacPcm16(8000, tone.take(256),
      blockSize = 256, subframe = "fixed2")
    // flip one bit inside the frame body: CRC-16 must catch it
    val dmg = flac.clone()
    dmg(dmg.length - 5) = (dmg(dmg.length - 5) ^ 0x10).toByte
    assert(FlacDecode.decode(dmg) === None)
    // rewrite the subframe type to a RESERVED code (0b000010): None
    // (header = 42 bytes, frame header = 8 bytes -> subframe byte @50)
    val rsv = flac.clone()
    rsv(50) = 0x04.toByte
    assert(FlacDecode.decode(rsv) === None)
    // truncation at every prefix: None, never a throw
    (0 until flac.length by 7).foreach { n =>
      assert(FlacDecode.decode(flac.take(n)) === None, s"prefix $n")
    }
    // bit-flip fuzz: any single-bit corruption decodes to None or to
    // the original (flips in padding bits are legal no-ops) — never
    // throws, never returns DIFFERENT samples (the CRCs see to it)
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val m = flac.clone()
      val i = rnd.nextInt(m.length)
      m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      FlacDecode.decode(m).foreach { d =>
        assert(d.samples.toSeq === tone.take(256).map(_.toInt).toSeq)
      }
    }
    assert(FlacDecode.decode("not a flac".getBytes) === None)
    assert(FlacDecode.decode(Array.empty[Byte]) === None)
    // header-only stream claiming samples it doesn't carry: None
    assert(FlacDecode.decode(
      AudioHeader.synthesizeFlac(8000, 1, 16, 100L)) === None)
  }
}
