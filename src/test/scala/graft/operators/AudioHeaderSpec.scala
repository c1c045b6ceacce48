package graft.operators

import graft.SparkSuite

/** AudioHeader (pure-JVM RIFF/WAVE parsing + exact PCM16 stats) and the
  * Multimodal audio-feature plumbing. Fixture bytes are synthesized by
  * AudioHeader.synthesizeWavPcm16, whose layout is the spec's executable
  * statement of the RIFF grammar; hand-pinned header offsets below
  * guard the synthesizer and the parser against agreeing on a shared
  * mistake.
  */
class AudioHeaderSpec extends SparkSuite {

  private val tone: Array[Short] =
    Array.tabulate(8000)(i => (math.sin(i * 0.1) * 16384).toShort)

  test("synthesized WAV layout matches the RIFF spec byte-for-byte") {
    val b = AudioHeader.synthesizeWavPcm16(8000, tone)
    assert(new String(b.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(b.slice(8, 12), "US-ASCII") === "WAVE")
    assert(new String(b.slice(12, 16), "US-ASCII") === "fmt ")
    assert(new String(b.slice(36, 40), "US-ASCII") === "data")
    // LE int32 data length at offset 40
    val dl = (b(40) & 0xff) | ((b(41) & 0xff) << 8) |
      ((b(42) & 0xff) << 16) | ((b(43) & 0xff) << 24)
    assert(dl === 16000)
    assert(b.length === 44 + 16000)
  }

  test("parse returns the header fields and frame-exact duration") {
    val b = AudioHeader.synthesizeWavPcm16(8000, tone)
    val info = AudioHeader.parse(b).get
    assert(info.format === "wav")
    assert(info.audioFormat === 1)
    assert(info.channels === 1)
    assert(info.sampleRate === 8000)
    assert(info.bitsPerSample === 16)
    assert(info.nSamples === 8000L)
    assert(info.durationMs === 1000L)
  }

  test("parser walks unknown chunks (LIST before data) per the grammar") {
    val base = AudioHeader.synthesizeWavPcm16(16000, tone)
    // splice a 7-byte LIST chunk (odd size -> 1 pad byte) before data
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ Array.fill[Byte](8)(42)
    val spliced = base.slice(0, 36) ++ listChunk ++ base.drop(36)
    val info = AudioHeader.parse(spliced).get
    assert(info.sampleRate === 16000)
    assert(info.nSamples === 8000L)
    assert(info.durationMs === 500L)
  }

  test("corrupt and non-WAV bytes never throw, return None") {
    assert(AudioHeader.parse(null).isEmpty)
    assert(AudioHeader.parse(Array.empty[Byte]).isEmpty)
    assert(AudioHeader.parse("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(AudioHeader.parse(Array.fill[Byte](100)(13)).isEmpty)
    // truncated data chunk: declared length exceeds the blob
    val b = AudioHeader.synthesizeWavPcm16(8000, tone).dropRight(100)
    assert(AudioHeader.parse(b).isEmpty)
    assert(AudioHeader.pcm16Stats(Array.fill[Byte](50)(7)).isEmpty)
  }

  test("pcm16Stats are exact: peak, sum of squares, clipping count") {
    val s = Array[Short](0, 100, -200, 32767, -32768, 32767)
    val b = AudioHeader.synthesizeWavPcm16(44100, s)
    val st = AudioHeader.pcm16Stats(b).get
    assert(st.n === 6L)
    assert(st.peak === 32768)
    assert(st.nClipped === 3L)
    assert(st.sumSq === 0L + 100L * 100 + 200L * 200 +
      32767L * 32767 * 2 + 32768L * 32768)
  }

  test("envelopeHash: exact window partition, comparison bits, " +
    "jitter invariance, and edge cases") {
    // 130 samples into 65 windows: exactly 2 per window; a loudness
    // staircase DOWN sets every comparison bit below 64
    val down = Array.tabulate[Short](130)(i => (6500 - (i / 2) * 100).toShort)
    val hDown = AudioHeader.envelopeHash(
      AudioHeader.synthesizeWavPcm16(8000, down)).get
    assert(hDown === -1L) // all 64 bits
    // staircase UP: |sample| increases, no bit set
    val up = Array.tabulate[Short](130)(i => ((i / 2) * 100).toShort)
    assert(AudioHeader.envelopeHash(
      AudioHeader.synthesizeWavPcm16(8000, up)).get === 0L)
    // per-sample jitter of +-1 never flips a 100-unit staircase
    val jit = down.zipWithIndex.map { case (v, i) =>
      (v + (if (i % 2 == 0) 1 else -1)).toShort
    }
    assert(AudioHeader.envelopeHash(
      AudioHeader.synthesizeWavPcm16(8000, jit)).get === hDown)
    // brute-force reference on an irregular length (windows uneven)
    val s = Array.tabulate[Short](97)(i => ((i * 37) % 2000 - 1000).toShort)
    val env = new Array[Long](65)
    s.zipWithIndex.foreach { case (v, i) =>
      env(i * 65 / 97) += math.abs(v.toLong)
    }
    var want = 0L
    for (w <- 0 until 64) if (env(w) > env(w + 1)) want |= 1L << w
    assert(AudioHeader.envelopeHash(
      AudioHeader.synthesizeWavPcm16(8000, s)).get === want)
    // empty data chunk hashes to 0; garbage is None
    assert(AudioHeader.envelopeHash(AudioHeader.synthesizeWavPcm16(
      8000, Array.empty[Short])).get === 0L)
    assert(AudioHeader.envelopeHash("nope".getBytes) === None)
  }

  test("withAudioFeatures decodes WAV rows and zeroes non-audio rows") {
    import spark.implicits._
    val wav = AudioHeader.synthesizeWavPcm16(8000, tone)
    val df = Seq(
      (1L, wav),
      (2L, "not audio at all".getBytes("UTF-8"))).toDF("id", "media")
    val out = Multimodal.withAudioFeatures(df, "media")
      .select("id", "a_format", "sample_rate", "n_samples",
        "duration_ms", "peak", "rms_x1000", "n_clipped")
      .collect().sortBy(_.getLong(0))
    val r1 = out(0)
    assert(r1.getString(1) === "wav")
    assert(r1.getInt(2) === 8000)
    assert(r1.getLong(3) === 8000L)
    assert(r1.getLong(4) === 1000L)
    assert(r1.getInt(5) > 16000 && r1.getInt(5) <= 16384)
    // RMS of a full-swing sine at amplitude A is ~A/sqrt(2)
    assert(math.abs(r1.getLong(6) - 16384000L / math.sqrt(2).toLong)
      < 16384000L) // loose band; exactness is pinned via sumSq above
    assert(r1.getLong(7) === 0L)
    val r2 = out(1)
    assert(r2.getString(1) === "unknown")
    assert(r2.getInt(2) === 0)
  }

  test("parseMp3 walks every Layer III frame: exact frame count and " +
    "duration, ID3v2 skip, ID3v1 tail tolerance, both MPEG versions") {
    val mp3 = AudioHeader.synthesizeMp3(mpeg1 = true, brIdx = 9,
      srIdx = 0, mono = true, nFrames = 7, id3Size = 33)
    val i = AudioHeader.parseMp3(mp3).get
    assert(i.version === "mpeg1")
    assert(i.bitrateKbps === 128)
    assert(i.sampleRate === 44100)
    assert(i.channels === 1)
    assert(i.nFrames === 7)
    assert(i.nSamples === 7 * 1152L)
    assert(i.durationMs === 7 * 1152L * 1000 / 44100)
    // MPEG-2: 576 samples per frame, the V2 bitrate/rate tables
    val m2 = AudioHeader.parseMp3(AudioHeader.synthesizeMp3(
      mpeg1 = false, brIdx = 5, srIdx = 1, mono = false,
      nFrames = 3)).get
    assert(m2.version === "mpeg2")
    assert(m2.bitrateKbps === 40)
    assert(m2.sampleRate === 24000)
    assert(m2.channels === 2)
    assert(m2.nSamples === 3 * 576L)
    // trailing 128-byte ID3v1 "TAG" block is tolerated
    val withTail = mp3 ++ ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(AudioHeader.parseMp3(withTail).get.nFrames === 7)
  }

  test("parseMp3 mixed-rate stream: durationMs sums per-rate sample " +
    "buckets exactly, not total/first-rate; metadata stays first-frame") {
    // 5 frames at 44100 then 3 at 48000 — a legal VBR-ish rate switch
    val a = AudioHeader.synthesizeMp3(mpeg1 = true, brIdx = 9,
      srIdx = 0, mono = true, nFrames = 5)
    val b = AudioHeader.synthesizeMp3(mpeg1 = true, brIdx = 9,
      srIdx = 1, mono = true, nFrames = 3)
    val i = AudioHeader.parseMp3(a ++ b).get
    assert(i.nFrames === 8)
    assert(i.nSamples === 8L * 1152)
    // exact per-bucket conversion: floor(5760*1000/44100) +
    // floor(3456*1000/48000) = 130 + 72; the old total/first-rate
    // formula gave floor(9216*1000/44100) = 208
    assert(i.durationMs === 5L * 1152 * 1000 / 44100 +
      3L * 1152 * 1000 / 48000)
    assert(i.durationMs === 202L)
    // first-frame-only contract for the stream-level metadata
    assert(i.sampleRate === 44100)
  }

  test("audioFeaturesColumn: MP4 'soun' PCM16 (sowt LE / twos BE) " +
    "reassembles the sample table; withAudioFeatures delegates") {
    import spark.implicits._
    import graft.operators.VideoHeader
    // 3 chunks x 10 samples, values chosen to pin sign handling
    val sm: Array[Short] = Array.tabulate(30)(i =>
      (i * 1103 - 16000).toShort)
    def chunksLe = sm.grouped(10).map(g =>
      g.flatMap(v => Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
        .toArray).toSeq
    def chunksBe = sm.grouped(10).map(g =>
      g.flatMap(v => Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte))
        .toArray).toSeq
    def mp4(codec: String, chunks: Seq[Array[Byte]]) =
      VideoHeader.synthesizeMp4Tracks("mp42", 600, 300L, Seq(
        VideoHeader.TrackSamples(
          VideoHeader.TrackSpec("vide", "avc1", 64, 64, 600, 200L),
          Seq(Array[Byte](1, 2, 3, 4)), 100, 1),
        VideoHeader.TrackSamples(
          VideoHeader.TrackSpec("soun", codec, 0, 0, 8000, 30L),
          chunks, 10, 2)))
    val le = Multimodal.audioFeaturesOf(mp4("sowt", chunksLe))
    val be = Multimodal.audioFeaturesOf(mp4("twos", chunksBe))
    val expPeak = sm.map(v => math.abs(v.toInt)).max
    val expSumSq = sm.map(v => v.toLong * v).sum
    val expRms = math.round(math.sqrt(expSumSq.toDouble / 30) * 1000)
    for ((f, fmt) <- Seq((le, "mp4-sowt"), (be, "mp4-twos"))) {
      assert(f.a_format === fmt)
      assert(f.sample_rate === 8000)
      assert(f.n_samples === 30L)
      assert(f.duration_ms === 30L * 1000 / 8000)
      assert(f.peak === expPeak)
      assert(f.rms_x1000 === expRms)
      assert(f.n_clipped === 0L)
    }
    // a compressed audio track (mp4a) stays honest: no decode claimed
    assert(Multimodal.audioFeaturesOf(
      mp4("mp4a", chunksLe)).a_format === "unknown")
    // withAudioFeatures delegates to the SAME kernel column
    val df = Seq((1L, mp4("sowt", chunksLe))).toDF("id", "media")
    val row = Multimodal.withAudioFeatures(df, "media")
      .select("a_format", "n_samples", "peak", "rms_x1000").head
    assert(row.getString(0) === "mp4-sowt")
    assert(row.getLong(1) === 30L)
    assert(row.getInt(2) === expPeak)
    assert(row.getLong(3) === expRms)
  }

  test("parseMp3 hostility: truncation, bad sync, trailing garbage " +
    "-> None deliberately; random fuzz never throws") {
    val mp3 = AudioHeader.synthesizeMp3(mpeg1 = true, brIdx = 9,
      srIdx = 0, mono = true, nFrames = 4)
    assert(AudioHeader.parseMp3(mp3.dropRight(10)) === None)
    assert(AudioHeader.parseMp3(mp3 ++ Array[Byte](1, 2, 3)) === None)
    val bad = mp3.clone(); bad(1) = 0x00 // first frame loses sync
    assert(AudioHeader.parseMp3(bad) === None)
    assert(AudioHeader.parseMp3(null) === None)
    assert(AudioHeader.parseMp3(Array.emptyByteArray) === None)
    // ID3v2 size running past EOF
    val id3Only = AudioHeader.synthesizeMp3(mpeg1 = true, brIdx = 1,
      srIdx = 0, mono = true, nFrames = 1, id3Size = 50).take(30)
    assert(AudioHeader.parseMp3(id3Only) === None)
    val rnd = new scala.util.Random(13)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte)
      AudioHeader.parseMp3(bytes) // must not throw
    }
    // byte-mutation fuzz of a VALID stream reaches deep walk paths
    (1 to 300).foreach { _ =>
      val m = mp3.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      AudioHeader.parseMp3(m) // must not throw
    }
  }

  test("parseFlac extracts STREAMINFO exactly (20-bit rate, 36-bit " +
    "total, padding-block walk); hostile headers -> None") {
    val f = AudioHeader.parseFlac(AudioHeader.synthesizeFlac(
      44100, 2, 16, 123456L, padLen = 12)).get
    assert(f.sampleRate === 44100)
    assert(f.channels === 2)
    assert(f.bitsPerSample === 16)
    assert(f.totalSamples === 123456L)
    assert(f.durationMs === 123456L * 1000 / 44100)
    // field-width extremes roundtrip bit-exactly
    val g = AudioHeader.parseFlac(AudioHeader.synthesizeFlac(
      1048575, 8, 32, (1L << 36) - 1)).get
    assert(g.sampleRate === 1048575)
    assert(g.channels === 8)
    assert(g.bitsPerSample === 32)
    assert(g.totalSamples === (1L << 36) - 1)
    val ok = AudioHeader.synthesizeFlac(8000, 1, 16, 100L)
    assert(AudioHeader.parseFlac(ok.dropRight(5)) === None)
    assert(AudioHeader.parseFlac("fLaCxx".getBytes) === None)
    assert(AudioHeader.parseFlac(null) === None)
    // zero sample rate is malformed
    val zr = ok.clone(); zr(18) = 0; zr(19) = 0
    zr(20) = (zr(20) & 0x0f).toByte
    assert(AudioHeader.parseFlac(zr) === None)
    // a non-STREAMINFO first block violates the spec rule
    val swapped = ok.clone(); swapped(4) = (0x80 | 1).toByte
    assert(AudioHeader.parseFlac(swapped) === None)
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val m = ok.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      AudioHeader.parseFlac(m) // must not throw
    }
  }

  test("audio feature columns stay bit-identical across partitionings") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      (i.toLong, AudioHeader.synthesizeWavPcm16(
        8000 + i, tone.take(500 + i * 7)))
    }
    // drop the media column before comparing: Array[Byte].toString is
    // identity-based, not content-based
    val a = Multimodal.withAudioFeatures(
      rows.toDF("id", "media").repartition(1), "media")
      .drop("media").orderBy("id").collect().map(_.toString)
    val b = Multimodal.withAudioFeatures(
      rows.toDF("id", "media").repartition(13), "media")
      .drop("media").orderBy("id").collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }
}
