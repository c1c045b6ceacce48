package graft.operators

/** Pure-JVM audio container parsing: RIFF/WAVE header fields plus exact
  * integer PCM16 signal statistics, no codec libraries. This makes the
  * multimodal audio feature columns (`sample_rate`, `channels`,
  * `bits_per_sample`, `n_samples`, duration) REAL for the container a
  * training-data pipeline meets most (WAV), the way [[ImageHeader]]
  * does for images; compressed codecs (mp3/opus/aac) stay stubbed —
  * no codecs in this container (builder brief). Layout is from the
  * public spec: RIFF chunk grammar (Microsoft/IBM Multimedia
  * Programming Interface 1.0, 1991) with the `fmt ` chunk's
  * WAVEFORMATEX fields, all little-endian.
  *
  * Reference analog: the reference has no media path at all; this is
  * part of the pipeline surface the survey adds beyond it (SURVEY.md
  * §2 multimodal extensions).
  */
object AudioHeader {

  /** Parsed `fmt ` fields + data-chunk geometry. `nSamples` counts
    * per-channel sample frames in the `data` chunk.
    */
  final case class Info(
      format: String,
      audioFormat: Int,
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      nSamples: Long,
      durationMs: Long)

  /** Exact integer PCM16 signal stats: peak = max |sample| and
    * sumSq = Σ sample² (for RMS downstream), nClipped = samples at
    * full scale (±32767/−32768). Integer-only, so results are
    * bit-reproducible across engines and partitionings.
    */
  final case class Pcm16Stats(
      n: Long, peak: Int, sumSq: Long, nClipped: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE header, or None when the signature doesn't
    * match or the chunks are truncated/corrupt. Never throws on
    * arbitrary bytes. Walks the chunk list (chunks are word-aligned:
    * odd sizes carry a pad byte) until both `fmt ` and `data` are
    * seen — tolerates LIST/fact/cue chunks in between, as real
    * in-the-wild WAV files have.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // audioFmt, ch, rate, bits
    var dataLen = -1L
    while (off + 8 <= bytes.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      if (id == "fmt " && sz >= 16)
        fmt = Some((le16(bytes, off + 8), le16(bytes, off + 10),
          le32(bytes, off + 12).toInt, le16(bytes, off + 22)))
      else if (id == "data") dataLen = sz
      off += 8 + sz.toInt + (sz.toInt & 1) // word alignment pad
    }
    fmt.flatMap { case (af, ch, rate, bits) =>
      if (ch <= 0 || rate <= 0 || bits <= 0 || dataLen < 0) None
      else {
        val bytesPerFrame = ch.toLong * ((bits + 7) / 8)
        val n = if (bytesPerFrame == 0) 0L else dataLen / bytesPerFrame
        Some(Info("wav", af, ch, rate, bits, n,
          n * 1000L / rate))
      }
    }
  }

  /** Exact PCM16 stats over the `data` chunk of a parsed WAV (16-bit
    * only; returns None otherwise). Samples are interleaved LE int16
    * across channels; stats pool all channels.
    */
  def pcm16Stats(bytes: Array[Byte]): Option[Pcm16Stats] =
    parse(bytes).filter(_.bitsPerSample == 16).flatMap { info =>
      dataChunk(bytes).map { case (off, len) =>
        var i = off
        val end = off + (len - (len % 2)).toInt
        var n = 0L; var peak = 0; var sumSq = 0L; var clipped = 0L
        while (i + 1 < end) {
          val v = (le16(bytes, i) << 16) >> 16 // sign-extend
          val a = math.abs(v)
          if (a > peak) peak = a
          sumSq += v.toLong * v
          if (v == 32767 || v == -32768) clipped += 1
          n += 1
          i += 2
        }
        Pcm16Stats(n, peak, sumSq, clipped)
      }
    }

  /** Extract the interleaved PCM16 sample stream from a parsed WAV
    * (16-bit only; None otherwise) — the decode step feeding
    * [[AudioFingerprint]]'s spectrogram. A trailing odd byte in a
    * malformed data chunk is dropped, matching [[pcm16Stats]].
    */
  def pcm16Samples(bytes: Array[Byte]): Option[Array[Short]] =
    parse(bytes).filter(_.bitsPerSample == 16).flatMap { _ =>
      dataChunk(bytes).map { case (off, len) =>
        val n = ((len - (len % 2)) / 2).toInt
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = le16(bytes, off + 2 * i).toShort
          i += 1
        }
        out
      }
    }

  /** Delta-coded envelope hash — the audio analog of the image dHash
    * and the classic cheap audio near-dup primitive: the PCM16 stream
    * splits into `windows` equal spans (sample i lands in window
    * floor(i*windows/n) — exact integer partition), env(w) = exact
    * Σ|sample| per window, bit w set iff env(w) > env(w+1) for
    * w < min(windows-1, 64). Loudness-profile-invariant to small
    * per-sample jitter, integer-exact, replayable relationally.
    * None for non-PCM16/unparseable blobs; an empty data chunk
    * hashes to 0.
    */
  def envelopeHash(bytes: Array[Byte], windows: Int = 65): Option[Long] = {
    require(windows >= 2, s"envelopeHash: windows=$windows")
    parse(bytes).filter(_.bitsPerSample == 16).flatMap { _ =>
      dataChunk(bytes).map { case (off, len) =>
        val n = ((len - (len % 2)) / 2).toInt
        val env = new Array[Long](windows)
        var i = 0
        while (i < n) {
          val v = (le16(bytes, off + 2 * i) << 16) >> 16
          env((i.toLong * windows / n).toInt) += math.abs(v)
          i += 1
        }
        var bits = 0L
        var w = 0
        while (w < windows - 1 && w < 64) {
          if (env(w) > env(w + 1)) bits |= 1L << w
          w += 1
        }
        bits
      }
    }
  }

  private def dataChunk(bytes: Array[Byte]): Option[(Int, Long)] = {
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val sz = le32(bytes, off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      if (id == "data") return Some((off + 8, sz))
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  /** Build a minimal valid PCM16 WAV blob — test fixture + docs-level
    * executable spec of the layout this parser reads.
    */
  def synthesizeWavPcm16(
      sampleRate: Int, samples: Array[Short],
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer
      .allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
