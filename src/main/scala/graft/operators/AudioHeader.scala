package graft.operators

/** Pure-JVM audio container parsing: RIFF/WAVE header fields plus exact
  * integer PCM16 signal statistics, no codec libraries. This makes the
  * multimodal audio feature columns (`sample_rate`, `channels`,
  * `bits_per_sample`, `n_samples`, duration) REAL for the container a
  * training-data pipeline meets most (WAV), the way [[ImageHeader]]
  * does for images. Compressed-codec DECODE lives elsewhere where it
  * is tractable in pure JVM ([[FlacDecode]], [[AudioCodecs]] for
  * G.711/ADPCM); MP3/AAC/Opus/Vorbis payloads stay metadata-only
  * (frame walks here and in [[OggHeader]]) — DSP codecs are out of
  * scope by brief. Layout is from the public spec: RIFF chunk
  * grammar (Microsoft/IBM Multimedia Programming Interface 1.0,
  * 1991) with the `fmt ` chunk's WAVEFORMATEX fields, all
  * little-endian.
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

  private[operators] def dataChunk(bytes: Array[Byte]): Option[(Int, Long)] = {
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

  // ------------------------------------------------------------------
  // MP3 (MPEG Layer III) frame-header walk — the compressed-audio twin
  // of the TIFF IFD / ISO-BMFF box walks: metadata-level (bitrate /
  // sample rate / exact frame count / duration), no DSP decode
  // claimed. Layout per ISO/IEC 11172-3 §2.4.1.3 and 13818-3.
  // ------------------------------------------------------------------

  /** Parsed MP3 stream facts from the full frame walk. `bitrateKbps`,
    * `sampleRate`, `channels` are FIRST-FRAME-ONLY by contract (a VBR
    * or mixed-rate stream may legally vary later frames); `nFrames` /
    * `nSamples` / `durationMs` from walking EVERY frame header
    * (1152 samples per MPEG-1 Layer III frame, 576 for MPEG-2/2.5).
    * `durationMs` is exact for mixed-rate streams: samples are summed
    * per distinct rate and converted per-bucket, not divided by the
    * first frame's rate.
    */
  final case class Mp3Info(
      version: String, bitrateKbps: Int, sampleRate: Int,
      channels: Int, nFrames: Int, nSamples: Long, durationMs: Long)

  /** MPEG-1 Layer III bitrate table (kbps, index 1..14). */
  val Mp3BitrateV1L3: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-2/2.5 Layer III bitrate table (kbps, index 1..14). */
  val Mp3BitrateV2L3: Array[Int] =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Sample-rate tables by version (index 0..2). */
  val Mp3RateV1: Array[Int] = Array(44100, 48000, 32000)
  val Mp3RateV2: Array[Int] = Array(22050, 24000, 16000)
  val Mp3RateV25: Array[Int] = Array(11025, 12000, 8000)

  /** Walk an MP3 stream: optional ID3v2 prefix (syncsafe size), then
    * consecutive Layer III frame headers — frame length = 144000 *
    * kbps / rate + padding for MPEG-1 (72000 for MPEG-2/2.5). Returns
    * None (never throws) unless every byte is accounted for: ID3v2 +
    * frames + an optional trailing 128-byte ID3v1 "TAG" block.
    * Reserved version/layer/bitrate/rate codes and frames running
    * past EOF are malformed — None deliberately, not via exception.
    */
  def parseMp3(bytes: Array[Byte]): Option[Mp3Info] = {
    if (bytes == null || bytes.length < 4) return None
    var off = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = (u8(bytes, 6) & 0x7f) << 21 | (u8(bytes, 7) & 0x7f) << 14 |
        (u8(bytes, 8) & 0x7f) << 7 | (u8(bytes, 9) & 0x7f)
      val skip = 10L + sz
      if (skip >= bytes.length) return None
      off = skip.toInt
    }
    var nFrames = 0
    var nSamples = 0L
    // samples grouped per distinct sample rate: keeps durationMs exact
    // for mixed-rate (VBR-style) streams instead of dividing the total
    // by the first frame's rate. bitrateKbps/sampleRate in Mp3Info stay
    // first-frame-only by contract (documented on the case class).
    val samplesByRate = scala.collection.mutable.LinkedHashMap[Int, Long]()
    var first: Option[(String, Int, Int, Int)] = None
    var ok = true
    while (ok && off + 4 <= bytes.length) {
      val h = u8(bytes, off) << 24 | u8(bytes, off + 1) << 16 |
        u8(bytes, off + 2) << 8 | u8(bytes, off + 3)
      if ((h >>> 21) != 0x7ff) ok = false
      else {
        val verBits = (h >>> 19) & 3 // 0=2.5, 1=reserved, 2=2, 3=1
        val layerBits = (h >>> 17) & 3 // 1=III
        val brIdx = (h >>> 12) & 15
        val srIdx = (h >>> 10) & 3
        val pad = (h >>> 9) & 1
        val mode = (h >>> 6) & 3
        if (verBits == 1 || layerBits != 1 || brIdx == 0 ||
            brIdx == 15 || srIdx == 3) ok = false
        else {
          val mpeg1 = verBits == 3
          val kbps =
            (if (mpeg1) Mp3BitrateV1L3 else Mp3BitrateV2L3)(brIdx)
          val rate = (verBits match {
            case 3 => Mp3RateV1
            case 2 => Mp3RateV2
            case _ => Mp3RateV25
          })(srIdx)
          val flen = (if (mpeg1) 144000 else 72000) * kbps / rate + pad
          if (flen < 4 || off.toLong + flen > bytes.length) ok = false
          else {
            if (first.isEmpty) first = Some((
              if (mpeg1) "mpeg1" else if (verBits == 2) "mpeg2"
              else "mpeg2.5",
              kbps, rate, if (mode == 3) 1 else 2))
            nFrames += 1
            val spf = if (mpeg1) 1152L else 576L
            nSamples += spf
            samplesByRate(rate) = samplesByRate.getOrElse(rate, 0L) + spf
            off += flen
          }
        }
      }
    }
    val tailOk = off == bytes.length ||
      (bytes.length - off == 128 && bytes(off) == 'T' &&
        bytes(off + 1) == 'A' && bytes(off + 2) == 'G')
    first.filter(_ => nFrames > 0 && tailOk).map {
      case (v, kbps, rate, ch) =>
        val durMs = samplesByRate.iterator
          .map { case (r, s) => s * 1000 / r }.sum
        Mp3Info(v, kbps, rate, ch, nFrames, nSamples, durMs)
    }
  }

  /** ID3v2 text frames (the MP3 -> text-pipeline bridge, the audio
    * twin of [[graft.operators.Multimodal.mp4Cues]]): walk an ID3v2.3
    * or v2.4 tag's frames and decode the text frames (ids starting
    * with 'T', an encoding byte then the payload — ISO-8859-1 (0) and
    * UTF-8 (3) supported; UTF-16 variants are skipped, not mangled).
    * Frame sizes are plain 32-bit BE in v2.3 and syncsafe in v2.4,
    * per the informal standards. Returns (frame id, text) pairs in
    * tag order; bytes without a well-formed ID3v2 tag return empty —
    * never throws.
    */
  def id3TextFrames(bytes: Array[Byte]): Seq[(String, String)] =
    id3Frames(bytes).collect {
      case (id, p) if id.startsWith("T") && p.length >= 1 &&
          id.forall(c => c.isUpper || c.isDigit) &&
          (u8(p, 0) == 0 || u8(p, 0) == 3) =>
        val cs =
          if (u8(p, 0) == 0) java.nio.charset.StandardCharsets.ISO_8859_1
          else java.nio.charset.StandardCharsets.UTF_8
        var len = p.length - 1
        // strip one trailing NUL terminator if present
        if (len > 0 && p(len) == 0) len -= 1
        id -> new String(p, 1, len, cs)
      // UTF-16 encodings (1/2): skipped by the guard, never mangled
    }

  /** ID3v2 APIC (attached picture) frames — the MP3 -> IMAGE bridge,
    * the album-art twin of [[graft.operators.Multimodal.mp4Cues]]'
    * MP4 -> text bridge: per the informal standard an APIC payload is
    * an encoding byte, a NUL-terminated ISO-8859-1 mime string, a
    * picture-type byte, a NUL-terminated description (latin1/UTF-8
    * only — UTF-16 descriptions are skipped, never mangled), then the
    * raw image bytes; v2.2's PIC frames (3-char image format instead
    * of a mime) report under the equivalent mime. Returns (mime,
    * pictureType, imageBytes) in tag order; malformed payloads are
    * skipped; never throws.
    */
  def id3ApicFrames(bytes: Array[Byte]): Seq[(String, Int, Array[Byte])] =
    id3Frames(bytes).flatMap {
      case ("APIC", p) =>
        if (p.length < 4) None
        else {
          val enc = u8(p, 0)
          val mimeEnd = p.indexWhere(_ == 0, 1)
          if (mimeEnd < 0 || (enc != 0 && enc != 3) ||
              mimeEnd + 2 > p.length) None
          else {
            val mime = new String(p, 1, mimeEnd - 1,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val picType = u8(p, mimeEnd + 1)
            val descEnd = p.indexWhere(_ == 0, mimeEnd + 2)
            if (descEnd < 0 || descEnd + 1 > p.length) None
            else Some((mime, picType,
              java.util.Arrays.copyOfRange(p, descEnd + 1, p.length)))
          }
        }
      case ("PIC", p) =>
        // v2.2's picture frame: encoding byte, a 3-char image FORMAT
        // ("PNG"/"JPG"), picture type, NUL-terminated description,
        // data — reported under the equivalent mime
        if (p.length < 6) None
        else {
          val enc = u8(p, 0)
          if (enc != 0 && enc != 3) None
          else {
            val fmt = new String(p, 1, 3,
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val picType = u8(p, 4)
            val descEnd = p.indexWhere(_ == 0, 5)
            if (descEnd < 0) None
            else Some(("image/" + fmt.trim.toLowerCase, picType,
              java.util.Arrays.copyOfRange(p, descEnd + 1, p.length)))
          }
        }
      case _ => None
    }

  /** Walk an ID3v2.2/v2.3/v2.4 tag's frames: (id, payload) pairs in
    * tag order — the shared walk behind [[id3TextFrames]] and
    * [[id3ApicFrames]]. Frame headers are 6 bytes in v2.2 (3-char
    * id, 3-byte BE size), 10 bytes with plain 32-bit sizes in v2.3,
    * and syncsafe in v2.4. The v2.2/v2.3 WHOLE-TAG unsynchronisation
    * flag (0x80) is honored by de-stuffing (FF 00 -> FF) before the
    * walk; v2.4's flag means PER-FRAME unsync, which this walk
    * doesn't decode — such tags return empty, never mangled text.
    * Extended headers (0x40) are skipped by their declared size
    * (v2.3 excludes its own 4 size bytes, v2.4 includes itself).
    * Malformed tags return empty; never throws.
    */
  private def id3Frames(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    if (bytes == null || bytes.length < 10) return Seq.empty
    if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3'))
      return Seq.empty
    val major = u8(bytes, 3)
    if (major < 2 || major > 4) return Seq.empty
    val flags = u8(bytes, 5)
    val tagSize = (u8(bytes, 6) & 0x7f) << 21 | (u8(bytes, 7) & 0x7f) << 14 |
      (u8(bytes, 8) & 0x7f) << 7 | (u8(bytes, 9) & 0x7f)
    if (major == 4 && (flags & 0x80) != 0) return Seq.empty
    if (major == 2 && (flags & 0x40) != 0) return Seq.empty // compression
    val rawEnd = math.min(10L + tagSize, bytes.length.toLong).toInt
    // whole-tag de-unsynchronisation (v2.2/v2.3): FF 00 -> FF
    val b: Array[Byte] =
      if ((flags & 0x80) == 0)
        java.util.Arrays.copyOfRange(bytes, 10, rawEnd)
      else {
        val o = new java.io.ByteArrayOutputStream()
        var i = 10
        while (i < rawEnd) {
          o.write(bytes(i))
          if (bytes(i) == 0xff.toByte && i + 1 < rawEnd &&
            bytes(i + 1) == 0) i += 2
          else i += 1
        }
        o.toByteArray
      }
    var off = 0
    // extended header: skip by declared size
    if (major >= 3 && (flags & 0x40) != 0) {
      if (b.length < 4) return Seq.empty
      def be32(i: Int): Long = (b(i) & 0xffL) << 24 |
        (b(i + 1) & 0xff) << 16 | (b(i + 2) & 0xff) << 8 | (b(i + 3) & 0xff)
      def ss32(i: Int): Long = (b(i) & 0x7fL) << 21 |
        (b(i + 1) & 0x7f) << 14 | (b(i + 2) & 0x7f) << 7 | (b(i + 3) & 0x7f)
      val skip = if (major == 3) 4 + be32(0) else ss32(0)
      if (skip < 4 || skip > b.length) return Seq.empty
      off = skip.toInt
    }
    val idLen = if (major == 2) 3 else 4
    val headLen = if (major == 2) 6 else 10
    val out = new scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var ok = true
    while (ok && off + headLen <= b.length) {
      val id = new String(b, off, idLen,
        java.nio.charset.StandardCharsets.US_ASCII)
      if (id(0) == 0) ok = false // padding reached
      else {
        val size: Long = major match {
          case 2 => (u8(b, off + 3).toLong << 16) |
            (u8(b, off + 4) << 8) | u8(b, off + 5)
          case 4 =>
            ((u8(b, off + 4) & 0x7f).toLong << 21) |
              ((u8(b, off + 5) & 0x7f) << 14) |
              ((u8(b, off + 6) & 0x7f) << 7) |
              (u8(b, off + 7) & 0x7f)
          case _ => (u8(b, off + 4).toLong << 24) |
            (u8(b, off + 5) << 16) | (u8(b, off + 6) << 8) |
            u8(b, off + 7)
        }
        if (off + headLen + size > b.length) ok = false
        else {
          out += id -> java.util.Arrays.copyOfRange(
            b, off + headLen, off + headLen + size.toInt)
          off += headLen + size.toInt
        }
      }
    }
    out.toSeq
  }

  /** Build an ID3v2 tag block carrying the given text frames and
    * optional picture frames (APIC in v2.3/v2.4 — UTF-8 encoding
    * byte, latin1 mime + NUL, picture type, empty description + NUL,
    * raw image bytes; PIC with the 3-char format in v2.2) — fixture
    * + executable spec of [[id3TextFrames]] / [[id3ApicFrames]]
    * (v2.2 6-byte headers, v2.3 plain or v2.4 syncsafe frame sizes,
    * optional padding, optional v2.2/v2.3 WHOLE-TAG
    * unsynchronisation: FF 00 stuffing over the finished body).
    */
  def synthesizeId3v2(
      frames: Seq[(String, String)], major: Int = 3,
      padding: Int = 0,
      apic: Seq[(String, Int, Array[Byte])] = Seq.empty,
      unsync: Boolean = false): Array[Byte] = {
    require(major >= 2 && major <= 4, s"major: $major")
    require(!unsync || major <= 3, "whole-tag unsync is v2.2/v2.3")
    val idLen = if (major == 2) 3 else 4
    require(frames.forall(_._1.length == idLen),
      s"frame ids are $idLen chars in v2.$major")
    val body = new scala.collection.mutable.ArrayBuffer[Byte]()
    def frame(id: String, payload: Array[Byte]): Unit = {
      body ++= id.getBytes("US-ASCII")
      val sz = payload.length
      major match {
        case 2 =>
          body ++= Array(((sz >> 16) & 0xff).toByte,
            ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte)
        case 4 =>
          body ++= Array(((sz >> 21) & 0x7f).toByte,
            ((sz >> 14) & 0x7f).toByte,
            ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte)
          body ++= Array[Byte](0, 0) // flags
        case _ =>
          body ++= Array((sz >> 24).toByte, (sz >> 16).toByte,
            (sz >> 8).toByte, sz.toByte)
          body ++= Array[Byte](0, 0) // flags
      }
      body ++= payload
    }
    frames.foreach { case (id, text) =>
      frame(id, Array(3.toByte) ++ text.getBytes("UTF-8"))
    }
    apic.foreach { case (mime, picType, img) =>
      if (major == 2) {
        val fmt = mime.stripPrefix("image/").toUpperCase.take(3)
        require(fmt.length == 3, s"v2.2 PIC format from mime $mime")
        frame("PIC", Array(3.toByte) ++ fmt.getBytes("ISO-8859-1") ++
          Array(picType.toByte, 0.toByte) ++ img)
      } else
        frame("APIC", Array(3.toByte) ++ mime.getBytes("ISO-8859-1") ++
          Array(0.toByte, picType.toByte, 0.toByte) ++ img)
    }
    body ++= Array.fill[Byte](padding)(0)
    val stuffed =
      if (!unsync) body
      else body.flatMap(b =>
        if (b == 0xff.toByte) Seq(b, 0.toByte) else Seq(b))
    val sz = stuffed.length
    require(sz < (1 << 28), "tag too large")
    "ID3".getBytes("US-ASCII") ++
      Array(major.toByte, 0.toByte,
        (if (unsync) 0x80 else 0).toByte,
        ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
        ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte) ++ stuffed
  }

  /** Build a spec-layout MP3: optional ID3v2 prefix, `nFrames` Layer
    * III frames (padding bit alternating per `padEvery`), deterministic
    * filler payloads — fixture + executable spec of [[parseMp3]].
    */
  def synthesizeMp3(
      mpeg1: Boolean, brIdx: Int, srIdx: Int, mono: Boolean,
      nFrames: Int, id3Size: Int = 0,
      padEvery: Int = 2): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2,
      s"brIdx/srIdx out of range: $brIdx/$srIdx")
    require(nFrames >= 1 && padEvery >= 1, s"nFrames/padEvery")
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    if (id3Size > 0) {
      out ++= "ID3".getBytes("US-ASCII")
      out += 3; out += 0; out += 0 // version 2.3.0, flags 0
      out += ((id3Size >> 21) & 0x7f).toByte
      out += ((id3Size >> 14) & 0x7f).toByte
      out += ((id3Size >> 7) & 0x7f).toByte
      out += (id3Size & 0x7f).toByte
      (0 until id3Size).foreach(i => out += (i % 251).toByte)
    }
    val verBits = if (mpeg1) 3 else 2
    val kbps = (if (mpeg1) Mp3BitrateV1L3 else Mp3BitrateV2L3)(brIdx)
    val rate = (if (mpeg1) Mp3RateV1 else Mp3RateV2)(srIdx)
    (0 until nFrames).foreach { f =>
      val pad = if (f % padEvery == 0) 1 else 0
      val flen = (if (mpeg1) 144000 else 72000) * kbps / rate + pad
      out += 0xff.toByte
      out += (0xe0 | (verBits << 3) | (1 << 1) | 1).toByte
      out += ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      out += (if (mono) (3 << 6) else 0).toByte
      (4 until flen).foreach(i => out += ((f * 31 + i) % 251).toByte)
    }
    out.toArray
  }

  // ------------------------------------------------------------------
  // FLAC STREAMINFO parse — metadata-block walk per the FLAC format
  // spec (RFC 9639 §8): magic, block headers (last-flag + type +
  // 24-bit BE length), STREAMINFO field extraction.
  // ------------------------------------------------------------------

  /** Parsed FLAC STREAMINFO facts. */
  final case class FlacInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long)

  /** Parse a FLAC header: "fLaC" magic, then the metadata-block walk.
    * STREAMINFO must be the first block (spec rule — enforced);
    * subsequent blocks (padding, vorbis comment, ...) are walked for
    * bounds only. Truncated blocks, a zero sample rate, or a
    * non-STREAMINFO first block return None deliberately.
    */
  def parseFlac(bytes: Array[Byte]): Option[FlacInfo] = {
    if (bytes == null || bytes.length < 8) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
        bytes(3) == 'C')) return None
    var off = 4
    var info: Option[FlacInfo] = None
    var last = false
    var firstBlock = true
    while (!last && off + 4 <= bytes.length) {
      val h = u8(bytes, off)
      last = (h & 0x80) != 0
      val tp = h & 0x7f
      val len = u8(bytes, off + 1) << 16 | u8(bytes, off + 2) << 8 |
        u8(bytes, off + 3)
      if (off + 4L + len > bytes.length) return None
      if (firstBlock && tp != 0) return None
      if (tp == 0) {
        if (len < 34 || info.isDefined) return None
        val b = off + 4
        val rate = u8(bytes, b + 10) << 12 | u8(bytes, b + 11) << 4 |
          (u8(bytes, b + 12) >>> 4)
        val ch = ((u8(bytes, b + 12) >>> 1) & 7) + 1
        val bps = (((u8(bytes, b + 12) & 1) << 4) |
          (u8(bytes, b + 13) >>> 4)) + 1
        val total = (u8(bytes, b + 13) & 0xf).toLong << 32 |
          u8(bytes, b + 14).toLong << 24 | u8(bytes, b + 15).toLong << 16 |
          u8(bytes, b + 16).toLong << 8 | u8(bytes, b + 17).toLong
        if (rate == 0) return None
        info = Some(FlacInfo(rate, ch, bps, total, total * 1000 / rate))
      }
      firstBlock = false
      off += 4 + len
    }
    info.filter(_ => last)
  }

  /** Build a spec-layout FLAC header: STREAMINFO (+ an optional
    * PADDING block so the walk is exercised) — fixture + executable
    * spec of [[parseFlac]]. Header-level only: no audio frames.
    */
  def synthesizeFlac(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, padLen: Int = 0): Array[Byte] = {
    require(sampleRate >= 1 && sampleRate < (1 << 20), s"rate: $sampleRate")
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps: $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), "totalSamples")
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // min/max blocksize 4096
    // min/max frame size (bytes 4-9) stay 0 = unknown
    si(10) = ((sampleRate >> 12) & 0xff).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    // bytes 18-33: md5 of the unencoded audio — zeros (unknown)
    def blockHeader(tp: Int, len: Int, isLast: Boolean): Array[Byte] =
      Array((((if (isLast) 0x80 else 0) | tp) & 0xff).toByte,
        ((len >> 16) & 0xff).toByte, ((len >> 8) & 0xff).toByte,
        (len & 0xff).toByte)
    val head = "fLaC".getBytes("US-ASCII") ++
      blockHeader(0, 34, isLast = padLen == 0) ++ si
    if (padLen == 0) head
    else head ++ blockHeader(1, padLen, isLast = true) ++
      new Array[Byte](padLen)
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
