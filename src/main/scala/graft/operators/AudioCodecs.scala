package graft.operators

/** Compressed-WAV sample decode — two more slices of the
  * compressed-codec gap a pure-JVM pipeline CAN close exactly:
  *
  *   - **G.711 µ-law / A-law** (ITU-T G.711): the telephony codecs —
  *     one byte per sample, decoded through the published segmented
  *     quantization (bijective on code values, so the decode is
  *     EXACT, not approximate). WAV carries them as audioFormat 7
  *     (µ-law) / 6 (A-law), 8 bits per sample.
  *   - **IMA/DVI ADPCM** (audioFormat 17, 4 bits per sample): the
  *     classic block-based differential codec — per-block header
  *     (little-endian 16-bit predictor seed, step-table index), then
  *     two nibbles per byte through the published 89-entry step
  *     table and 8-entry index-adaptation table, clamped exactly as
  *     the spec prescribes. Decode is bit-exact against the
  *     algorithm; the ENCODE side is lossy by nature, so specs pin
  *     decode(encode(x)) to a measured error bound plus exact
  *     decode-table properties, never sample identity.
  *
  * [[samples]] is the one WAV entry point dispatching on the fmt
  * chunk's audioFormat — PCM16 (1), A-law (6), µ-law (7), IMA ADPCM
  * (17); anything else (true proprietary codecs) stays None honestly.
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object AudioCodecs {

  // ------------------------------------------------------------------
  // G.711 (ITU-T G.711 tables; the classic public reference shape)
  // ------------------------------------------------------------------

  /** µ-law code byte -> linear PCM16: complement, then
    * ((mantissa << 3) + 0x84) << exponent, re-biased and signed.
    * Exact for all 256 codes; max magnitude 32124.
    */
  def muLawDecode(code: Int): Short = {
    val u = ~code & 0xff
    var t = ((u & 0xf) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
  }

  /** A-law code byte -> linear PCM16: XOR 0x55, segmented expansion;
    * sign bit SET means positive (the A-law convention). Exact for
    * all 256 codes; max magnitude 32256.
    */
  def aLawDecode(code: Int): Short = {
    val a = code ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0xf) << 4
    t = seg match {
      case 0 => t + 8
      case 1 => t + 0x108
      case _ => (t + 0x108) << (seg - 1)
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** Segment upper bounds shared by both encoders (the classic
    * public-domain G.711 reference shape).
    */
  private val SegEnd: Array[Int] = Array(
    0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff, 0x1fff, 0x3fff, 0x7fff)

  /** Linear PCM16 -> µ-law code (bias + segment search) — the fixture
    * encoder; encode(decode(code)) == code for every code except the
    * negative-zero 0x7F (both zero codes decode to 0, which re-encodes
    * to the canonical 0xFF).
    */
  def muLawEncode(sample: Short): Int = {
    var pcm = sample.toInt
    val mask = if (pcm < 0) { pcm = 0x84 - pcm; 0x7f }
      else { pcm += 0x84; 0xff }
    var seg = 0
    while (seg < 8 && pcm > SegEnd(seg)) seg += 1
    if (seg >= 8) 0x7f ^ mask
    else (((seg << 4) | ((pcm >> (seg + 3)) & 0xf)) ^ mask) & 0xff
  }

  /** Linear PCM16 -> A-law code — the fixture encoder;
    * encode(decode(code)) == code for every one of the 256 codes.
    */
  def aLawEncode(sample: Short): Int = {
    var pcm = sample.toInt
    val mask = if (pcm >= 0) 0xd5 else { pcm = -pcm - 8; 0x55 }
    var seg = 0
    while (seg < 8 && pcm > SegEnd(seg)) seg += 1
    if (seg >= 8) (0x7f ^ mask) & 0xff
    else {
      val aval = (seg << 4) |
        (if (seg < 2) (pcm >> 4) & 0xf else (pcm >> (seg + 3)) & 0xf)
      (aval ^ mask) & 0xff
    }
  }

  // ------------------------------------------------------------------
  // IMA/DVI ADPCM (the published step + index-adaptation tables)
  // ------------------------------------------------------------------

  /** The 89-entry IMA step-size table. */
  val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** The nibble -> step-index adaptation table (low 3 bits). */
  val ImaIndexAdjust: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampIdx(i: Int): Int = math.max(0, math.min(88, i))
  private def clamp16(v: Int): Int =
    math.max(-32768, math.min(32767, v))

  /** Decode one nibble against (predictor, index); returns the new
    * (predictor, index). The published IMA decoder step.
    */
  def imaStep(pred: Int, index: Int, nibble: Int): (Int, Int) = {
    val step = ImaStep(index)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p = clamp16(
      if ((nibble & 8) != 0) pred - diff else pred + diff)
    (p, clampIdx(index + ImaIndexAdjust(nibble & 7)))
  }

  /** Encode one sample against (predictor, index); returns
    * (nibble, new predictor, new index) — predictor updated through
    * the DECODER's own step so encoder and decoder state never drift
    * (the spec's closed-loop design).
    */
  def imaEncodeStep(sample: Int, pred: Int, index: Int): (Int, Int, Int) = {
    val step = ImaStep(index)
    var delta = sample - pred
    var nibble = 0
    if (delta < 0) { nibble = 8; delta = -delta }
    if (delta >= step) { nibble |= 4; delta -= step }
    if (delta >= (step >> 1)) { nibble |= 2; delta -= step >> 1 }
    if (delta >= (step >> 2)) nibble |= 1
    val (p, i) = imaStep(pred, index, nibble)
    (nibble, p, i)
  }

  // ------------------------------------------------------------------
  // WAV plumbing
  // ------------------------------------------------------------------

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int =
    (u8(b, i + 1) << 8) | u8(b, i)

  /** fmt-chunk fields [[samples]] needs beyond AudioHeader.Info:
    * blockAlign (the ADPCM block size). None when fmt is absent.
    */
  private def blockAlign(bytes: Array[Byte]): Option[Int] = {
    var off = 12
    while (off + 8 <= bytes.length) {
      val id = new String(bytes, off, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val sz = (u8(bytes, off + 7).toLong << 24) |
        (u8(bytes, off + 6) << 16) | (u8(bytes, off + 5) << 8) |
        u8(bytes, off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None
      if (id == "fmt " && sz >= 16)
        return Some(le16(bytes, off + 8 + 12))
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    None
  }

  /** The one WAV sample entry point, normalized to PCM16: audioFormat
    * 1 at 16 bits (verbatim), 8 bits (unsigned, re-centered and
    * scaled: (v - 128) << 8 — the exact inverse of the standard 8-bit
    * store), and 24 bits (high 16 bits — the standard down-conversion,
    * documented precision loss); audioFormat 3 at 32 bits (IEEE float,
    * clamped x32767); audioFormat 6 (A-law), 7 (µ-law), and 17 (IMA
    * ADPCM, mono and the standard stereo channel-word interleave).
    * None for anything else — a proprietary payload never
    * gets approximate samples. Mirrors [[AudioHeader.pcm16Samples]]'s
    * hostile-input contract: malformed containers return None, never
    * throw.
    */
  def samples(bytes: Array[Byte]): Option[Array[Short]] =
    AudioHeader.parse(bytes).flatMap { info =>
      (info.audioFormat, info.bitsPerSample) match {
        case (1, 16) => AudioHeader.pcm16Samples(bytes)
        case (1, 8) =>
          AudioHeader.dataChunk(bytes).map { case (off, len) =>
            Array.tabulate(len.toInt)(i =>
              ((u8(bytes, off + i) - 128) << 8).toShort)
          }
        case (1, 24) =>
          AudioHeader.dataChunk(bytes).map { case (off, len) =>
            val n = (len / 3).toInt
            Array.tabulate(n) { i =>
              // LE 24-bit: the top two bytes are the PCM16 value
              ((u8(bytes, off + 3 * i + 2) << 8) |
                u8(bytes, off + 3 * i + 1)).toShort
            }
          }
        case (3, 32) =>
          AudioHeader.dataChunk(bytes).map { case (off, len) =>
            val n = (len / 4).toInt
            Array.tabulate(n) { i =>
              val bits = (u8(bytes, off + 4 * i + 3) << 24) |
                (u8(bytes, off + 4 * i + 2) << 16) |
                (u8(bytes, off + 4 * i + 1) << 8) |
                u8(bytes, off + 4 * i)
              val f = java.lang.Float.intBitsToFloat(bits)
              val v =
                if (f.isNaN) 0
                else math.max(-32768, math.min(32767,
                  math.round(f * 32767f)))
              v.toShort
            }
          }
        case (6, 8) =>
          AudioHeader.dataChunk(bytes).map { case (off, len) =>
            Array.tabulate(len.toInt)(i => aLawDecode(u8(bytes, off + i)))
          }
        case (7, 8) =>
          AudioHeader.dataChunk(bytes).map { case (off, len) =>
            Array.tabulate(len.toInt)(i => muLawDecode(u8(bytes, off + i)))
          }
        case (17, 4) if info.channels == 1 => imaAdpcmSamples(bytes)
        case (17, 4) if info.channels == 2 => imaAdpcmStereoSamples(bytes)
        case _ => None
      }
    }

  /** Encode a PCM16 signal as an 8-bit, 24-bit, or float-32 WAV —
    * fixtures for [[samples]]' width-conversion legs. 8-bit stores
    * (v >> 8) + 128 (so decode recovers v & 0xff00); 24-bit stores
    * v << 8 (decode is exact); float stores v / 32767f (decode is
    * exact after rounding).
    */
  def synthesizeWavWidth(
      sampleRate: Int, samples: Array[Short], width: String): Array[Byte] =
    width match {
      case "pcm8" =>
        wavHeader(1, 1, sampleRate, 8, 1, samples.length) ++
          samples.map(v => (((v >> 8) + 128) & 0xff).toByte)
      case "pcm24" =>
        wavHeader(1, 1, sampleRate, 24, 3, samples.length * 3) ++
          samples.flatMap(v => Array(0.toByte, (v & 0xff).toByte,
            ((v >> 8) & 0xff).toByte))
      case "float32" =>
        wavHeader(3, 1, sampleRate, 32, 4, samples.length * 4) ++
          samples.flatMap { v =>
            val bits = java.lang.Float.floatToIntBits(v / 32767f)
            Array((bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
              ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte)
          }
      case other => throw new IllegalArgumentException(
        s"width: $other (pcm8 | pcm24 | float32)")
    }

  /** Decode a mono IMA-ADPCM WAV data chunk: per `blockAlign` block,
    * a 4-byte header (LE int16 predictor seed, step index, reserved)
    * then two nibbles per byte, LOW nibble first (the IMA/WAV
    * ordering). A short trailing block decodes as far as its bytes
    * go; a step index > 88 is malformed (None).
    */
  def imaAdpcmSamples(bytes: Array[Byte]): Option[Array[Short]] =
    for {
      ba <- blockAlign(bytes)
      if ba >= 5
      (off, len) <- AudioHeader.dataChunk(bytes)
      out <- decodeAdpcmBlocks(bytes, off, len.toInt, ba)
    } yield out

  private def decodeAdpcmBlocks(
      b: Array[Byte], off: Int, len: Int, blockAlign: Int)
      : Option[Array[Short]] = {
    val out = new scala.collection.mutable.ArrayBuffer[Short]()
    var base = off
    val end = off + len
    while (base < end) {
      val bl = math.min(blockAlign, end - base)
      if (bl < 5) return None // a block must carry its header + data
      var pred = (le16(b, base) << 16) >> 16 // sign-extend seed
      var index = u8(b, base + 2)
      if (index > 88 || u8(b, base + 3) != 0) return None
      out += pred.toShort // the seed is the block's first sample
      var i = base + 4
      while (i < base + bl) {
        val byte = u8(b, i)
        val (p1, i1) = imaStep(pred, index, byte & 0xf)
        out += p1.toShort
        val (p2, i2) = imaStep(p1, i1, (byte >> 4) & 0xf)
        out += p2.toShort
        pred = p2; index = i2
        i += 1
      }
      base += bl
    }
    Some(out.toArray)
  }

  /** Decode a STEREO IMA-ADPCM WAV data chunk (the standard WAV
    * layout): per block TWO 4-byte channel headers (left then right),
    * then alternating 4-byte channel words — 4 bytes of left nibbles
    * (8 samples, low nibble first) then 4 bytes of right nibbles.
    * Output interleaves L/R per sample frame. Blocks must carry whole
    * 8-byte word pairs; a ragged tail is malformed (None).
    */
  def imaAdpcmStereoSamples(bytes: Array[Byte]): Option[Array[Short]] =
    for {
      ba <- blockAlign(bytes)
      if ba >= 16 && (ba - 8) % 8 == 0
      (off, len) <- AudioHeader.dataChunk(bytes)
      out <- decodeAdpcmStereoBlocks(bytes, off, len.toInt, ba)
    } yield out

  private def decodeAdpcmStereoBlocks(
      b: Array[Byte], off: Int, len: Int, blockAlign: Int)
      : Option[Array[Short]] = {
    val out = new scala.collection.mutable.ArrayBuffer[Short]()
    var base = off
    val end = off + len
    while (base < end) {
      val bl = math.min(blockAlign, end - base)
      if (bl < 16 || (bl - 8) % 8 != 0) return None
      var predL = (le16(b, base) << 16) >> 16
      var idxL = u8(b, base + 2)
      var predR = (le16(b, base + 4) << 16) >> 16
      var idxR = u8(b, base + 6)
      if (idxL > 88 || idxR > 88 ||
        u8(b, base + 3) != 0 || u8(b, base + 7) != 0) return None
      out += predL.toShort
      out += predR.toShort
      var i = base + 8
      while (i < base + bl) {
        val l = new Array[Short](8)
        val r = new Array[Short](8)
        var k = 0
        while (k < 4) {
          val byte = u8(b, i + k)
          val (p1, i1) = imaStep(predL, idxL, byte & 0xf)
          l(2 * k) = p1.toShort
          val (p2, i2) = imaStep(p1, i1, (byte >> 4) & 0xf)
          l(2 * k + 1) = p2.toShort
          predL = p2; idxL = i2
          k += 1
        }
        k = 0
        while (k < 4) {
          val byte = u8(b, i + 4 + k)
          val (p1, i1) = imaStep(predR, idxR, byte & 0xf)
          r(2 * k) = p1.toShort
          val (p2, i2) = imaStep(p1, i1, (byte >> 4) & 0xf)
          r(2 * k + 1) = p2.toShort
          predR = p2; idxR = i2
          k += 1
        }
        var s = 0
        while (s < 8) { out += l(s); out += r(s); s += 1 }
        i += 8
      }
      base += bl
    }
    Some(out.toArray)
  }

  // ------------------------------------------------------------------
  // fixture encoders (real decodable WAV bytes)
  // ------------------------------------------------------------------

  private def wavHeader(
      fmt: Int, channels: Int, rate: Int, bits: Int, blockAlign: Int,
      dataLen: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(fmt.toShort).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort)
      .putShort(bits.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.array()
  }

  /** Encode PCM16 as a G.711 WAV (`"ulaw"` audioFormat 7 / `"alaw"`
    * audioFormat 6, one code byte per sample).
    */
  def synthesizeWavG711(
      sampleRate: Int, samples: Array[Short],
      law: String): Array[Byte] = {
    val (fmt, enc): (Int, Short => Int) = law match {
      case "ulaw" => (7, muLawEncode)
      case "alaw" => (6, aLawEncode)
      case other => throw new IllegalArgumentException(
        s"law: $other (ulaw | alaw)")
    }
    wavHeader(fmt, 1, sampleRate, 8, 1, samples.length) ++
      samples.map(s => enc(s).toByte)
  }

  /** Build a G.711 WAV directly from CODE bytes — the fixture shape
    * oracle queries derive relationally (code bytes from id
    * arithmetic, decode via the published table as a VALUES
    * relation).
    */
  def synthesizeWavG711Codes(
      sampleRate: Int, codes: Array[Byte], law: String): Array[Byte] = {
    val fmt = law match {
      case "ulaw" => 7
      case "alaw" => 6
      case other => throw new IllegalArgumentException(
        s"law: $other (ulaw | alaw)")
    }
    wavHeader(fmt, 1, sampleRate, 8, 1, codes.length) ++ codes
  }

  /** Build a mono IMA-ADPCM WAV directly from CODE bytes (two
    * nibbles each, low first — the IMA/WAV packing) with the given
    * predictor seed and step index, one block — the fixture shape
    * oracle queries replay relationally (nibble stream from id
    * arithmetic, decode through the published step tables as a
    * recursive state machine). The G.711 twin of
    * [[synthesizeWavG711Codes]].
    */
  def synthesizeWavImaAdpcmCodes(
      sampleRate: Int, seed: Int, index: Int,
      data: Array[Byte]): Array[Byte] = {
    require(index >= 0 && index <= 88, s"index: $index")
    require(seed >= -32768 && seed <= 32767, s"seed: $seed")
    val block = Array((seed & 0xff).toByte, ((seed >> 8) & 0xff).toByte,
      index.toByte, 0.toByte) ++ data
    wavHeader(17, 1, sampleRate, 4, block.length, block.length) ++ block
  }

  /** Encode interleaved STEREO PCM16 as a stereo IMA-ADPCM WAV
    * (fixture + executable spec of [[imaAdpcmStereoSamples]]): per
    * block the two channel seeds verbatim, then closed-loop encoded
    * 8-sample channel words. Frames per block = 1 + (blockAlign - 8);
    * the input must tile into blocks whose frame counts stay
    * seed + whole words (the decoder's own grammar).
    */
  def synthesizeWavImaAdpcmStereo(
      sampleRate: Int, samples: Array[Short],
      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 16 && blockAlign % 8 == 0,
      s"blockAlign: $blockAlign")
    require(samples.length % 2 == 0, "interleaved stereo")
    val frames = samples.length / 2
    val fpb = 1 + (blockAlign - 8)
    val tail = frames % fpb
    require(tail == 0 || (tail >= 9 && (tail - 1) % 8 == 0),
      s"frame count $frames must tile into seed + whole 8-sample words")
    val data = new scala.collection.mutable.ArrayBuffer[Byte]()
    var idxL = 0
    var idxR = 0
    var base = 0
    while (base < frames) {
      val n = math.min(fpb, frames - base)
      var predL: Int = samples(2 * base)
      var predR: Int = samples(2 * base + 1)
      data += (predL & 0xff).toByte
      data += ((predL >> 8) & 0xff).toByte
      data += idxL.toByte
      data += 0
      data += (predR & 0xff).toByte
      data += ((predR >> 8) & 0xff).toByte
      data += idxR.toByte
      data += 0
      var i = 1
      while (i < n) {
        // 8 left samples into 4 bytes, then 8 right samples
        var k = 0
        while (k < 4) {
          val (n1, p1, i1) =
            imaEncodeStep(samples(2 * (base + i + 2 * k)), predL, idxL)
          val (n2, p2, i2) =
            imaEncodeStep(samples(2 * (base + i + 2 * k + 1)), p1, i1)
          data += ((n2 << 4) | n1).toByte
          predL = p2; idxL = i2
          k += 1
        }
        k = 0
        while (k < 4) {
          val (n1, p1, i1) = imaEncodeStep(
            samples(2 * (base + i + 2 * k) + 1), predR, idxR)
          val (n2, p2, i2) = imaEncodeStep(
            samples(2 * (base + i + 2 * k + 1) + 1), p1, i1)
          data += ((n2 << 4) | n1).toByte
          predR = p2; idxR = i2
          k += 1
        }
        i += 8
      }
      base += n
    }
    wavHeader(17, 2, sampleRate, 4, blockAlign, data.length) ++
      data.toArray
  }

  /** Encode PCM16 as a mono IMA-ADPCM WAV: `samplesPerBlock` =
    * (blockAlign - 4) * 2 + 1; the first sample of each block seeds
    * the predictor verbatim (so decode's first sample per block is
    * EXACT), the rest quantize through the closed-loop encoder.
    */
  def synthesizeWavImaAdpcm(
      sampleRate: Int, samples: Array[Short],
      blockAlign: Int = 256): Array[Byte] = {
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign: $blockAlign")
    val spb = (blockAlign - 4) * 2 + 1
    val data = new scala.collection.mutable.ArrayBuffer[Byte]()
    var index = 0
    var base = 0
    while (base < samples.length) {
      val n = math.min(spb, samples.length - base)
      var pred: Int = samples(base)
      data += (pred & 0xff).toByte
      data += ((pred >> 8) & 0xff).toByte
      data += index.toByte
      data += 0
      // pair the remaining n-1 samples into nibbles, LOW nibble
      // first; an odd tail pads with a nibble-0 step (the decoder
      // will emit that pad as one extra trailing sample — callers
      // wanting exact lengths use blocks with an even nibble count,
      // i.e. whole blocks of samplesPerBlock)
      var i = 1
      while (i < n) {
        val (n1, p1, i1) = imaEncodeStep(samples(base + i), pred, index)
        val (n2, p2, i2) =
          if (i + 1 < n) imaEncodeStep(samples(base + i + 1), p1, i1)
          else { val (p, ix) = imaStep(p1, i1, 0); (0, p, ix) }
        data += ((n2 << 4) | n1).toByte
        pred = p2; index = i2
        i += 2
      }
      base += n
    }
    wavHeader(17, 1, sampleRate, 4, blockAlign, data.length) ++
      data.toArray
  }
}
