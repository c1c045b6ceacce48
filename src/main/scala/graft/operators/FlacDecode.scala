package graft.operators

/** Pure-JVM FLAC audio-frame decode per RFC 9639: ALL four subframe
  * types — CONSTANT, VERBATIM, FIXED-predictor order 0-4, and LPC
  * order 1-32 (quantized coefficients + shift, §9.2.6) — with
  * Rice-coded residuals, plus all four channel assignments
  * (independent, left/side, right/side, mid/side with the side
  * channel's extra sample bit, §9.1.4/§4.2), decoded bit-exactly.
  * Real-world FLAC is almost exclusively LPC-coded and
  * stereo-decorrelated, so this is the production decode path, not a
  * fixture subset. Only reserved codes return None.
  *
  * Layout per RFC 9639: §9.1 frame headers (15-bit sync + blocking
  * strategy, coded block-size/rate/channel/sample-size fields, the
  * UTF-8-style coded number, CRC-8), §9.2 subframe headers
  * (CONSTANT 0b000000, VERBATIM 0b000001, FIXED 0b001xxx order 0-4,
  * LPC 0b1xxxxx order 1-32), §9.2.7 residual coding (4/5-bit Rice
  * parameters, 2^order partitions, escape-to-verbatim partitions),
  * and the frame-closing CRC-16. Both CRCs are VERIFIED, not
  * skipped — a corrupt frame fails the decode rather than shipping
  * wrong samples.
  *
  * [[synthesizeFlacPcm16]] writes real decodable FLAC bytes with the
  * same machinery (the encoder side of constant/verbatim/fixed +
  * Rice), so specs and oracle queries prove the whole
  * encode -> header walk -> rice decode -> predictor restore path as
  * an exact roundtrip — the PixelDecode.encodePngGray discipline
  * applied to audio.
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object FlacDecode {

  /** Decode failure — internal control flow only; decode() never
    * throws to callers.
    */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  // ------------------------------------------------------------------
  // bit reader / writer (MSB-first, per the FLAC bit ordering)
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte]) {
    private val bitLen: Long = b.length.toLong * 8
    var pos: Long = 0L
    def bytePos: Int = (pos >> 3).toInt
    def readBit(): Int = {
      if (pos >= bitLen) bail()
      val i = (pos >> 3).toInt
      val s = 7 - (pos & 7).toInt
      pos += 1
      (b(i) >> s) & 1
    }
    def readBits(n: Int): Long = {
      if (n < 0 || n > 56 || pos + n > bitLen) bail()
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | readBit(); k += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n == 0) 0L else (v << (64 - n)) >> (64 - n) // sign-extend
    }
    /** Unary: count 0 bits until the terminating 1. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) { q += 1; if (q > (1 << 24)) bail() }
      q
    }
    def alignByte(): Unit = if ((pos & 7) != 0) pos = (pos | 7) + 1
  }

  private final class BitWriter {
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nb += 1
      if (nb == 8) { out += cur.toByte; cur = 0; nb = 0 }
    }
    def writeBits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { writeBit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var k = 0
      while (k < q) { writeBit(0); k += 1 }
      writeBit(1)
    }
    def alignByte(): Unit = while (nb != 0) writeBit(0)
    def bytes: Array[Byte] = { require(nb == 0, "unaligned"); out.toArray }
  }

  // ------------------------------------------------------------------
  // CRCs (RFC 9639 §9.1.8 / §9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005)
  // ------------------------------------------------------------------

  private[operators] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
          else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private[operators] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  // fixed-predictor restore coefficients, order 0..4 (RFC 9639 §9.2.5)
  private val FixedCoef: Array[Array[Long]] = Array(
    Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L),
    Array(4L, -6L, 4L, -1L))

  /** Decoded stream: STREAMINFO facts + the per-channel-interleaved
    * integer samples of every frame, in order.
    */
  final case class DecodedFlac(
      info: AudioHeader.FlacInfo, samples: Array[Int])

  /** Hard cap on total decoded samples (interleaved ints) — the
    * decode-bomb guard mirroring PixelDecode's 2^26-pixel cap: a
    * small hostile stream (constant subframes at blockSize 65536 x 8
    * channels) would otherwise amplify ~25 input bytes into 2 MB of
    * output per frame, unbounded, and STREAMINFO's totalSamples is
    * attacker-controlled so the post-hoc cross-check can't bound the
    * accumulation. 2^26 ints = 256 MB peak — far beyond any fixture
    * and a sane per-row ceiling for a corpus pipeline.
    */
  val MaxDecodedSamples: Long = 1L << 26

  /** Decode a whole FLAC stream (header + audio frames). None when
    * the header fails [[AudioHeader.parseFlac]], any frame uses an
    * unsupported shape (reserved channel assignment / subframe type),
    * any field is malformed/truncated, a CRC mismatches, or the
    * decoded output would exceed [[MaxDecodedSamples]] (or the
    * STREAMINFO-declared stream length, checked per frame). Never
    * throws.
    */
  def decode(bytes: Array[Byte]): Option[DecodedFlac] =
    try Some(decodeOrBail(bytes))
    catch { case _: Bail => None }

  /** PCM16 sample stream (interleaved) — the decode step feeding
    * [[AudioFingerprint.landmarks]], the FLAC twin of
    * [[AudioHeader.pcm16Samples]]. None unless bits-per-sample is 16
    * and the full stream decodes.
    */
  def pcm16Samples(bytes: Array[Byte]): Option[Array[Short]] =
    decode(bytes).filter(_.info.bitsPerSample == 16)
      .map(_.samples.map(_.toShort))

  /** PCM16-NORMALIZED sample stream from any supported bit depth —
    * the FLAC twin of [[AudioCodecs.samples]]' width normalization:
    * 16 verbatim; 20/24/32 keep the top 16 bits (the standard
    * down-conversion, documented precision loss); 8/12 scale up by
    * shift. None unless the full stream decodes.
    */
  def pcm16NormalizedSamples(bytes: Array[Byte]): Option[Array[Short]] =
    decode(bytes).map { d =>
      val shift = d.info.bitsPerSample - 16
      if (shift == 0) d.samples.map(_.toShort)
      else if (shift > 0) d.samples.map(v => (v >> shift).toShort)
      else d.samples.map(v => (v << -shift).toShort)
    }

  private def decodeOrBail(bytes: Array[Byte]): DecodedFlac = {
    val info = AudioHeader.parseFlac(bytes).getOrElse(bail())
    // decode-bomb guard: bound accumulation BEFORE decoding each
    // frame — by the declared stream length when STREAMINFO carries
    // one (a lying declaration fails at its first excess frame, not
    // after unbounded buffering) and by the hard cap either way
    val cap =
      if (info.totalSamples > 0)
        math.min(info.totalSamples * info.channels, MaxDecodedSamples)
      else MaxDecodedSamples
    // re-walk the metadata blocks to find the first frame offset
    var off = 4
    var last = false
    while (!last) {
      if (off + 4 > bytes.length) bail()
      last = (bytes(off) & 0x80) != 0
      val len = (bytes(off + 1) & 0xff) << 16 |
        (bytes(off + 2) & 0xff) << 8 | (bytes(off + 3) & 0xff)
      off += 4 + len
    }
    val r = new BitReader(bytes)
    r.pos = off.toLong * 8
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    while (r.bytePos < bytes.length) {
      val frameStart = r.bytePos
      // ---- frame header (§9.1)
      if (r.readBits(14) != 0x3ffe) bail() // sync
      if (r.readBit() != 0) bail() // reserved
      r.readBit() // blocking strategy (both legal)
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chCode = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      if (r.readBit() != 0) bail() // reserved
      // coded number: UTF-8-style, 1-7 bytes
      val first = r.readBits(8).toInt
      val extra =
        if ((first & 0x80) == 0) 0
        else if ((first & 0xe0) == 0xc0) 1
        else if ((first & 0xf0) == 0xe0) 2
        else if ((first & 0xf8) == 0xf0) 3
        else if ((first & 0xfc) == 0xf8) 4
        else if ((first & 0xfe) == 0xfc) 5
        else if (first == 0xfe) 6
        else bail()
      var k = 0
      while (k < extra) {
        if ((r.readBits(8).toInt & 0xc0) != 0x80) bail()
        k += 1
      }
      val blockSize = bsCode match {
        case 0 => bail() // reserved
        case 1 => 192
        case n if n <= 5 => 576 << (n - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case n => 256 << (n - 8)
      }
      srCode match { // value checked against STREAMINFO implicitly
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => bail()
        case _ => ()
      }
      // 0-7: independent channels; 8 left/side, 9 right/side,
      // 10 mid/side (stereo decorrelation, §9.1.4); 11+ reserved
      if (chCode > 10) bail()
      val nCh = if (chCode <= 7) chCode + 1 else 2
      if (nCh != info.channels) bail()
      val bps = ssCode match {
        case 0 => info.bitsPerSample
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => bail()
      }
      if (bps != info.bitsPerSample) bail()
      // CRC-8 covers the header bytes up to (not incl.) the crc byte
      val headerEnd = r.bytePos
      if ((r.pos & 7) != 0) bail() // header is byte-aligned here
      val crc8Got = r.readBits(8).toInt
      if (crc8(bytes, frameStart, headerEnd) != crc8Got) bail()
      // per-frame output bound (the decode-bomb guard): checked
      // BEFORE the frame's subframes decode into the buffer
      if (out.length.toLong + blockSize.toLong * nCh > cap) bail()
      // ---- subframes (§9.2), one per channel. In a decorrelated
      // stereo frame the SIDE subframe carries one extra bit (§9.2.2):
      // channel 1 for left/side and mid/side, channel 0 for right/side.
      val ch = Array.ofDim[Long](nCh, blockSize)
      var c = 0
      while (c < nCh) {
        val sideExtra = chCode match {
          case 8 | 10 => if (c == 1) 1 else 0
          case 9 => if (c == 0) 1 else 0
          case _ => 0
        }
        if (r.readBit() != 0) bail() // subframe padding bit
        val tp = r.readBits(6).toInt
        val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
        val eb = bps + sideExtra - wasted
        if (eb <= 0) bail()
        val s = ch(c)
        if (tp == 0) { // CONSTANT
          val v = r.readSigned(eb)
          java.util.Arrays.fill(s, v)
        } else if (tp == 1) { // VERBATIM
          var i = 0
          while (i < blockSize) { s(i) = r.readSigned(eb); i += 1 }
        } else if ((tp & 0x38) == 0x08 && (tp & 7) <= 4) { // FIXED
          val order = tp & 7
          if (order > blockSize) bail()
          var i = 0
          while (i < order) { s(i) = r.readSigned(eb); i += 1 }
          readResidual(r, s, blockSize, order)
          val coef = FixedCoef(order)
          i = order
          while (i < blockSize) {
            var p = 0L
            var j = 0
            while (j < order) { p += coef(j) * s(i - 1 - j); j += 1 }
            s(i) += p
            i += 1
          }
        } else if ((tp & 0x20) != 0) { // LPC, order 1..32 (§9.2.6)
          val order = (tp & 0x1f) + 1
          if (order > blockSize) bail()
          var i = 0
          while (i < order) { s(i) = r.readSigned(eb); i += 1 }
          val precM1 = r.readBits(4).toInt
          if (precM1 == 15) bail() // 0b1111 is invalid per spec
          val precision = precM1 + 1
          // the 5-bit shift is signed on the wire but a negative
          // value is forbidden (§9.2.6) — reject, don't guess
          val shift = r.readSigned(5).toInt
          if (shift < 0) bail()
          val coef = new Array[Long](order)
          i = 0
          while (i < order) { coef(i) = r.readSigned(precision); i += 1 }
          readResidual(r, s, blockSize, order)
          i = order
          while (i < blockSize) {
            var p = 0L
            var j = 0
            while (j < order) { p += coef(j) * s(i - 1 - j); j += 1 }
            s(i) += (p >> shift)
            i += 1
          }
        } else bail() // reserved subframe types: honest None
        if (wasted > 0) {
          var i = 0
          while (i < blockSize) { s(i) <<= wasted; i += 1 }
        }
        c += 1
      }
      // ---- stereo reconstruction (§4.2: side = left - right;
      // mid = (left + right) >> 1, its dropped low bit recoverable
      // from side's parity)
      chCode match {
        case 8 => // left/side: ch0 = left, ch1 = side -> right
          var i = 0
          while (i < blockSize) { ch(1)(i) = ch(0)(i) - ch(1)(i); i += 1 }
        case 9 => // right/side: ch0 = side, ch1 = right -> left
          var i = 0
          while (i < blockSize) { ch(0)(i) = ch(0)(i) + ch(1)(i); i += 1 }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = ch(1)(i)
            val m = (ch(0)(i) << 1) | (side & 1L)
            ch(0)(i) = (m + side) >> 1
            ch(1)(i) = (m - side) >> 1
            i += 1
          }
        case _ => ()
      }
      r.alignByte()
      val bodyEnd = r.bytePos
      val crc16Got = r.readBits(16).toInt
      if (crc16(bytes, frameStart, bodyEnd) != crc16Got) bail()
      // interleave
      var i = 0
      while (i < blockSize) {
        var cc = 0
        while (cc < nCh) {
          val v = ch(cc)(i)
          if (v < Int.MinValue || v > Int.MaxValue) bail()
          out += v.toInt
          cc += 1
        }
        i += 1
      }
    }
    if (info.totalSamples > 0 &&
        out.length != info.totalSamples * info.channels) bail()
    DecodedFlac(info, out.toArray)
  }

  /** Rice-coded residual (§9.2.7) into s[order..blockSize). */
  private def readResidual(
      r: BitReader, s: Array[Long], blockSize: Int, order: Int): Unit = {
    val method = r.readBits(2).toInt // 0: 4-bit param, 1: 5-bit
    if (method > 1) bail()
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) bail()
    val perPart = blockSize >> partOrder
    var idx = order
    var p = 0
    while (p < nParts) {
      val n = if (p == 0) perPart - order else perPart
      if (n < 0) bail()
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val bits = r.readBits(5).toInt
        var i = 0
        while (i < n) { s(idx) = if (bits == 0) 0L else r.readSigned(bits); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.readUnary().toLong
          val v = (q << param) | r.readBits(param)
          s(idx) = (v >>> 1) ^ -(v & 1L) // zigzag
          idx += 1
          i += 1
        }
      }
      p += 1
    }
    if (idx != blockSize) bail()
  }

  // ------------------------------------------------------------------
  // encoder (fixture + executable spec of the decoder)
  // ------------------------------------------------------------------

  /** The deterministic LPC coefficient set the fixture encoder uses
    * for order-K subframes: coef(0) = 2^shift (predict the previous
    * sample) plus small index-derived taps — ANY (coef, shift) pair
    * round-trips exactly (the decoder inverts the integer prediction
    * bit-for-bit), so the fixtures exercise real multi-tap
    * coefficient reads without needing a Levinson-Durbin fit.
    */
  private[operators] val LpcShift = 5
  private[operators] def lpcCoef(order: Int): Array[Long] =
    Array.tabulate(order)(j =>
      if (j == 0) (1L << LpcShift) else ((j * 97 + 13) % 9) - 4L)

  /** Encode an interleaved PCM16 stream as real FLAC bytes:
    * STREAMINFO header ([[AudioHeader.synthesizeFlac]]) + one frame
    * per `blockSize` inter-channel sample frames (the last may be
    * short). `subframe` picks the coding per channel: "constant"
    * (falls back to verbatim when a block is not constant),
    * "verbatim", "fixedK" (K = 0..4), or "lpcK" (K = 1..32,
    * quantized coefficients from [[lpcCoef]], precision 7, shift
    * [[LpcShift]]); fixed/LPC residuals are Rice-coded with a
    * per-partition parameter chosen by exhaustive bit-cost search
    * (the 5-bit parameter method is emitted automatically when any
    * partition needs a parameter past 14). `channelMode` selects the
    * channel assignment for stereo input: "independent" (any channel
    * count), or "leftside" / "rightside" / "midside" (channels == 2
    * only — the side subframe carries its spec extra bit).
    * `partitionOrder` splits residuals into 2^k Rice partitions
    * (each full block must divide evenly — the spec's own
    * constraint); `escapeZeroPartitions` emits all-zero partitions
    * as spec escape partitions (escape param + 5-bit size 0), so the
    * decoder's escape path is an encoder-exercised shape, not dead
    * code; `wastedBits` > 0 emits every subframe with the spec's
    * wasted-bits flag + unary count (the input samples must have that
    * many zero low bits), so the decoder's wasted-bits restore is
    * encoder-exercised too. Frames carry correct CRC-8/CRC-16 —
    * [[decode]] -> identical samples is the roundtrip spec.
    */
  def synthesizeFlacPcm16(
      sampleRate: Int, samples: Array[Short],
      blockSize: Int = 256, subframe: String = "fixed2",
      channels: Int = 1, partitionOrder: Int = 0,
      escapeZeroPartitions: Boolean = false,
      channelMode: String = "independent",
      wastedBits: Int = 0): Array[Byte] = {
    require(wastedBits >= 0 && wastedBits <= 8, s"wastedBits: $wastedBits")
    require(wastedBits == 0 || channelMode == "independent",
      "wasted-bit fixtures keep independent channels")
    require(wastedBits == 0 ||
      samples.forall(v => (v & ((1 << wastedBits) - 1)) == 0),
      s"samples must have $wastedBits zero low bits")
    require(blockSize >= 16 && blockSize <= 65536, s"blockSize: $blockSize")
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(samples.length % channels == 0,
      s"interleaved length ${samples.length} not a multiple of $channels")
    require(partitionOrder >= 0 && partitionOrder <= 6,
      s"partitionOrder: $partitionOrder")
    require(channelMode == "independent" || channels == 2,
      s"channelMode $channelMode needs channels == 2")
    synthesizeFlacWidth(sampleRate, samples.map(_.toInt), 16,
      blockSize, subframe, channels, partitionOrder,
      escapeZeroPartitions, channelMode, wastedBits)
  }

  /** [[synthesizeFlacPcm16]] at ANY supported bit depth (8/12/16/20/
    * 24/32) over raw Int samples — the fixture encoder for the width
    * legs [[pcm16NormalizedSamples]] normalizes. Same options.
    */
  def synthesizeFlacWidth(
      sampleRate: Int, samples: Array[Int], bps: Int,
      blockSize: Int = 256, subframe: String = "fixed2",
      channels: Int = 1, partitionOrder: Int = 0,
      escapeZeroPartitions: Boolean = false,
      channelMode: String = "independent",
      wastedBits: Int = 0): Array[Byte] = {
    require(Set(8, 12, 16, 20, 24, 32)(bps), s"bps: $bps")
    require(bps == 32 || samples.forall(v =>
      v >= -(1 << (bps - 1)) && v < (1 << (bps - 1))),
      s"samples out of $bps-bit range")
    require(blockSize >= 16 && blockSize <= 65536, s"blockSize: $blockSize")
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(samples.length % channels == 0, "interleave")
    val totalFrames = samples.length / channels
    val head = AudioHeader.synthesizeFlac(
      sampleRate, channels, bps, totalFrames.toLong)
    val frames = new scala.collection.mutable.ArrayBuffer[Byte]()
    var frameNo = 0
    var base = 0
    while (base < totalFrames) {
      val n = math.min(blockSize, totalFrames - base)
      frames ++= encodeFrame(samples, base, n, channels, frameNo,
        subframe, partitionOrder, escapeZeroPartitions, channelMode,
        wastedBits, bps)
      base += n
      frameNo += 1
    }
    head ++ frames.toArray
  }

  private def encodeFrame(
      samples: Array[Int], base: Int, n: Int, channels: Int,
      frameNo: Int, subframe: String, partitionOrder: Int,
      escapeZero: Boolean, channelMode: String,
      wastedBits: Int, bps: Int): Array[Byte] = {
    val chCode = channelMode match {
      case "independent" => channels - 1
      case "leftside" => 8
      case "rightside" => 9
      case "midside" => 10
      case other => throw new IllegalArgumentException(
        s"channelMode: $other (independent | leftside | rightside | " +
          "midside)")
    }
    val w = new BitWriter
    w.writeBits(0x3ffe, 14) // sync
    w.writeBit(0) // reserved
    w.writeBit(0) // fixed blocking strategy
    w.writeBits(7, 4) // block size: 16-bit-1 at end
    w.writeBits(0, 4) // sample rate: from STREAMINFO
    w.writeBits(chCode.toLong, 4)
    // coded sample size (8/12/16/20/24/32 -> 1/2/4/5/6/7)
    val ssCode = bps match {
      case 8 => 1
      case 12 => 2
      case 16 => 4
      case 20 => 5
      case 24 => 6
      case _ => 7
    }
    w.writeBits(ssCode.toLong, 3)
    w.writeBit(0) // reserved
    // coded frame number (UTF-8-style; fixtures stay < 2^31)
    encodeCodedNumber(w, frameNo.toLong)
    w.writeBits((n - 1).toLong, 16)
    val headBytes = w.bytes
    val w2 = new BitWriter
    headBytes.foreach(b => w2.writeBits(b & 0xffL, 8))
    w2.writeBits(crc8(headBytes, 0, headBytes.length).toLong, 8)
    // ---- channel signals per the assignment (+1 side bit where the
    // spec says so)
    def raw(c: Int): Array[Long] =
      Array.tabulate(n)(i => samples((base + i) * channels + c).toLong)
    val signals: Seq[(Array[Long], Int)] = chCode match {
      case 8 => // left, side = left - right
        val l = raw(0); val r = raw(1)
        Seq(l -> bps, Array.tabulate(n)(i => l(i) - r(i)) -> (bps + 1))
      case 9 => // side, right
        val l = raw(0); val r = raw(1)
        Seq(Array.tabulate(n)(i => l(i) - r(i)) -> (bps + 1), r -> bps)
      case 10 => // mid = (l + r) >> 1, side
        val l = raw(0); val r = raw(1)
        Seq(Array.tabulate(n)(i => (l(i) + r(i)) >> 1) -> bps,
          Array.tabulate(n)(i => l(i) - r(i)) -> (bps + 1))
      case _ => (0 until channels).map(c => raw(c) -> bps)
    }
    // ---- one subframe per channel signal (wasted bits: the stored
    // signal is the input >> wastedBits at eb - wastedBits width; the
    // decoder shifts back)
    def wastedFlag(): Unit =
      if (wastedBits == 0) w2.writeBit(0)
      else {
        w2.writeBit(1)
        var k = 0
        while (k < wastedBits - 1) { w2.writeBit(0); k += 1 }
        w2.writeBit(1) // unary terminator: count = wastedBits
      }
    signals.foreach { case (s0, eb0) =>
      val s = if (wastedBits == 0) s0 else s0.map(_ >> wastedBits)
      val eb = eb0 - wastedBits
      def mask(v: Long): Long = v & ((1L << eb) - 1)
      val constant = s.forall(_ == s(0))
      def predictive(order: Int, coef: Array[Long], shift: Int,
          header: Long, lpc: Boolean): Unit = {
        require(n > order, s"block of $n too short for order $order")
        w2.writeBit(0)
        w2.writeBits(header, 6)
        wastedFlag()
        var i = 0
        while (i < order) { w2.writeBits(mask(s(i)), eb); i += 1 }
        if (lpc) {
          w2.writeBits(6, 4) // precision 7 (precision - 1)
          w2.writeBits(shift.toLong & 0x1f, 5)
          coef.foreach(cf => w2.writeBits(cf & 0x7f, 7))
        }
        val res = new Array[Long](n - order)
        i = order
        while (i < n) {
          var p = 0L
          var j = 0
          while (j < order) { p += coef(j) * s(i - 1 - j); j += 1 }
          res(i - order) = s(i) - (if (lpc) p >> shift else p)
          i += 1
        }
        // partitioned coding requires even division (spec rule);
        // fall back to one partition on the (short) last block
        val po = if ((1 << partitionOrder) <= n &&
          n % (1 << partitionOrder) == 0 &&
          n / (1 << partitionOrder) > order) partitionOrder else 0
        writeRice(w2, res, n, order, po, escapeZero)
      }
      subframe match {
        case "constant" =>
          if (constant) {
            w2.writeBit(0); w2.writeBits(0, 6); wastedFlag()
            w2.writeBits(mask(s(0)), eb)
          } else writeVerbatim(w2, s, eb, wastedFlag _)
        case "verbatim" => writeVerbatim(w2, s, eb, wastedFlag _)
        case f if f.startsWith("fixed") =>
          val order = f.substring(5).toInt
          require(order >= 0 && order <= 4, s"order: $order")
          predictive(order, FixedCoef(order), 0,
            (0x08 | order).toLong, lpc = false)
        case f if f.startsWith("lpc") =>
          val order = f.substring(3).toInt
          require(order >= 1 && order <= 32, s"order: $order")
          predictive(order, lpcCoef(order), LpcShift,
            (0x20 | (order - 1)).toLong, lpc = true)
        case other => throw new IllegalArgumentException(
          s"subframe: $other (constant | verbatim | fixed0..fixed4 | " +
            "lpc1..lpc32)")
      }
    }
    w2.alignByte()
    val body = w2.bytes
    val w3 = new BitWriter
    body.foreach(b => w3.writeBits(b & 0xffL, 8))
    w3.writeBits(crc16(body, 0, body.length).toLong, 16)
    w3.bytes
  }

  private def writeVerbatim(
      w: BitWriter, s: Array[Long], eb: Int,
      wastedFlag: () => Unit): Unit = {
    w.writeBit(0); w.writeBits(1, 6); wastedFlag()
    s.foreach(v => w.writeBits(v & ((1L << eb) - 1), eb))
  }

  /** Rice residual with 2^po partitions, each parameter minimizing
    * the exact bit cost (unary quotient + param bits per residual);
    * the 2-bit method selects 4-bit parameters when every partition
    * fits <= 14 and the 5-bit method otherwise (LPC residuals can
    * exceed the 4-bit range). All-zero partitions optionally emit
    * the spec escape (escape param + 5-bit size 0).
    */
  private def writeRice(
      w: BitWriter, res: Array[Long], blockSize: Int, order: Int,
      po: Int, escapeZero: Boolean): Unit = {
    def zig(v: Long): Long = (v << 1) ^ (v >> 63)
    val zs = res.map(zig)
    val perPart = blockSize >> po
    val parts = {
      var idx = 0
      (0 until (1 << po)).map { p =>
        val n = if (p == 0) perPart - order else perPart
        val sl = zs.slice(idx, idx + n)
        idx += n
        sl
      }
    }
    // -1 marks an escape (all-zero) partition
    val best = parts.map { part =>
      if (escapeZero && part.forall(_ == 0L)) -1
      else (0 to 30).minBy(q => part.map(z => (z >>> q) + 1 + q).sum)
    }
    val method = if (best.exists(_ > 14)) 1 else 0
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    w.writeBits(method.toLong, 2)
    w.writeBits(po.toLong, 4)
    parts.zip(best).foreach { case (part, q) =>
      if (q < 0) {
        w.writeBits(escape.toLong, pBits) // escape partition
        w.writeBits(0, 5) // 0-bit unencoded samples: all zero
      } else {
        w.writeBits(q.toLong, pBits)
        part.foreach { z =>
          w.writeUnary((z >>> q).toInt)
          if (q > 0) w.writeBits(z & ((1L << q) - 1), q)
        }
      }
    }
  }

  private def encodeCodedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0, "coded number")
    if (v < 0x80) w.writeBits(v, 8)
    else if (v < 0x800) {
      w.writeBits(0xc0L | (v >> 6), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      w.writeBits(0xe0L | (v >> 12), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else {
      require(v < (1L << 21), s"coded number too large for fixtures: $v")
      w.writeBits(0xf0L | (v >> 18), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    }
  }
}
