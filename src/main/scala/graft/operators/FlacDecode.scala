package graft.operators

/** Pure-JVM FLAC audio-frame decode — the one tractable slice of the
  * compressed-codec gap (round-15 VERDICT #4): the CONSTANT, VERBATIM,
  * and FIXED-predictor subframe subset of RFC 9639, with Rice-coded
  * residuals, decoded bit-exactly. LPC subframes and stereo
  * decorrelation (left/side, right/side, mid/side) return None
  * honestly — no approximation is ever emitted.
  *
  * Layout per RFC 9639: §9.1 frame headers (15-bit sync + blocking
  * strategy, coded block-size/rate/channel/sample-size fields, the
  * UTF-8-style coded number, CRC-8), §9.2 subframe headers
  * (CONSTANT 0b000000, VERBATIM 0b000001, FIXED 0b001xxx order 0-4),
  * §9.2.7 residual coding (4/5-bit Rice parameters, 2^order
  * partitions, escape-to-verbatim partitions), and the frame-closing
  * CRC-16. Both CRCs are VERIFIED, not skipped — a corrupt frame
  * fails the decode rather than shipping wrong samples.
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

  /** Decode a whole FLAC stream (header + audio frames). None when
    * the header fails [[AudioHeader.parseFlac]], any frame uses an
    * unsupported shape (LPC subframe, stereo decorrelation), any
    * field is malformed/truncated, or a CRC mismatches. Never throws.
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

  private def decodeOrBail(bytes: Array[Byte]): DecodedFlac = {
    val info = AudioHeader.parseFlac(bytes).getOrElse(bail())
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
      if (chCode > 7) bail() // stereo decorrelation / reserved: honest None
      val nCh = chCode + 1
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
      // ---- subframes (§9.2), one per channel
      val ch = Array.ofDim[Long](nCh, blockSize)
      var c = 0
      while (c < nCh) {
        if (r.readBit() != 0) bail() // subframe padding bit
        val tp = r.readBits(6).toInt
        val wasted = if (r.readBit() == 1) r.readUnary() + 1 else 0
        val eb = bps - wasted
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
        } else bail() // LPC (0b100000+) / reserved: honest None
        if (wasted > 0) {
          var i = 0
          while (i < blockSize) { s(i) <<= wasted; i += 1 }
        }
        c += 1
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

  /** Encode an interleaved PCM16 stream as real FLAC bytes:
    * STREAMINFO header ([[AudioHeader.synthesizeFlac]]) + one frame
    * per `blockSize` inter-channel sample frames (the last may be
    * short), each channel coded INDEPENDENTLY with `subframe`:
    * "constant" (falls back to verbatim when a block is not
    * constant), "verbatim", or "fixedK" (K = 0..4, Rice residual
    * with a per-partition parameter chosen by exhaustive search).
    * `partitionOrder` splits the residual into 2^k Rice partitions
    * (each full block must divide evenly — the spec's own
    * constraint); `escapeZeroPartitions` emits all-zero partitions
    * as spec escape partitions (param 0b1111 + 5-bit size 0), so the
    * decoder's escape path is an encoder-exercised shape, not dead
    * code. Frames carry correct CRC-8/CRC-16 — [[decode]] ->
    * identical samples is the roundtrip spec.
    */
  def synthesizeFlacPcm16(
      sampleRate: Int, samples: Array[Short],
      blockSize: Int = 256, subframe: String = "fixed2",
      channels: Int = 1, partitionOrder: Int = 0,
      escapeZeroPartitions: Boolean = false): Array[Byte] = {
    require(blockSize >= 16 && blockSize <= 65536, s"blockSize: $blockSize")
    require(channels >= 1 && channels <= 8, s"channels: $channels")
    require(samples.length % channels == 0,
      s"interleaved length ${samples.length} not a multiple of $channels")
    require(partitionOrder >= 0 && partitionOrder <= 6,
      s"partitionOrder: $partitionOrder")
    val totalFrames = samples.length / channels
    val head = AudioHeader.synthesizeFlac(
      sampleRate, channels, 16, totalFrames.toLong)
    val frames = new scala.collection.mutable.ArrayBuffer[Byte]()
    var frameNo = 0
    var base = 0
    while (base < totalFrames) {
      val n = math.min(blockSize, totalFrames - base)
      frames ++= encodeFrame(samples, base, n, channels, frameNo,
        subframe, partitionOrder, escapeZeroPartitions)
      base += n
      frameNo += 1
    }
    head ++ frames.toArray
  }

  private def encodeFrame(
      samples: Array[Short], base: Int, n: Int, channels: Int,
      frameNo: Int, subframe: String, partitionOrder: Int,
      escapeZero: Boolean): Array[Byte] = {
    val w = new BitWriter
    w.writeBits(0x3ffe, 14) // sync
    w.writeBit(0) // reserved
    w.writeBit(0) // fixed blocking strategy
    w.writeBits(7, 4) // block size: 16-bit-1 at end
    w.writeBits(0, 4) // sample rate: from STREAMINFO
    w.writeBits((channels - 1).toLong, 4) // independent channels
    w.writeBits(4, 3) // sample size: 16
    w.writeBit(0) // reserved
    // coded frame number (UTF-8-style; fixtures stay < 2^31)
    encodeCodedNumber(w, frameNo.toLong)
    w.writeBits((n - 1).toLong, 16)
    val headBytes = w.bytes
    val w2 = new BitWriter
    headBytes.foreach(b => w2.writeBits(b & 0xffL, 8))
    w2.writeBits(crc8(headBytes, 0, headBytes.length).toLong, 8)
    // ---- one subframe per channel
    var c = 0
    while (c < channels) {
      val s = Array.tabulate(n)(i =>
        samples((base + i) * channels + c).toLong)
      val constant = s.forall(_ == s(0))
      subframe match {
        case "constant" =>
          if (constant) {
            w2.writeBit(0); w2.writeBits(0, 6); w2.writeBit(0)
            w2.writeBits(s(0) & 0xffff, 16)
          } else writeVerbatim(w2, s)
        case "verbatim" => writeVerbatim(w2, s)
        case f if f.startsWith("fixed") =>
          val order = f.substring(5).toInt
          require(order >= 0 && order <= 4, s"order: $order")
          require(n > order, s"block of $n too short for order $order")
          w2.writeBit(0)
          w2.writeBits((0x08 | order).toLong, 6)
          w2.writeBit(0) // no wasted bits
          var i = 0
          while (i < order) { w2.writeBits(s(i) & 0xffff, 16); i += 1 }
          // residuals via the fixed predictor
          val res = new Array[Long](n - order)
          i = order
          while (i < n) {
            var p = 0L
            var j = 0
            while (j < order) {
              p += FixedCoef(order)(j) * s(i - 1 - j); j += 1
            }
            res(i - order) = s(i) - p
            i += 1
          }
          // partitioned coding requires even division (spec rule);
          // fall back to one partition on the (short) last block
          val po = if ((1 << partitionOrder) <= n &&
            n % (1 << partitionOrder) == 0 &&
            n / (1 << partitionOrder) > order) partitionOrder else 0
          writeRice(w2, res, n, order, po, escapeZero)
        case other => throw new IllegalArgumentException(
          s"subframe: $other (constant | verbatim | fixed0..fixed4)")
      }
      c += 1
    }
    w2.alignByte()
    val body = w2.bytes
    val w3 = new BitWriter
    body.foreach(b => w3.writeBits(b & 0xffL, 8))
    w3.writeBits(crc16(body, 0, body.length).toLong, 16)
    w3.bytes
  }

  private def writeVerbatim(w: BitWriter, s: Array[Long]): Unit = {
    w.writeBit(0); w.writeBits(1, 6); w.writeBit(0)
    s.foreach(v => w.writeBits(v & 0xffff, 16))
  }

  /** Rice residual with 2^po partitions, each parameter (0..14)
    * minimizing the exact bit cost (unary quotient + param bits per
    * residual); all-zero partitions optionally emit the spec escape
    * (param 0b1111 + 5-bit size 0). PCM16 fixed-order residuals
    * always fit a <= 14-bit parameter.
    */
  private def writeRice(
      w: BitWriter, res: Array[Long], blockSize: Int, order: Int,
      po: Int, escapeZero: Boolean): Unit = {
    def zig(v: Long): Long = (v << 1) ^ (v >> 63)
    val zs = res.map(zig)
    w.writeBits(0, 2) // 4-bit params
    w.writeBits(po.toLong, 4)
    val perPart = blockSize >> po
    var p = 0
    var idx = 0
    while (p < (1 << po)) {
      val n = if (p == 0) perPart - order else perPart
      val part = zs.slice(idx, idx + n)
      if (escapeZero && part.forall(_ == 0L)) {
        w.writeBits(0xf, 4) // escape partition
        w.writeBits(0, 5) // 0-bit unencoded samples: all zero
      } else {
        val best = (0 to 14).minBy { q =>
          part.map(z => (z >>> q) + 1 + q).sum
        }
        w.writeBits(best.toLong, 4)
        part.foreach { z =>
          w.writeUnary((z >>> best).toInt)
          if (best > 0) w.writeBits(z & ((1L << best) - 1), best)
        }
      }
      idx += n
      p += 1
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
