package graft.operators

/** Pure-JVM WebP LOSSLESS (VP8L) decode — the last image format in
  * this stack that was header-only (the JDK ships no VP8/VP8L codec),
  * closing round-16 VERDICT's #8: canonical-Huffman entropy coding
  * (simple and code-length-coded forms, with the 16/17/18 repeat
  * codes), LZ77 backward references (length/distance prefix codes
  * with extra bits, the 120-entry 2D distance map), the optional
  * color cache (the 0x1e35a7bd multiplicative hash), the optional
  * meta-Huffman entropy image, and all FOUR transforms (predictor
  * with its 14 modes and edge rules, color with the signed-byte
  * delta algebra, subtract-green, color-indexing with sub-byte pixel
  * packing) — integer-exact per the public "WebP Lossless Bitstream
  * Specification". Lossy VP8 payloads stay header-only honestly (DSP
  * codec, out of scope by brief); VP8L is fully real.
  *
  * [[encodeWebpLossless]] writes real decodable VP8L bytes with the
  * same canonical-code machinery (literals, optional previous-row
  * backrefs, color cache, subtract-green / one-tile predictor /
  * one-tile color / palette transforms), so specs prove the whole
  * container -> bit reader -> code builder -> transform-inverse path
  * as exact roundtrips — the PixelDecode.encodePngGray discipline.
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object Vp8lDecode {

  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** Decode-bomb guard shared with PixelDecode: total pixels per
    * decoded plane stay <= 2^26.
    */
  private val MaxPixels = 1L << 26

  // ------------------------------------------------------------------
  // LSB-first bit reader / writer (the VP8L bit order)
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte], from: Int, until: Int) {
    private val bitLen: Long = (until - from).toLong * 8
    var pos: Long = 0L
    def readBit(): Int = {
      if (pos >= bitLen) bail()
      val i = from + (pos >> 3).toInt
      val s = (pos & 7).toInt
      pos += 1
      (b(i) >> s) & 1
    }
    /** n <= 24 bits, LSB first. */
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v |= readBit() << k; k += 1 }
      v
    }
  }

  private final class BitWriter {
    private val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nb = 0
    def writeBit(v: Int): Unit = {
      cur |= (v & 1) << nb
      nb += 1
      if (nb == 8) { out += cur.toByte; cur = 0; nb = 0 }
    }
    /** n bits of v, LSB first. */
    def write(v: Int, n: Int): Unit = {
      var k = 0
      while (k < n) { writeBit((v >> k) & 1); k += 1 }
    }
    /** A Huffman CODE: its bits MSB-of-code first (each becomes one
      * LSB-first stream bit — the spec's convention).
      */
    def writeCode(code: Int, len: Int): Unit = {
      var k = len - 1
      while (k >= 0) { writeBit((code >> k) & 1); k -= 1 }
    }
    def bytes: Array[Byte] = {
      val tail = if (nb > 0) Array(cur.toByte) else Array.empty[Byte]
      out.toArray ++ tail
    }
  }

  // ------------------------------------------------------------------
  // canonical Huffman (DEFLATE-style assignment, shared by both sides)
  // ------------------------------------------------------------------

  /** Canonical code per symbol from its length: shorter lengths
    * first, symbol order within a length (the spec convention).
    * Returns codes aligned with `lengths` (0-length symbols get -1).
    */
  private[operators] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val codes = Array.fill(lengths.length)(-1)
    if (maxLen == 0) return codes
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxLen + 1)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + count(l - 1)) << 1
      next(l) = code
      l += 1
    }
    var s = 0
    while (s < lengths.length) {
      if (lengths(s) > 0) { codes(s) = next(lengths(s)); next(lengths(s)) += 1 }
      s += 1
    }
    codes
  }

  /** Decoder for one canonical code: bit-at-a-time walk against a
    * (len, code) -> symbol map. A code with exactly one used symbol
    * is TRIVIAL (0 bits per read — the spec's simple/degenerate
    * case); zero used symbols is malformed.
    */
  private final class Huffman private (
      trivial: Int, table: java.util.HashMap[Integer, Integer]) {
    def read(r: BitReader): Int = {
      if (trivial >= 0) return trivial
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | r.readBit()
        len += 1
        val hit = table.get((len << 16) | code)
        if (hit != null) return hit
      }
      bail()
    }
  }

  private object Huffman {
    /** Canonical construction from per-symbol lengths. */
    def apply(lengths: Array[Int]): Huffman = {
      val used = lengths.count(_ > 0)
      if (used == 0) bail()
      if (used == 1)
        return new Huffman(lengths.indexWhere(_ > 0), null)
      // Kraft completeness: an over- or under-subscribed code would
      // make some bit walks non-terminating or ambiguous
      var kraft = 0L
      val maxLen = lengths.max
      if (maxLen > 15) bail()
      lengths.foreach(l => if (l > 0) kraft += 1L << (maxLen - l))
      if (kraft != (1L << maxLen)) bail()
      val codes = canonicalCodes(lengths)
      val table = new java.util.HashMap[Integer, Integer]()
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) > 0)
          table.put((lengths(s) << 16) | codes(s), s)
        s += 1
      }
      new Huffman(-1, table)
    }

    /** The SIMPLE-form 2-symbol code: the FIRST-read symbol gets code
      * 0, the second code 1 (spec order, NOT sorted-canonical — the
      * symbols may arrive in any order).
      */
    def simplePair(first: Int, second: Int): Huffman = {
      val table = new java.util.HashMap[Integer, Integer]()
      table.put((1 << 16) | 0, first)
      table.put((1 << 16) | 1, second)
      new Huffman(-1, table)
    }

    def single(symbol: Int): Huffman = new Huffman(symbol, null)
  }

  /** Code-length-code symbol order (the spec constant). */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** The 120-entry 2D distance map: (dx, dy) pairs, dist_code 1..120
    * -> entry dist_code-1; distance = dy * xsize + dx (floored at 1).
    * Values from the spec's published table.
    */
  private val DistMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  /** Length/distance prefix-code value: code < 4 -> code + 1; else
    * (2 + (code & 1)) << extra | read(extra), + 1, extra =
    * (code - 2) >> 1.
    */
  private def prefixValue(code: Int, r: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      ((2 + (code & 1)) << extra) + r.read(extra) + 1
    }

  private def hashPix(argb: Int, bits: Int): Int =
    ((argb * 0x1e35a7bd) >>> (32 - bits))

  private def subSampleSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // ------------------------------------------------------------------
  // entropy-coded image decode (shared by main + sub-images)
  // ------------------------------------------------------------------

  /** Read one Huffman code (simple or code-length-coded normal form). */
  private def readCode(r: BitReader, alphabetSize: Int): Huffman = {
    if (r.read(1) == 1) { // simple
      val numSymbols = r.read(1) + 1
      val first =
        if (r.read(1) == 1) r.read(8) else r.read(1)
      if (first >= alphabetSize) bail()
      if (numSymbols == 1) Huffman.single(first)
      else {
        val second = r.read(8)
        if (second >= alphabetSize || second == first) bail()
        // spec order: the first-read symbol gets code 0
        Huffman.simplePair(first, second)
      }
    } else { // normal: code-length-coded
      val lengths = new Array[Int](alphabetSize)
      val numCl = 4 + r.read(4)
      if (numCl > ClOrder.length) bail()
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = r.read(3); i += 1 }
      val clCode = Huffman(clLengths)
      // optional max-symbol bound
      var maxSymbol =
        if (r.read(1) == 1) {
          val lenNBits = 2 + 2 * r.read(3)
          val ms = 2 + r.read(lenNBits)
          if (ms > alphabetSize) bail()
          ms
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(r)
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + r.read(2), prevLen)
            case 17 => (3 + r.read(3), 0)
            case _ => (11 + r.read(7), 0)
          }
          if (symbol + repeat > alphabetSize) bail()
          var k = 0
          while (k < repeat) { lengths(symbol) = value; symbol += 1; k += 1 }
        }
      }
      Huffman(lengths)
    }
  }

  /** One group of the five per-pixel codes. */
  private final class Group(
      val green: Huffman, val red: Huffman, val blue: Huffman,
      val alpha: Huffman, val dist: Huffman)

  /** Decode an entropy-coded ARGB image (color-cache info, Huffman
    * codes with the optional meta-Huffman entropy image when
    * `allowMeta`, LZ77 + cache data stream).
    */
  private def decodeImage(
      r: BitReader, w: Int, h: Int, allowMeta: Boolean): Array[Int] = {
    if (w < 1 || h < 1 || w.toLong * h > MaxPixels) bail()
    // color cache info comes FIRST (spec grammar), then meta-Huffman
    val cacheBits = if (r.read(1) == 1) {
      val b = r.read(4)
      if (b < 1 || b > 11) bail()
      b
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    var metaBits = 0
    var metaImg: Array[Int] = null
    if (allowMeta && r.read(1) == 1) {
      metaBits = 2 + r.read(3)
      metaImg = decodeImage(r, subSampleSize(w, metaBits),
        subSampleSize(h, metaBits), allowMeta = false)
    }
    val numGroups =
      if (metaImg == null) 1
      else metaImg.map(p => (p >> 8) & 0xffff).max + 1
    // group index is (red<<8|green) of a meta pixel, so 65536 is the
    // spec's own ceiling; memory stays input-proportional because
    // every group's five codes must be spelled out in the bitstream
    if (numGroups > 65536) bail()
    val greenAlpha = 256 + 24 + cacheSize
    val groups = Array.fill(numGroups)(new Group(
      readCode(r, greenAlpha), readCode(r, 256), readCode(r, 256),
      readCode(r, 256), readCode(r, 40)))
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val out = new Array[Int](w * h)
    val metaW = if (metaImg == null) 0 else subSampleSize(w, metaBits)
    var pos = 0
    while (pos < w * h) {
      val x = pos % w
      val y = pos / w
      val g =
        if (metaImg == null) groups(0)
        else {
          val mi = metaImg((y >> metaBits) * metaW + (x >> metaBits))
          groups((mi >> 8) & 0xffff)
        }
      val s = g.green.read(r)
      if (s < 256) { // literal (green, then red, blue, alpha)
        val red = g.red.read(r)
        val blue = g.blue.read(r)
        val alpha = g.alpha.read(r)
        val px = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = px
        if (cache != null) cache(hashPix(px, cacheBits)) = px
        pos += 1
      } else if (s < 280) { // LZ77 backref
        val length = prefixValue(s - 256, r)
        val distCode = prefixValue(g.dist.read(r), r)
        val dist0 =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = DistMap(distCode - 1)
            math.max(dy * w + dx, 1)
          }
        if (pos - dist0 < 0 || pos + length > w * h) bail()
        var k = 0
        while (k < length) {
          val px = out(pos - dist0)
          out(pos) = px
          if (cache != null) cache(hashPix(px, cacheBits)) = px
          pos += 1
          k += 1
        }
      } else { // color-cache hit
        if (cache == null || s - 280 >= cacheSize) bail()
        out(pos) = cache(s - 280)
        pos += 1
      }
    }
    out
  }

  // ------------------------------------------------------------------
  // transform inverses
  // ------------------------------------------------------------------

  private def avg2(a: Int, b: Int): Int =
    (((a >>> 24) + (b >>> 24)) >> 1) << 24 |
      ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16 |
      ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8 |
      (((a & 0xff) + (b & 0xff)) >> 1)

  private def addPixels(a: Int, b: Int): Int =
    (((a >>> 24) + (b >>> 24)) & 0xff) << 24 |
      ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16 |
      ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8 |
      ((((a & 0xff) + (b & 0xff))) & 0xff)

  private def clip255(v: Int): Int = math.max(0, math.min(255, v))

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = clip255(((l >>> sh) & 0xff) +
      ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(sh: Int): Int = {
      val a = (ave >>> sh) & 0xff
      val b = (tl >>> sh) & 0xff
      clip255(a + (a - b) / 2)
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(t: Int, l: Int, tl: Int): Int = {
    def sub3(sh: Int): Int = {
      val a = (t >>> sh) & 0xff
      val b = (l >>> sh) & 0xff
      val c = (tl >>> sh) & 0xff
      math.abs(b - c) - math.abs(a - c)
    }
    val paMinusPb = sub3(24) + sub3(16) + sub3(8) + sub3(0)
    if (paMinusPb <= 0) t else l
  }

  /** Predictor-transform inverse: residuals + per-tile predicted
    * values, scan order (edge rules: (0,0) predicts opaque black,
    * first row L, first column T, top-right of the last column wraps
    * to the row's own first pixel — the spec's contiguous-buffer
    * rule).
    */
  private def inversePredictor(
      img: Array[Int], w: Int, h: Int, bits: Int,
      tiles: Array[Int]): Unit = {
    val tw = subSampleSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) img(pos - 1)
          else if (x == 0) img(pos - w)
          else {
            val mode = (tiles((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
            val l = img(pos - 1)
            val t = img(pos - w)
            val tl = img(pos - w - 1)
            val tr = if (x + 1 < w) img(pos - w + 1) else img(pos - x)
            mode match {
              case 0 => 0xff000000
              case 1 => l
              case 2 => t
              case 3 => tr
              case 4 => tl
              case 5 => avg2(avg2(l, tr), t)
              case 6 => avg2(l, tl)
              case 7 => avg2(l, t)
              case 8 => avg2(tl, t)
              case 9 => avg2(t, tr)
              case 10 => avg2(avg2(l, tl), avg2(t, tr))
              case 11 => select(t, l, tl)
              case 12 => clampAddSubtractFull(l, t, tl)
              case 13 => clampAddSubtractHalf(l, t, tl)
              case _ => bail()
            }
          }
        img(pos) = addPixels(img(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  /** (t * c) >> 5 over SIGNED bytes — the color-transform delta. */
  private def ctDelta(t: Int, c: Int): Int =
    (t.toByte.toInt * c.toByte.toInt) >> 5

  /** Color-transform inverse: per-tile element (green_to_red in the
    * blue channel, green_to_blue in green, red_to_blue in red),
    * deltas ADDED back.
    */
  private def inverseColor(
      img: Array[Int], w: Int, h: Int, bits: Int,
      tiles: Array[Int]): Unit = {
    val tw = subSampleSize(w, bits)
    var pos = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = tiles((y >> bits) * tw + (x >> bits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val px = img(pos)
        val green = (px >> 8) & 0xff
        var red = (px >> 16) & 0xff
        var blue = px & 0xff
        red = (red + ctDelta(g2r, green)) & 0xff
        blue = (blue + ctDelta(g2b, green)) & 0xff
        blue = (blue + ctDelta(r2b, red)) & 0xff
        img(pos) = (px & 0xff00ff00) | (red << 16) | blue
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(img: Array[Int]): Unit = {
    var i = 0
    while (i < img.length) {
      val px = img(i)
      val g = (px >> 8) & 0xff
      val r = (((px >> 16) & 0xff) + g) & 0xff
      val b = ((px & 0xff) + g) & 0xff
      img(i) = (px & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  // ------------------------------------------------------------------
  // top-level decode
  // ------------------------------------------------------------------

  private sealed trait Transform
  // `width` is the read-time image width: a transform read after
  // COLOR_INDEXING operates on the packed-width image, and its
  // inverse (applied before the indexing inverse re-expands the
  // width) must iterate that packed width, not the full one.
  private final case class Predictor(bits: Int, tiles: Array[Int],
      width: Int) extends Transform
  private final case class ColorT(bits: Int, tiles: Array[Int],
      width: Int) extends Transform
  private case object SubGreen extends Transform
  private final case class Indexing(palette: Array[Int], widthBits: Int)
    extends Transform

  /** Decode a full WebP container's VP8L chunk to pixels; None for
    * anything else (lossy VP8, VP8X-wrapped lossy, malformation).
    * Never throws.
    */
  def decode(bytes: Array[Byte]): Option[PixelDecode.Pixels] =
    try {
      if (bytes == null || bytes.length < 21) return None
      if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
          bytes(10) == 'B' && bytes(11) == 'P')) return None
      // walk chunks to the VP8L payload (VP8X containers carry it
      // after the extension chunk)
      var off = 12
      while (off + 8 <= bytes.length) {
        val tag = new String(bytes, off, 4, "US-ASCII")
        val len = (bytes(off + 4) & 0xff) | ((bytes(off + 5) & 0xff) << 8) |
          ((bytes(off + 6) & 0xff) << 16) | ((bytes(off + 7) & 0xff) << 24)
        if (len < 0 || off + 8L + len > bytes.length) return None
        if (tag == "VP8L")
          return decodeVp8l(bytes, off + 8, off + 8 + len)
        off += 8 + len + (len & 1)
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode a raw VP8L payload (no RIFF container). NonFatal (not
    * just Bail) is caught as the never-throws contract's backstop —
    * hostile corpus bytes must not kill a Spark task.
    */
  private[operators] def decodeVp8l(
      b: Array[Byte], from: Int, until: Int): Option[PixelDecode.Pixels] =
    try Some(decodeVp8lOrBail(b, from, until))
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeVp8lOrBail(
      b: Array[Byte], from: Int, until: Int): PixelDecode.Pixels = {
    if (until - from < 5) bail()
    if ((b(from) & 0xff) != 0x2f) bail()
    val r = new BitReader(b, from + 1, until)
    val w = r.read(14) + 1
    val h = r.read(14) + 1
    r.read(1) // alpha-used hint
    if (r.read(3) != 0) bail() // version must be 0
    if (w.toLong * h > MaxPixels) bail()
    // transforms (each at most once), sub-image sizes at read-time
    // width (color-indexing packs the width for everything after it)
    var xsize = w
    var transforms = List.empty[Transform]
    var seen = Set.empty[Int]
    while (r.read(1) == 1) {
      val tp = r.read(2)
      if (seen(tp)) bail()
      seen += tp
      tp match {
        case 0 => // PREDICTOR
          val bits = 2 + r.read(3)
          transforms ::= Predictor(bits, decodeImage(r,
            subSampleSize(xsize, bits), subSampleSize(h, bits),
            allowMeta = false), xsize)
        case 1 => // COLOR
          val bits = 2 + r.read(3)
          transforms ::= ColorT(bits, decodeImage(r,
            subSampleSize(xsize, bits), subSampleSize(h, bits),
            allowMeta = false), xsize)
        case 2 => transforms ::= SubGreen
        case _ => // COLOR_INDEXING
          val size = r.read(8) + 1
          val deltas = decodeImage(r, size, 1, allowMeta = false)
          val palette = new Array[Int](size)
          var prev = 0
          var i = 0
          while (i < size) {
            prev = addPixels(prev, deltas(i))
            palette(i) = prev
            i += 1
          }
          val widthBits =
            if (size <= 2) 3 else if (size <= 4) 2
            else if (size <= 16) 1 else 0
          transforms ::= Indexing(palette, widthBits)
          xsize = subSampleSize(xsize, widthBits)
      }
    }
    var img = decodeImage(r, xsize, h, allowMeta = true)
    // inverses in reverse read order = head-first on the cons list
    transforms.foreach {
      case Indexing(palette, widthBits) =>
        val out = new Array[Int](w * h)
        val pxPerPacked = 1 << widthBits
        val bitsPer = 8 >> widthBits
        val mask = (1 << bitsPer) - 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val packed = img(y * xsize + (x >> widthBits))
            val idx = ((packed >> 8) >> (bitsPer * (x & (pxPerPacked - 1)))) &
              mask
            out(y * w + x) = if (idx < palette.length) palette(idx) else 0
            x += 1
          }
          y += 1
        }
        img = out
        xsize = w
      case Predictor(bits, tiles, rw) => inversePredictor(img, rw, h, bits, tiles)
      case ColorT(bits, tiles, rw) => inverseColor(img, rw, h, bits, tiles)
      case SubGreen => inverseSubtractGreen(img)
    }
    if (xsize != w) bail() // packed width never resolved to full
    PixelDecode.Pixels(w, h, img.map(_ & 0xffffff))
  }

  // ------------------------------------------------------------------
  // fixture encoder (real decodable VP8L bytes)
  // ------------------------------------------------------------------

  /** Two-length "flat" canonical lengths over the used symbols of a
    * histogram: with n used symbols and k = ceil(log2 n), the first
    * (2^k - n) used symbols get k-1 bits and the rest k (Kraft-exact;
    * n == 1 gets the trivial 0-bit code via a single length-1 entry).
    */
  private def flatLengths(used: Seq[Int], alphabetSize: Int): Array[Int] = {
    val lengths = new Array[Int](alphabetSize)
    val n = used.length
    if (n == 0) return lengths
    if (n == 1) { lengths(used.head) = 1; return lengths }
    var k = 1
    while ((1 << k) < n) k += 1
    val shorter = (1 << k) - n
    used.zipWithIndex.foreach { case (s, i) =>
      lengths(s) = if (i < shorter) k - 1 else k
    }
    lengths
  }

  /** Emit one Huffman code: simple form when it fits (<= 2 used
    * symbols, all < 256), else the code-length-coded normal form with
    * the spec's run-length codes — 16 (repeat previous nonzero length
    * 3-6x), 17 (3-10 zeros), 18 (11-138 zeros) — so the decoder's
    * repeat paths are encoder-exercised, and length arrays (mostly
    * zeros) stay compact.
    */
  private def writeCodeDef(
      bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.zipWithIndex.filter(_._1 > 0).map(_._2)
    if (used.length <= 2 && used.forall(_ < 256) && used.nonEmpty) {
      bw.write(1, 1) // simple
      bw.write(used.length - 1, 1)
      if (used(0) < 2 && used.length == 1) {
        bw.write(0, 1); bw.write(used(0), 1)
      } else {
        bw.write(1, 1); bw.write(used(0), 8)
      }
      if (used.length == 2) bw.write(used(1), 8)
    } else {
      bw.write(0, 1) // normal
      // tokenize runs: (cl symbol, extra bits, extra value)
      val toks = new scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]()
      var i = 0
      while (i < lengths.length) {
        val l = lengths(i)
        var run = 1
        while (i + run < lengths.length && lengths(i + run) == l) run += 1
        var rem = run
        if (l == 0) {
          while (rem >= 11) {
            val c = math.min(rem, 138)
            toks += ((18, 7, c - 11))
            rem -= c
          }
          if (rem >= 3) { toks += ((17, 3, rem - 3)); rem = 0 }
          while (rem > 0) { toks += ((0, 0, 0)); rem -= 1 }
        } else {
          toks += ((l, 0, 0)) // sets the decoder's prev-length
          rem -= 1
          while (rem >= 3) {
            val c = math.min(rem, 6)
            toks += ((16, 2, c - 3))
            rem -= c
          }
          while (rem > 0) { toks += ((l, 0, 0)); rem -= 1 }
        }
        i += run
      }
      val clSyms = toks.map(_._1).distinct.sorted.toSeq
      val clLengths = flatLengths(clSyms, 19)
      bw.write(15, 4) // num_code_lengths = 19
      var k = 0
      while (k < 19) { bw.write(clLengths(ClOrder(k)), 3); k += 1 }
      bw.write(0, 1) // no max-symbol bound
      val clCodes = canonicalCodes(clLengths)
      val trivialCl = clSyms.length == 1
      toks.foreach { case (sym, eb, ev) =>
        if (!trivialCl) bw.writeCode(clCodes(sym), clLengths(sym))
        if (eb > 0) bw.write(ev, eb)
      }
    }
  }

  /** The symbol stream of one entropy-coded image (shared between
    * histogram and emission passes).
    */
  private sealed trait Tok
  private final case class Lit(argb: Int) extends Tok
  private final case class Cached(idx: Int) extends Tok
  private final case class Backref(lenCode: Int, lenExtra: (Int, Int),
      distCode: Int, distExtra: (Int, Int)) extends Tok

  /** Prefix-code split of a value: (code, (extraBits, extraVal)) —
    * the exact inverse of [[prefixValue]].
    */
  private def toPrefix(v: Int): (Int, (Int, Int)) = {
    require(v >= 1, s"prefix value: $v")
    if (v <= 4) (v - 1, (0, 0))
    else {
      val x = v - 1 // x >= 4; find extra with (x >> extra) in {2, 3}
      var extra = 1
      while ((x >> (extra + 1)) > 1) extra += 1
      val code = 2 * extra + ((x >> extra) & 1) + 2
      (code, (extra, x & ((1 << extra) - 1)))
    }
  }

  /** Encode an ARGB image as one entropy-coded VP8L image stream:
    * literals, optional previous-row backrefs (distance = xsize -
    * the 2D map's (0,1) entry, dist_code 1), optional color cache,
    * and (main image only) an optional meta-Huffman entropy image -
    * `metaBits` > 0 splits the image into 2^metaBits-wide tiles
    * assigned to TWO code groups in a checkerboard, each with its own
    * five codes, so the decoder's spatially-varying-codes path is
    * encoder-exercised.
    */
  private def writeImage(
      bw: BitWriter, argb: Array[Int], w: Int, h: Int,
      cacheBits: Int, rowBackrefs: Boolean, withMeta: Boolean,
      metaBits: Int = 0): Unit = {
    require(!rowBackrefs || w <= 4096, "row backref length fits 24 codes")
    require(metaBits == 0 || withMeta, "meta only on the main image")
    require(metaBits == 0 || (metaBits >= 2 && metaBits <= 9),
      s"metaBits: $metaBits")
    bw.write(if (cacheBits > 0) 1 else 0, 1)
    if (cacheBits > 0) bw.write(cacheBits, 4)
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheUsed = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    val numGroups = if (metaBits > 0) 2 else 1
    def groupOf(pos: Int): Int =
      if (metaBits == 0) 0
      else (((pos % w) >> metaBits) + ((pos / w) >> metaBits)) % 2
    val toks = new scala.collection.mutable.ArrayBuffer[(Int, Tok)]()
    var pos = 0
    while (pos < w * h) {
      val y = pos / w
      val grp = groupOf(pos)
      // nearest matching PREVIOUS ROW within 10 rows: lag 1 is the
      // 2D map's (0,1) entry, lags 2..7 its other (0, dy) entries,
      // lags 8+ the DIRECT distance codes (dist + 120) — so all
      // three distance shapes are encoder-exercised
      val rowLag =
        if (!(rowBackrefs && pos % w == 0 && y > 0)) 0
        else (1 to math.min(y, 10)).find(r =>
          (0 until w).forall(x =>
            argb(pos + x) == argb(pos - r * w + x))).getOrElse(0)
      if (rowLag > 0) {
        val (lc, le) = toPrefix(w)
        val distance = rowLag * w
        val distCode =
          DistMap.indexOf((0, rowLag)) match {
            case -1 => distance + 120 // beyond the 2D map: direct
            case idx => idx + 1
          }
        val (dc, de) = toPrefix(distCode)
        toks += grp -> Backref(lc, le, dc, de)
        var k = 0
        while (k < w) {
          val px = argb(pos - rowLag * w + k)
          if (cache != null) {
            val hh = hashPix(px, cacheBits)
            cache(hh) = px; cacheUsed(hh) = true
          }
          pos += 1
          k += 1
        }
      } else {
        val px = argb(pos)
        val hh = if (cache != null) hashPix(px, cacheBits) else -1
        if (cache != null && cacheUsed(hh) && cache(hh) == px)
          toks += grp -> Cached(hh)
        else {
          toks += grp -> Lit(px)
          if (cache != null) { cache(hh) = px; cacheUsed(hh) = true }
        }
        pos += 1
      }
    }
    if (withMeta) {
      bw.write(if (metaBits > 0) 1 else 0, 1)
      if (metaBits > 0) {
        bw.write(metaBits - 2, 3)
        val mw = subSampleSize(w, metaBits)
        val mh = subSampleSize(h, metaBits)
        val entropy = Array.tabulate(mw * mh) { i =>
          val grp = ((i % mw) + (i / mw)) % 2
          0xff000000 | (grp << 8) // group index in (red << 8) | green
        }
        writeImage(bw, entropy, mw, mh, 0,
          rowBackrefs = false, withMeta = false)
      }
    }
    // per-group histograms over the token stream, then 5 codes per
    // group in group order
    val greenAlpha = 256 + 24 + cacheSize
    case class GroupCodes(
        gl: Array[Int], rl: Array[Int], bl: Array[Int],
        al: Array[Int], dl: Array[Int]) {
      val gc = canonicalCodes(gl)
      val rc = canonicalCodes(rl)
      val bc = canonicalCodes(bl)
      val ac = canonicalCodes(al)
      val dcodes = canonicalCodes(dl)
    }
    val groups = (0 until numGroups).map { grp =>
      val gh = scala.collection.mutable.Set.empty[Int]
      val rh = scala.collection.mutable.Set.empty[Int]
      val bh = scala.collection.mutable.Set.empty[Int]
      val ah = scala.collection.mutable.Set.empty[Int]
      val dh = scala.collection.mutable.Set.empty[Int]
      toks.foreach {
        case (g, Lit(px)) if g == grp =>
          gh += (px >> 8) & 0xff
          rh += (px >> 16) & 0xff
          bh += px & 0xff
          ah += (px >>> 24)
        case (g, Cached(idx)) if g == grp => gh += 280 + idx
        case (g, Backref(lc, _, dc, _)) if g == grp =>
          gh += 256 + lc
          dh += dc
        case _ => ()
      }
      // a group can be empty of some symbol kinds (or, on a tiny
      // image, entirely unused): every code still needs >= 1 symbol
      if (gh.isEmpty) gh += 0
      if (rh.isEmpty) { rh += 0; bh += 0; ah += 0 }
      if (dh.isEmpty) dh += 0
      GroupCodes(flatLengths(gh.toSeq.sorted, greenAlpha),
        flatLengths(rh.toSeq.sorted, 256),
        flatLengths(bh.toSeq.sorted, 256),
        flatLengths(ah.toSeq.sorted, 256),
        flatLengths(dh.toSeq.sorted, 40))
    }
    groups.foreach(c =>
      Seq(c.gl, c.rl, c.bl, c.al, c.dl).foreach(writeCodeDef(bw, _)))
    def emit(codes: Array[Int], lens: Array[Int], s: Int): Unit =
      if (lens.count(_ > 0) > 1) bw.writeCode(codes(s), lens(s))
    toks.foreach {
      case (g, Lit(px)) =>
        val c = groups(g)
        emit(c.gc, c.gl, (px >> 8) & 0xff)
        emit(c.rc, c.rl, (px >> 16) & 0xff)
        emit(c.bc, c.bl, px & 0xff)
        emit(c.ac, c.al, px >>> 24)
      case (g, Cached(idx)) =>
        val c = groups(g)
        emit(c.gc, c.gl, 280 + idx)
      case (g, Backref(lc, le, dc, de)) =>
        val c = groups(g)
        emit(c.gc, c.gl, 256 + lc)
        if (le._1 > 0) bw.write(le._2, le._1)
        emit(c.dcodes, c.dl, dc)
        if (de._1 > 0) bw.write(de._2, de._1)
    }
  }

  /** Encode ARGB pixels as a real WebP lossless file. Options pick
    * the transform/coding shapes the decoder must invert:
    * `subtractGreen`, `predictor` (one whole-image tile of the given
    * mode, image <= 512x512), `colorDeltas` (one tile of
    * (green_to_red, green_to_blue, red_to_blue) signed bytes),
    * `palette` (color indexing, <= 256 distinct colors, with sub-byte
    * packing when few), `cacheBits`, `rowBackrefs`, and `metaBits`
    * (a two-group meta-Huffman tile checkerboard). decode() ->
    * identical pixels is the roundtrip spec.
    */
  def encodeWebpLossless(
      w: Int, h: Int, rgb: Array[Int],
      cacheBits: Int = 0, rowBackrefs: Boolean = false,
      subtractGreen: Boolean = false,
      predictor: Option[Int] = None,
      colorDeltas: Option[(Int, Int, Int)] = None,
      palette: Boolean = false,
      metaBits: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 16384 && h <= 16384, s"dims $w x $h")
    require(rgb.length == w * h, "pixel count")
    require(!palette || (!subtractGreen && colorDeltas.isEmpty),
      "palette composes only with predictor here (applied to the " +
        "PACKED image — the packed-width transform order the decoder " +
        "must survive)")
    require(cacheBits >= 0 && cacheBits <= 11, s"cacheBits: $cacheBits")
    var argb = rgb.map(p => 0xff000000 | (p & 0xffffff))
    val bw = new BitWriter
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1) // alpha hint
    bw.write(0, 3) // version
    var xsize = w
    // forward transforms, written in application order (the decoder
    // inverts in reverse read order)
    if (palette) {
      val colors = argb.distinct
      require(colors.length <= 256, s"palette of ${colors.length}")
      val index = colors.zipWithIndex.toMap
      val widthBits =
        if (colors.length <= 2) 3 else if (colors.length <= 4) 2
        else if (colors.length <= 16) 1 else 0
      bw.write(1, 1); bw.write(3, 2) // COLOR_INDEXING
      bw.write(colors.length - 1, 8)
      // palette entries are delta-coded component-wise
      val deltas = colors.zipWithIndex.map { case (c, i) =>
        if (i == 0) c else subPixels(c, colors(i - 1))
      }
      writeImage(bw, deltas, colors.length, 1, 0,
        rowBackrefs = false, withMeta = false)
      // pack indices into the green channel
      val packedW = subSampleSize(w, widthBits)
      val pxPerPacked = 1 << widthBits
      val bitsPer = 8 >> widthBits
      val packed = new Array[Int](packedW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val idx = index(argb(y * w + x))
          val pi = y * packedW + (x >> widthBits)
          packed(pi) |= idx << (bitsPer * (x & (pxPerPacked - 1)))
          x += 1
        }
        y += 1
      }
      argb = packed.map(g => 0xff000000 | ((g & 0xff) << 8))
      xsize = packedW
    }
    predictor.foreach { mode =>
      require(mode >= 0 && mode <= 13, s"predictor mode: $mode")
      require(w <= 512 && h <= 512, "one-tile predictor needs <= 512")
      // residuals = pixel - predicted (per channel mod 256), same
      // edge rules as the inverse; runs at the CURRENT width (the
      // packed one when the palette transform precedes it)
      val res = new Array[Int](xsize * h)
      var pos = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < xsize) {
          val pred =
            if (x == 0 && y == 0) 0xff000000
            else if (y == 0) argb(pos - 1)
            else if (x == 0) argb(pos - xsize)
            else {
              val l = argb(pos - 1)
              val t = argb(pos - xsize)
              val tl = argb(pos - xsize - 1)
              val tr = if (x + 1 < xsize) argb(pos - xsize + 1)
                else argb(pos - x)
              mode match {
                case 0 => 0xff000000
                case 1 => l
                case 2 => t
                case 3 => tr
                case 4 => tl
                case 5 => avg2(avg2(l, tr), t)
                case 6 => avg2(l, tl)
                case 7 => avg2(l, t)
                case 8 => avg2(tl, t)
                case 9 => avg2(t, tr)
                case 10 => avg2(avg2(l, tl), avg2(t, tr))
                case 11 => select(t, l, tl)
                case 12 => clampAddSubtractFull(l, t, tl)
                case 13 => clampAddSubtractHalf(l, t, tl)
              }
            }
          res(pos) = subPixels(argb(pos), pred)
          pos += 1
          x += 1
        }
        y += 1
      }
      argb = res
      bw.write(1, 1); bw.write(0, 2) // PREDICTOR
      bw.write(7, 3) // bits = 9 -> 512 tile, one tile
      writeImage(bw, Array(0xff000000 | (mode << 8)), 1, 1, 0,
        rowBackrefs = false, withMeta = false)
    }
    colorDeltas.foreach { case (g2r, g2b, r2b) =>
      require(w <= 512 && h <= 512, "one-tile color needs <= 512")
      val cte = 0xff000000 | ((r2b & 0xff) << 16) | ((g2b & 0xff) << 8) |
        (g2r & 0xff)
      // forward: SUBTRACT the deltas the inverse adds. The r2b delta
      // is computed from the ORIGINAL red — the inverse recovers red
      // first and feeds the RECOVERED value to the r2b delta
      argb = argb.map { px =>
        val green = (px >> 8) & 0xff
        val red = (px >> 16) & 0xff
        var blue = px & 0xff
        val newRed = (red - ctDelta(g2r & 0xff, green)) & 0xff
        blue = (blue - ctDelta(g2b & 0xff, green)) & 0xff
        blue = (blue - ctDelta(r2b & 0xff, red)) & 0xff
        (px & 0xff00ff00) | (newRed << 16) | blue
      }
      bw.write(1, 1); bw.write(1, 2) // COLOR
      bw.write(7, 3)
      writeImage(bw, Array(cte), 1, 1, 0,
        rowBackrefs = false, withMeta = false)
    }
    if (subtractGreen) {
      argb = argb.map { px =>
        val g = (px >> 8) & 0xff
        val r = (((px >> 16) & 0xff) - g) & 0xff
        val b = ((px & 0xff) - g) & 0xff
        (px & 0xff00ff00) | (r << 16) | b
      }
      bw.write(1, 1); bw.write(2, 2) // SUBTRACT_GREEN (no data)
    }
    bw.write(0, 1) // end of transforms
    writeImage(bw, argb, xsize, h, cacheBits, rowBackrefs,
      withMeta = true, metaBits = metaBits)
    val payload = Array(0x2f.toByte) ++ bw.bytes
    // RIFF container
    val chunkLen = payload.length
    val padded = chunkLen + (chunkLen & 1)
    val riffLen = 4 + 8 + padded
    val out = java.nio.ByteBuffer.allocate(12 + 8 + padded)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WEBP".getBytes("US-ASCII"))
    out.put("VP8L".getBytes("US-ASCII")).putInt(chunkLen)
    out.put(payload)
    if ((chunkLen & 1) == 1) out.put(0.toByte)
    out.array()
  }

  /** Per-channel subtraction mod 256 (the forward of [[addPixels]]). */
  private def subPixels(a: Int, b: Int): Int =
    (((a >>> 24) - (b >>> 24)) & 0xff) << 24 |
      ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16 |
      ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8 |
      ((((a & 0xff) - (b & 0xff))) & 0xff)
}
