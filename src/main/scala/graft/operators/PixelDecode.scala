package graft.operators

import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL pixel decode for the multimodal column — no external codecs.
  *
  * Two engines, cross-checked in spec:
  *   - [[decode]] uses the JDK's own `javax.imageio` (headless-safe;
  *     PNG/JPEG/GIF/BMP/TIFF readers ship with the `java.desktop`
  *     module present in this container), falling back to
  *   - [[decodePngPure]], a from-the-spec PNG decoder (RFC 2083:
  *     zlib IDAT via `java.util.zip.Inflater`, the five row filters,
  *     color types 0/2/3/4/6 at bit depth 8, non-interlaced).
  *
  * [[encodePngGray]] / [[encodePngRgb]] write real PNG bytes with the
  * same JDK-only machinery (`Deflater` + CRC32), which lets specs and
  * oracle queries prove the whole encode → container walk → inflate →
  * unfilter → feature path as an exact roundtrip on synthetic images.
  *
  * Every feature is INTEGER-exact (no float resampling), so results
  * are bit-stable across partitionings and replayable in oracle SQL:
  *   - [[grayLuma]]: (299r + 587g + 114b) / 1000, floor — identity on
  *     achromatic pixels, so gray PNG roundtrips are exact
  *   - [[resizeArea]]: exact rational box overlap (scaled-integer
  *     weights, floor division) — the standard area-average
  *     downsample without a single double
  *   - [[dHash]]: 9x8 area resize, bit (r*8+c) = g(r,c) > g(r,c+1)
  *   - [[pHash]]: 32x32 area resize, integer DCT-II (the shared
  *     [[DctCos]] table, scale 10000), top-left 8x8 block minus DC,
  *     median threshold (32nd smallest of the 63 AC coefficients)
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object PixelDecode {

  // ImageIO's default stream cache backs EVERY read with a temp FILE
  // (FileCacheImageInputStream): per-blob create/write/delete in
  // java.io.tmpdir, which serializes 32 concurrent decode tasks on
  // file-system and SecureRandom-name locks — profiled at ~100x task
  // CPU inflation on the image-funnel kernel stage once the kernel ran
  // at full parallelism. Memory-backed streams decode byte-identically
  // (same readers), so this is pure overhead removal (guide §1.2 step
  // 2: per-task work). Set once at class load; ImageIO reads are only
  // ever issued from this object and JpegDecode.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded image: packed 0xRRGGBB per pixel, row-major. */
  final case class Pixels(width: Int, height: Int, rgb: Array[Int])

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Decode via ImageIO when a reader exists, else the pure PNG/GIF
    * paths. None for bytes no engine understands. Never throws.
    */
  def decode(bytes: Array[Byte]): Option[Pixels] =
    decodeImageIo(bytes).orElse(decodePngPure(bytes))
      .orElse(decodeGifPure(bytes)).orElse(decodeBmpPure(bytes))
      .orElse(Vp8lDecode.decode(bytes))
      .orElse(JpegDecode.decode(bytes))

  private[operators] def decodeImageIo(
      bytes: Array[Byte]): Option[Pixels] =
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Int](w * h)
        val cs = img.getColorModel.getColorSpace
        if (cs.getType == java.awt.color.ColorSpace.TYPE_GRAY) {
          // getRGB would push gray samples through the linear-gray ->
          // sRGB transform (gamma), silently rewriting pixel values;
          // read the raw raster band instead (scaled to 8 bits)
          val raster = img.getRaster
          val bits = img.getColorModel.getComponentSize(0)
          val maxV = (1 << bits) - 1
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val s = raster.getSample(x, y, 0)
              val g = if (bits == 8) s else s * 255 / maxV
              out(y * w + x) = (g << 16) | (g << 8) | g
              x += 1
            }
            y += 1
          }
        } else {
          // getRGB returns ARGB in the default sRGB space; drop alpha
          img.getRGB(0, 0, w, h, out, 0, w)
          var i = 0
          while (i < out.length) { out(i) &= 0xffffff; i += 1 }
        }
        Some(Pixels(w, h, out))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** From-the-spec PNG decode: signature, chunk walk (IHDR, PLTE,
    * IDAT*, IEND), inflate, per-row unfilter, sample expansion.
    * Supports EVERY legal IHDR combination — bit depths 1/2/4/8/16
    * (sub-byte samples MSB-first-unpacked and scaled by
    * 255/(2^d-1) for gray, used raw as palette indices; 16-bit
    * samples take their high byte — the standard 8-bit reduction),
    * color types 0 (gray), 2 (rgb), 3 (palette), 4 (gray+alpha),
    * 6 (rgba) with the spec's type/depth validity matrix, and BOTH
    * interlace methods (0 and Adam7: seven sub-images, each with
    * its own filtered scanlines at its own reduced width, merged on
    * the 8x8 sparkle grid). Alpha dropped.
    */
  def decodePngPure(bytes: Array[Byte]): Option[Pixels] =
    try decodePngPureImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodePngPureImpl(b: Array[Byte]): Option[Pixels] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b == null || b.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return None; i += 1 }
    def be32(p: Int): Int =
      ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    var pos = 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    var interlace = 0
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var sawIhdr = false
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = be32(pos)
      // Long math: a hostile 4-byte length must not wrap the bound
      if (len < 0 || pos + 12L + len > b.length) return None
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      val dataAt = pos + 8
      ctype match {
        case "IHDR" =>
          // spec: IHDR carries exactly 13 bytes; a hostile shorter
          // length must fail HERE, deliberately — not by the outer
          // NonFatal catch swallowing an out-of-bounds read
          if (len < 13) return None
          w = be32(dataAt); h = be32(dataAt + 4)
          bitDepth = b(dataAt + 8) & 0xff
          colorType = b(dataAt + 9) & 0xff
          interlace = b(dataAt + 12) & 0xff
          sawIhdr = true
        case "PLTE" =>
          // spec: palette length is a multiple of 3 (RGB triples)
          if (len % 3 != 0) return None
          palette = (0 until len / 3).map { j =>
            ((b(dataAt + 3 * j) & 0xff) << 16) |
              ((b(dataAt + 3 * j + 1) & 0xff) << 8) |
              (b(dataAt + 3 * j + 2) & 0xff)
          }.toArray
        case "IDAT" => idat.write(b, dataAt, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      pos = dataAt + len + 4 // data + crc
    }
    if (!sawIhdr || w <= 0 || h <= 0) return None
    // the spec's color-type / bit-depth validity matrix
    val channels = colorType match {
      case 0 =>
        if (bitDepth != 1 && bitDepth != 2 && bitDepth != 4 &&
          bitDepth != 8 && bitDepth != 16) return None
        1
      case 2 => if (bitDepth != 8 && bitDepth != 16) return None; 3
      case 3 =>
        if (bitDepth != 1 && bitDepth != 2 && bitDepth != 4 &&
          bitDepth != 8) return None
        1
      case 4 => if (bitDepth != 8 && bitDepth != 16) return None; 2
      case 6 => if (bitDepth != 8 && bitDepth != 16) return None; 4
      case _ => return None
    }
    if (interlace != 0 && interlace != 1) return None
    if (colorType == 3 && palette == null) return None
    // allocation guard: a hostile IHDR must not OOM the executor
    // (OutOfMemoryError is not NonFatal — it would escape the wrapper)
    if (w.toLong * h * channels + h > (1L << 28)) return None
    def rowBytes(width: Int): Int =
      ((width.toLong * channels * bitDepth + 7) / 8).toInt
    // filter distance: bytes per complete pixel, min 1 (RFC 2083 §6)
    val bpp = math.max(1, channels * bitDepth / 8)
    // sub-images: the whole frame, or the seven Adam7 passes — each
    // pass is its own filtered scanline sequence at its reduced
    // width; empty passes contribute no bytes at all
    val passes: Seq[(Int, Int, Int, Int)] =
      if (interlace == 0) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val dims = passes.map { case (x0, y0, dx, dy) =>
      ((w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
    }
    val rawLen = dims.map { case (pw, ph) =>
      if (pw <= 0 || ph <= 0) 0L else ph.toLong * (1 + rowBytes(pw))
    }.sum
    if (rawLen <= 0 || rawLen > (1L << 29)) return None
    // the from-the-spec zlib/deflate engine, so this decoder shares
    // NOTHING with the ImageIO+native-zlib path it is pinned against
    // (Adler-32 verified; over-long output bails at the cap)
    val raw = Inflate.zlib(idat.toByteArray, maxOut = rawLen.toInt)
      .getOrElse(return None)
    if (raw.length < rawLen) return None
    val out = new Array[Int](w * h)
    val maxSub = (1 << bitDepth) - 1
    var base = 0
    var pi = 0
    while (pi < passes.length) {
      val (x0, y0, dx, dy) = passes(pi)
      val (pw, ph) = dims(pi)
      if (pw > 0 && ph > 0) {
        val stride = rowBytes(pw)
        val cur = new Array[Int](stride)
        val prev = new Array[Int](stride) // zero: each pass restarts
        var y = 0
        while (y < ph) {
          val rowAt = base + y * (1 + stride)
          val filter = raw(rowAt) & 0xff
          var x = 0
          while (x < stride) {
            val v = raw(rowAt + 1 + x) & 0xff
            val a = if (x >= bpp) cur(x - bpp) else 0
            val up = prev(x)
            val c = if (x >= bpp) prev(x - bpp) else 0
            val rec = filter match {
              case 0 => v
              case 1 => v + a
              case 2 => v + up
              case 3 => v + (a + up) / 2
              case 4 =>
                val p = a + up - c
                val pa = math.abs(p - a); val pb = math.abs(p - up)
                val pc = math.abs(p - c)
                v + (if (pa <= pb && pa <= pc) a
                  else if (pb <= pc) up else c)
              case _ => return None
            }
            cur(x) = rec & 0xff
            x += 1
          }
          // sample extraction at this pass's reduced width
          var px = 0
          while (px < pw) {
            // channel ch of pixel px, reduced to 8 bits
            def sample(ch: Int): Int =
              if (bitDepth == 8) cur(px * channels + ch)
              else if (bitDepth == 16) cur((px * channels + ch) * 2)
              else { // sub-byte: MSB-first packed, channels == 1
                val bit = px * bitDepth
                (cur(bit >> 3) >> (8 - bitDepth - (bit & 7))) &
                  maxSub
              }
            val rgb = colorType match {
              case 0 =>
                val g =
                  if (bitDepth < 8) sample(0) * 255 / maxSub
                  else sample(0)
                (g << 16) | (g << 8) | g
              case 2 =>
                (sample(0) << 16) | (sample(1) << 8) | sample(2)
              case 3 =>
                val idx = sample(0)
                if (idx >= palette.length) return None
                palette(idx)
              case 4 =>
                val g = sample(0)
                (g << 16) | (g << 8) | g
              case 6 =>
                (sample(0) << 16) | (sample(1) << 8) | sample(2)
            }
            out((y0 + y * dy) * w + (x0 + px * dx)) = rgb
            px += 1
          }
          System.arraycopy(cur, 0, prev, 0, stride)
          y += 1
        }
        base += ph * (1 + stride)
      }
      pi += 1
    }
    Some(Pixels(w, h, out))
  }

  /** From-the-spec GIF decode (GIF89a, Appendix F LZW): header +
    * logical screen descriptor, global/local color tables, extension
    * skip, FIRST image descriptor only (the still-image contract),
    * variable-width LZW with clear/EOI codes and the 4096-entry
    * dictionary cap, 4-pass interlace reorder. Transparency is
    * ignored (the transparent index still maps to its color-table
    * RGB — alpha is dropped everywhere in this module).
    */
  def decodeGifPure(bytes: Array[Byte]): Option[Pixels] =
    try decodeGifPureImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeGifPureImpl(b: Array[Byte]): Option[Pixels] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8i(i: Int): Int = b(i) & 0xff
    def le16i(i: Int): Int = (u8i(i + 1) << 8) | u8i(i)
    var pos = 6
    pos += 4 // screen width/height (frame carries its own dims)
    val packed = u8i(pos); pos += 3 // packed, bg index, aspect
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > b.length) return None
      gct = Array.tabulate(n)(j => (u8i(pos + 3 * j) << 16) |
        (u8i(pos + 3 * j + 1) << 8) | u8i(pos + 3 * j + 2))
      pos += 3 * n
    }
    // block walk to the first image descriptor
    while (pos < b.length) {
      u8i(pos) match {
        case 0x21 => // extension: label + length-prefixed sub-blocks
          pos += 2
          while (pos < b.length && u8i(pos) != 0) pos += 1 + u8i(pos)
          pos += 1
        case 0x3b => return None // trailer before any image
        case 0x2c =>
          pos += 1
          if (pos + 9 > b.length) return None
          val w = le16i(pos + 4)
          val h = le16i(pos + 6)
          val ipacked = u8i(pos + 8)
          pos += 9
          if (w < 1 || h < 1 || w.toLong * h > (1L << 26)) return None
          var table = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > b.length) return None
            table = Array.tabulate(n)(j => (u8i(pos + 3 * j) << 16) |
              (u8i(pos + 3 * j + 1) << 8) | u8i(pos + 3 * j + 2))
            pos += 3 * n
          }
          if (table == null) return None
          val interlaced = (ipacked & 0x40) != 0
          if (pos >= b.length) return None
          val minCode = u8i(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          // concatenate the length-prefixed data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < b.length && u8i(pos) != 0) {
            val len = u8i(pos)
            if (pos + 1 + len > b.length) return None
            data.write(b, pos + 1, len)
            pos += 1 + len
          }
          val idx = lzwDecode(minCode, data.toByteArray, w * h)
            .getOrElse(return None)
          val out = new Array[Int](w * h)
          // interlace: rows arrive in 4 passes (GIF89a §20)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, h)
            else (Seq.range(0, h, 8) ++ Seq.range(4, h, 8) ++
              Seq.range(2, h, 4) ++ Seq.range(1, h, 2)).toArray
          var r = 0
          while (r < h) {
            val destRow = rowOrder(r)
            var c = 0
            while (c < w) {
              val v = idx(r * w + c)
              if (v >= table.length) return None
              out(destRow * w + c) = table(v)
              c += 1
            }
            r += 1
          }
          return Some(Pixels(w, h, out))
        case _ => return None // desynced
      }
    }
    None
  }

  /** From-the-spec BMP decode (BITMAPINFOHEADER): "BM" + pixel-data
    * offset at byte 10, the 40-byte info header at 14 (LE width, LE
    * signed height — positive means bottom-up rows). The classic
    * matrix: BI_RGB at 1/4/8-bit palette (MSB-first packed
    * indices, BGRA quads), 16-bit X1R5G5B5 (5-to-8-bit channel
    * expansion by round-scaling (c*255+15)/31, the
    * DirectColorModel convention), 24/32-bit BGR(A); and the RLE
    * compressions — BI_RLE8
    * and BI_RLE4 (encoded runs, absolute mode with word-aligned
    * padding, EOL/EOB/delta escapes; undrawn cells stay color 0 as
    * the format intends). Rows pad to 4 bytes. Alpha dropped like
    * everywhere in this module.
    */
  def decodeBmpPure(bytes: Array[Byte]): Option[Pixels] =
    try decodeBmpPureImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }

  private def decodeBmpPureImpl(b: Array[Byte]): Option[Pixels] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M')
      return None
    def u8i(i: Int): Int = b(i) & 0xff
    def le16i(i: Int): Int = (u8i(i + 1) << 8) | u8i(i)
    def le32i(i: Int): Int = (u8i(i + 3) << 24) | (u8i(i + 2) << 16) |
      (u8i(i + 1) << 8) | u8i(i)
    val dataAt = le32i(10)
    val hdrSize = le32i(14)
    if (hdrSize < 40) return None // BITMAPCOREHEADER not supported
    val w = le32i(18)
    val hRaw = le32i(22)
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    val bpp = le16i(28)
    val compression = le32i(30)
    if (w < 1 || h < 1 || w.toLong * h > (1L << 26)) return None
    val rle8 = compression == 1 && bpp == 8
    val rle4 = compression == 2 && bpp == 4
    if (compression != 0 && !rle8 && !rle4) return None
    if (compression == 0 && bpp != 1 && bpp != 4 && bpp != 8 &&
      bpp != 16 && bpp != 24 && bpp != 32) return None
    val palette: Array[Int] =
      if (bpp <= 8) {
        val declared = le32i(46) // biClrUsed; 0 means the full set
        val full = 1 << bpp
        val n = if (declared == 0) full else declared
        val at = 14 + hdrSize
        if (n < 1 || n > 256 || at + 4 * n > b.length) return None
        Array.tabulate(n)(j => (u8i(at + 4 * j + 2) << 16) |
          (u8i(at + 4 * j + 1) << 8) | u8i(at + 4 * j))
      } else null
    val out = new Array[Int](w * h)
    if (rle8 || rle4) {
      // RLE bitmaps are bottom-up by definition; undrawn cells keep
      // palette color 0 (the format's skip/delta semantics)
      if (!bottomUp) return None
      if (palette.isEmpty) return None
      java.util.Arrays.fill(out, palette(0))
      var p = dataAt
      var x = 0
      var row = 0 // bottom-up row counter
      def plot(idx: Int): Unit = {
        if (idx >= palette.length) bailBmp()
        if (x < w && row < h)
          out((h - 1 - row) * w + x) = palette(idx)
        x += 1
      }
      var open = true
      while (open) {
        if (p + 1 >= b.length) return None
        val n = u8i(p)
        val v = u8i(p + 1)
        p += 2
        if (n > 0) { // encoded run
          var i = 0
          while (i < n) {
            val idx =
              if (rle8) v
              else if ((i & 1) == 0) v >> 4
              else v & 15
            plot(idx)
            i += 1
          }
        } else v match {
          case 0 => x = 0; row += 1 // end of line
          case 1 => open = false // end of bitmap
          case 2 => // delta
            if (p + 1 >= b.length) return None
            x += u8i(p)
            row += u8i(p + 1)
            p += 2
          case cnt => // absolute mode, word-aligned
            val bytesUsed =
              if (rle8) cnt else (cnt + 1) / 2
            val padded = (bytesUsed + 1) / 2 * 2
            if (p + padded > b.length) return None
            var i = 0
            while (i < cnt) {
              val idx =
                if (rle8) u8i(p + i)
                else if ((i & 1) == 0) u8i(p + i / 2) >> 4
                else u8i(p + i / 2) & 15
              plot(idx)
              i += 1
            }
            p += padded
        }
        if (row > h) return None // runaway cursor
      }
    } else {
      val stride = ((w.toLong * bpp + 31) / 32 * 4).toInt
      if (dataAt < 0 || dataAt.toLong + stride.toLong * h > b.length)
        return None
      var row = 0
      while (row < h) {
        val srcRow = if (bottomUp) h - 1 - row else row
        val at = dataAt + srcRow * stride
        var x = 0
        while (x < w) {
          out(row * w + x) = bpp match {
            case 1 | 4 =>
              val bit = x * bpp
              val idx = (u8i(at + (bit >> 3)) >>
                (8 - bpp - (bit & 7))) & ((1 << bpp) - 1)
              if (idx >= palette.length) return None
              palette(idx)
            case 8 =>
              val idx = u8i(at + x)
              if (idx >= palette.length) return None
              palette(idx)
            case 16 => // X1R5G5B5; 5->8 bits by round-scaling
              // (v*255+15)/31 — the DirectColorModel convention, so
              // the two engines agree bit for bit
              val v = le16i(at + x * 2)
              def s5(c: Int): Int = (c * 255 + 15) / 31
              (s5((v >> 10) & 31) << 16) | (s5((v >> 5) & 31) << 8) |
                s5(v & 31)
            case _ => // 24 / 32: BGR(A) sample order
              val p = at + x * (bpp / 8)
              (u8i(p + 2) << 16) | (u8i(p + 1) << 8) | u8i(p)
          }
          x += 1
        }
        row += 1
      }
    }
    Some(Pixels(w, h, out))
  }

  private final class BmpBail extends
    RuntimeException(null, null, false, false)
  private def bailBmp(): Nothing = throw new BmpBail

  /** GIF-flavor LZW (LSB-first bit packing, variable code width,
    * clear/EOI codes, 4096-entry cap). Returns exactly `nPixels`
    * color indices, or None on a corrupt stream.
    */
  private def lzwDecode(
      minCode: Int, data: Array[Byte], nPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val MaxCodes = 4096
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Int](MaxCodes)
    var codeSize = minCode + 1
    var next = eoi + 1
    var bitPos = 0L
    val totalBits = data.length * 8L
    def readCode(): Int = {
      if (bitPos + codeSize > totalBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if (((data((p >> 3).toInt) >> (p & 7).toInt) & 1) != 0)
          v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    val out = new Array[Int](nPixels)
    var got = 0
    val stack = new Array[Int](MaxCodes + 1)
    var prev = -1
    while (got < nPixels) {
      val code = readCode()
      if (code < 0 || code == eoi) return None // short stream
      if (code == clear) {
        codeSize = minCode + 1
        next = eoi + 1
        prev = -1
      } else {
        if (prev == -1) {
          if (code >= clear) return None // first code must be literal
          out(got) = code; got += 1
          prev = code
        } else {
          if (code > next || code == eoi) return None
          var sp = 0
          var cur = if (code == next) { // KwKwK case
            stack(sp) = firstChar(prev, prefix, suffix, clear); sp += 1
            prev
          } else code
          while (cur >= clear + 2) { // walk the chain (skip clear/eoi)
            stack(sp) = suffix(cur); sp += 1
            cur = prefix(cur)
          }
          stack(sp) = cur; sp += 1 // the literal root
          // emit reversed
          while (sp > 0 && got < nPixels) {
            sp -= 1; out(got) = stack(sp); got += 1
          }
          if (sp > 0) return None // overflow past the pixel count
          if (next < MaxCodes) {
            prefix(next) = prev
            suffix(next) = firstChar(code, prefix, suffix, clear)
            next += 1
            if (next < MaxCodes && next == (1 << codeSize) &&
              codeSize < 12)
              codeSize += 1
          }
          prev = code
        }
      }
    }
    Some(out)
  }

  /** First (root) character of a code's expansion chain. */
  private def firstChar(
      code: Int, prefix: Array[Int], suffix: Array[Int],
      clear: Int): Int = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c
  }

  /** Animated-GIF decode: EVERY image descriptor composited onto the
    * logical-screen canvas per GIF89a semantics — graphic-control
    * extensions (transparency index, disposal methods 1 leave /
    * 2 restore-background / 3 restore-previous), frame rects at
    * (left, top), local color tables, interlace — one full-canvas
    * snapshot per frame, in order. None for malformed streams
    * (truncation, rect outside the screen, missing tables, bad LZW)
    * — never a partial animation. Single-frame GIFs yield one frame
    * whose pixels match [[decodeGifPure]] when the frame covers the
    * screen. `maxFrames` is additionally bounded so frames x canvas
    * pixels stays <= 2^26 — each frame snapshots the FULL canvas, and
    * LZW expands tiny hostile payloads into full frames, so the
    * per-canvas pixel cap alone would not bound total memory. Never
    * throws.
    */
  def gifFrames(
      bytes: Array[Byte], maxFrames: Int = 1024): Option[Seq[Pixels]] =
    try gifFramesImpl(bytes, maxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Joint frames-x-canvas memory bound for animation decodes: the
    * largest frame count keeping total snapshot pixels <= 2^26
    * (256 MB of ints), floored at 1 so a legal single-frame
    * max-canvas animation still decodes.
    */
  private def boundedFrames(maxFrames: Int, w: Int, h: Int): Int =
    math.max(1L, math.min(maxFrames.toLong,
      (1L << 26) / math.max(w.toLong * h, 1L))).toInt

  private def gifFramesImpl(
      b: Array[Byte], maxFrames: Int): Option[Seq[Pixels]] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def u8i(i: Int): Int = b(i) & 0xff
    def le16i(i: Int): Int = (u8i(i + 1) << 8) | u8i(i)
    val sw = le16i(6)
    val sh = le16i(8)
    if (sw < 1 || sh < 1 || sw.toLong * sh > (1L << 26)) return None
    val frameCap = boundedFrames(maxFrames, sw, sh)
    var pos = 10
    val packed = u8i(pos)
    val bgIndex = u8i(pos + 1)
    pos += 3
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > b.length) return None
      gct = Array.tabulate(n)(j => (u8i(pos + 3 * j) << 16) |
        (u8i(pos + 3 * j + 1) << 8) | u8i(pos + 3 * j + 2))
      pos += 3 * n
    }
    val bg =
      if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0
    val canvas = Array.fill(sw * sh)(bg)
    val frames = new scala.collection.mutable.ArrayBuffer[Pixels]()
    // pending graphic-control state for the NEXT image descriptor
    var disposal = 0
    var transparentIdx = -1
    while (pos < b.length) {
      u8i(pos) match {
        case 0x3b => // trailer
          return if (frames.isEmpty) None else Some(frames.toSeq)
        case 0x21 =>
          val label = if (pos + 1 < b.length) u8i(pos + 1) else -1
          if (label == 0xf9 && pos + 7 < b.length && u8i(pos + 2) == 4) {
            val p = u8i(pos + 3)
            disposal = (p >> 2) & 7
            transparentIdx = if ((p & 1) != 0) u8i(pos + 6) else -1
          }
          pos += 2
          while (pos < b.length && u8i(pos) != 0) pos += 1 + u8i(pos)
          if (pos >= b.length) return None
          pos += 1
        case 0x2c =>
          if (frames.length >= frameCap) return Some(frames.toSeq)
          pos += 1
          if (pos + 9 > b.length) return None
          val left = le16i(pos)
          val top = le16i(pos + 2)
          val w = le16i(pos + 4)
          val h = le16i(pos + 6)
          val ipacked = u8i(pos + 8)
          pos += 9
          if (w < 1 || h < 1 || left + w > sw || top + h > sh) return None
          var table = gct
          if ((ipacked & 0x80) != 0) {
            val n = 2 << (ipacked & 7)
            if (pos + 3 * n > b.length) return None
            table = Array.tabulate(n)(j => (u8i(pos + 3 * j) << 16) |
              (u8i(pos + 3 * j + 1) << 8) | u8i(pos + 3 * j + 2))
            pos += 3 * n
          }
          if (table == null) return None
          val interlaced = (ipacked & 0x40) != 0
          if (pos >= b.length) return None
          val minCode = u8i(pos); pos += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (pos < b.length && u8i(pos) != 0) {
            val len = u8i(pos)
            if (pos + 1 + len > b.length) return None
            data.write(b, pos + 1, len)
            pos += 1 + len
          }
          if (pos >= b.length) return None
          pos += 1 // sub-block terminator
          val idx = lzwDecode(minCode, data.toByteArray, w * h)
            .getOrElse(return None)
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, h)
            else (Seq.range(0, h, 8) ++ Seq.range(4, h, 8) ++
              Seq.range(2, h, 4) ++ Seq.range(1, h, 2)).toArray
          val before =
            if (disposal == 3) canvas.clone() else null
          var r = 0
          while (r < h) {
            val destRow = top + rowOrder(r)
            var c = 0
            while (c < w) {
              val v = idx(r * w + c)
              if (v >= table.length) return None
              if (v != transparentIdx)
                canvas(destRow * sw + left + c) = table(v)
              c += 1
            }
            r += 1
          }
          frames += Pixels(sw, sh, canvas.clone())
          disposal match {
            case 2 => // restore background in the frame's rect
              var rr = 0
              while (rr < h) {
                var cc = 0
                while (cc < w) {
                  canvas((top + rr) * sw + left + cc) = bg; cc += 1
                }
                rr += 1
              }
            case 3 => System.arraycopy(before, 0, canvas, 0, before.length)
            case _ => () // 0/1: leave in place
          }
          disposal = 0
          transparentIdx = -1
        case _ => return None // desynced
      }
    }
    None // ran out of bytes before the trailer
  }

  /** Animated-PNG decode (the APNG spec's acTL/fcTL/fdAT chunks over
    * RFC 2083 PNG): every fcTL frame's data re-assembles as a
    * standalone PNG at the FRAME's dims (APNG's own rule: frame data
    * is an independent zlib stream with the image's depth/color
    * type) and decodes through [[decodePngPure]], then composites
    * onto the logical canvas at (x_offset, y_offset) with dispose
    * 0 none / 1 background / 2 previous. Alpha-less color types only
    * (0/2/3 — there blend "over" equals "source" by spec, so the
    * opaque-canvas model is exact); alpha color types, sequence-number
    * disorder, frame-count mismatches, rects outside the canvas, and
    * truncation return None honestly. A PNG without acTL is not an
    * animation (None — [[decodePngPure]] owns stills). Never throws.
    */
  def apngFrames(
      bytes: Array[Byte], maxFrames: Int = 1024): Option[Seq[Pixels]] =
    try apngFramesImpl(bytes, maxFrames)
    catch { case scala.util.control.NonFatal(_) => None }

  private final case class Fctl(
      seq: Long, w: Int, h: Int, x: Int, y: Int,
      dispose: Int, blend: Int)

  private def apngFramesImpl(
      b: Array[Byte], maxFrames: Int): Option[Seq[Pixels]] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b == null || b.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != sig(i)) return None; i += 1 }
    def be32(p: Int): Long =
      ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    var pos = 8
    var w = 0; var h = 0
    var ihdrTail: Array[Byte] = null // depth..interlace (5 bytes)
    var plte: Array[Byte] = null
    var numFrames = -1L
    val frames = new scala.collection.mutable.ArrayBuffer[
      (Fctl, java.io.ByteArrayOutputStream)]()
    var lastSeq = -1L
    var done = false
    while (!done && pos + 8 <= b.length) {
      val len = be32(pos)
      if (len < 0 || pos + 12L + len > b.length) return None
      val l = len.toInt
      val ctype = new String(b, pos + 4, 4, "US-ASCII")
      val at = pos + 8
      ctype match {
        case "IHDR" =>
          if (l < 13) return None
          w = be32(at).toInt; h = be32(at + 4).toInt
          ihdrTail = java.util.Arrays.copyOfRange(b, at + 8, at + 13)
          val colorType = b(at + 9) & 0xff
          if ((b(at + 8) & 0xff) != 8 || (b(at + 12) & 0xff) != 0)
            return None
          if (colorType != 0 && colorType != 2 && colorType != 3)
            return None // alpha types: the opaque model would lie
        case "acTL" =>
          if (l < 8) return None
          numFrames = be32(at)
        case "PLTE" =>
          plte = java.util.Arrays.copyOfRange(b, at, at + l)
        case "fcTL" =>
          if (l < 26 || numFrames < 0) return None
          val seq = be32(at)
          if (seq != lastSeq + 1) return None
          lastSeq = seq
          // fcTL before IHDR is malformed (IHDR must come first), and
          // the frame count is jointly bounded with the canvas size —
          // every frame snapshots the full canvas (see gifFrames)
          if (w < 1 || h < 1) return None
          if (frames.length >= boundedFrames(maxFrames, w, h)) return None
          frames += Fctl(seq, be32(at + 4).toInt, be32(at + 8).toInt,
            be32(at + 12).toInt, be32(at + 16).toInt,
            b(at + 24) & 0xff, b(at + 25) & 0xff) ->
            new java.io.ByteArrayOutputStream()
        case "IDAT" =>
          // default-image data: frame 1 iff its fcTL came first
          if (frames.length == 1) frames.head._2.write(b, at, l)
          else if (frames.length > 1) return None
        case "fdAT" =>
          if (l < 4 || frames.isEmpty) return None
          val seq = be32(at)
          if (seq != lastSeq + 1) return None
          lastSeq = seq
          frames.last._2.write(b, at + 4, l - 4)
        case "IEND" => done = true
        case _ => ()
      }
      pos = at + l + 4
    }
    if (!done || numFrames < 1 || frames.length != numFrames ||
        w < 1 || h < 1 || w.toLong * h > (1L << 26)) return None
    val canvas = new Array[Int](w * h) // APNG background: black
    val out = new scala.collection.mutable.ArrayBuffer[Pixels]()
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    frames.foreach { case (f, buf) =>
      if (f.w < 1 || f.h < 1 || f.x < 0 || f.y < 0 ||
          f.x + f.w > w || f.y + f.h > h) return None
      if (f.blend > 1 || f.dispose > 2) return None
      // re-assemble the frame as a standalone PNG at the frame dims
      val mini = new java.io.ByteArrayOutputStream()
      mini.write(pngSig)
      val ihdr = new Array[Byte](13)
      ihdr(0) = (f.w >>> 24).toByte; ihdr(1) = (f.w >>> 16).toByte
      ihdr(2) = (f.w >>> 8).toByte; ihdr(3) = f.w.toByte
      ihdr(4) = (f.h >>> 24).toByte; ihdr(5) = (f.h >>> 16).toByte
      ihdr(6) = (f.h >>> 8).toByte; ihdr(7) = f.h.toByte
      System.arraycopy(ihdrTail, 0, ihdr, 8, 5)
      chunk(mini, "IHDR", ihdr)
      if (plte != null) chunk(mini, "PLTE", plte)
      chunk(mini, "IDAT", buf.toByteArray)
      chunk(mini, "IEND", Array.empty[Byte])
      val px = decodePngPure(mini.toByteArray).getOrElse(return None)
      val before = if (f.dispose == 2) canvas.clone() else null
      var r = 0
      while (r < f.h) {
        System.arraycopy(px.rgb, r * f.w, canvas,
          (f.y + r) * w + f.x, f.w)
        r += 1
      }
      out += Pixels(w, h, canvas.clone())
      f.dispose match {
        case 1 =>
          var rr = 0
          while (rr < f.h) {
            java.util.Arrays.fill(canvas, (f.y + rr) * w + f.x,
              (f.y + rr) * w + f.x + f.w, 0)
            rr += 1
          }
        case 2 => System.arraycopy(before, 0, canvas, 0, before.length)
        case _ => ()
      }
    }
    Some(out.toSeq)
  }

  /** Encode an animated PNG (APNG) from full-canvas GRAY frames —
    * acTL + per-frame fcTL, frame 1 in IDAT, later frames in fdAT
    * (each an independent zlib stream), shared sequence numbering.
    * [[apngFrames]] -> identical pixels is the roundtrip spec.
    */
  def encodeApngGray(
      w: Int, h: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(w >= 1 && h >= 1, s"dims $w x $h")
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == w * h &&
      f.forall(v => v >= 0 && v <= 255), "frame shape/range"))
    def deflated(gray: Array[Int]): Array[Byte] = {
      val raw = new Array[Byte](h * (1 + w))
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raw(y * (1 + w) + 1 + x) = gray(y * w + x).toByte; x += 1
        }
        y += 1
      }
      val d = new Deflater()
      d.setInput(raw); d.finish()
      val comp = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
      d.end()
      comp.toByteArray
    }
    def be32a(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = be32a(w) ++ be32a(h) ++ Array[Byte](8, 0, 0, 0, 0)
    chunk(out, "IHDR", ihdr)
    chunk(out, "acTL", be32a(frames.length) ++ be32a(0))
    var seq = 0L
    frames.zipWithIndex.foreach { case (f, i) =>
      val fctl = be32a(seq) ++ be32a(w) ++ be32a(h) ++ be32a(0) ++
        be32a(0) ++ Array[Byte](0, 1, 0, 10, 0, 0) // delay 1/10, 0, 0
      chunk(out, "fcTL", fctl)
      seq += 1
      if (i == 0) chunk(out, "IDAT", deflated(f))
      else {
        chunk(out, "fdAT", be32a(seq) ++ deflated(f))
        seq += 1
      }
    }
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Encode an animated GIF89a from full-canvas GRAY frames (values
    * 0..255; palette j -> (j, j, j), so [[grayLuma]] is the identity
    * back): one graphic-control block (disposal 1, no transparency)
    * + full-screen image descriptor per frame, LZW coded as literal
    * root codes with a clear every 250 literals (keeps the code
    * width at 9 bits — the classic table-growth-free encoding; ~9/8
    * expansion, fine for fixtures). [[gifFrames]] ->
    * identical pixel values is the roundtrip spec.
    */
  def encodeGifGrayAnimated(
      w: Int, h: Int, frames: Seq[Array[Int]],
      delayCs: Int = 10): Array[Byte] = {
    require(w >= 1 && h >= 1 && w <= 0xffff && h <= 0xffff, s"dims $w x $h")
    require(frames.nonEmpty, "at least one frame")
    frames.foreach(f => require(f.length == w * h &&
      f.forall(v => v >= 0 && v <= 255), "frame shape/range"))
    val out = new java.io.ByteArrayOutputStream()
    def le16o(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16o(w); le16o(h)
    out.write(0x80 | 0x70 | 0x07) // GCT present, 8-bit color, 256 entries
    out.write(0) // background index
    out.write(0) // aspect
    (0 until 256).foreach { j => out.write(j); out.write(j); out.write(j) }
    frames.foreach { f =>
      // graphic control: disposal 1 (leave), no transparency
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(1 << 2); le16o(delayCs); out.write(0); out.write(0)
      // image descriptor: full screen, no LCT, no interlace
      out.write(0x2c); le16o(0); le16o(0); le16o(w); le16o(h); out.write(0)
      out.write(8) // LZW min code size
      // literal-code stream, LSB-first bit packing, 9-bit codes
      val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
      var cur = 0
      var nb = 0
      def put(code: Int): Unit = {
        cur |= code << nb
        nb += 9
        while (nb >= 8) { bits += (cur & 0xff).toByte; cur >>= 8; nb -= 8 }
      }
      put(256) // initial clear
      var i = 0
      while (i < f.length) {
        if (i > 0 && i % 250 == 0) put(256) // stay at 9-bit width
        put(f(i))
        i += 1
      }
      put(257) // end of information
      if (nb > 0) bits += (cur & 0xff).toByte
      // length-prefixed sub-blocks
      var off = 0
      val arr = bits.toArray
      while (off < arr.length) {
        val n = math.min(255, arr.length - off)
        out.write(n)
        out.write(arr, off, n)
        off += n
      }
      out.write(0) // sub-block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // encode
  // ------------------------------------------------------------------

  private def chunk(
      out: java.io.ByteArrayOutputStream, ctype: String,
      data: Array[Byte]): Unit = {
    def be32(v: Long): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length.toLong))
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32()
    crc.update(tb); crc.update(data)
    out.write(be32(crc.getValue))
  }

  private def encodePng(
      w: Int, h: Int, colorType: Int, channels: Int,
      sample: (Int, Int) => Int): Array[Byte] = {
    require(w >= 1 && h >= 1, s"encodePng: ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zeroed
    chunk(out, "IHDR", ihdr)
    val raw = new Array[Byte](h * (1 + w * channels))
    var y = 0
    while (y < h) {
      val rowAt = y * (1 + w * channels) // filter byte 0 per row
      var x = 0
      while (x < w * channels) {
        raw(rowAt + 1 + x) = sample(y, x).toByte
        x += 1
      }
      y += 1
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) comp.write(buf, 0, d.deflate(buf))
    d.end()
    chunk(out, "IDAT", comp.toByteArray)
    chunk(out, "IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Real BMP bytes: 8-bit palette frames, plain (BI_RGB) or
    * run-length encoded (BI_RLE8: per-row maximal runs, EOL after
    * every row, EOB closing the frame), and 16-bit X1R5G5B5 frames
    * — the writer sides of [[decodeBmpPure]]'s matrix, used by the
    * fixture queries and readable by any BMP consumer. `indices`
    * are row-major TOP-DOWN (the writer flips to the format's
    * bottom-up order).
    */
  def encodeBmp8(w: Int, h: Int, indices: Array[Int],
      palette: Array[Int], rle: Boolean): Array[Byte] = {
    require(indices.length == w * h, "encodeBmp8: bad length")
    require(palette.nonEmpty && palette.length <= 256, "palette")
    val data = new java.io.ByteArrayOutputStream()
    if (rle) {
      var row = h - 1 // bottom-up
      while (row >= 0) {
        var x = 0
        while (x < w) {
          val v = indices(row * w + x)
          var n = 1
          while (x + n < w && n < 255 &&
            indices(row * w + x + n) == v) n += 1
          data.write(n); data.write(v)
          x += n
        }
        if (row > 0) { data.write(0); data.write(0) } // EOL
        row -= 1
      }
      data.write(0); data.write(1) // EOB
    } else {
      val stride = (w + 3) / 4 * 4
      var row = h - 1
      while (row >= 0) {
        var x = 0
        while (x < w) { data.write(indices(row * w + x)); x += 1 }
        while (x < stride) { data.write(0); x += 1 }
        row -= 1
      }
    }
    bmpWrap(w, h, 8, if (rle) 1 else 0, palette, data.toByteArray)
  }

  /** 16-bit X1R5G5B5 BMP from 8-bit RGB (channels truncated >> 3 —
    * round-trips exactly through the round-scaling expansion when
    * the inputs already sit on the scaled lattice).
    */
  def encodeBmp16(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, "encodeBmp16: bad length")
    val data = new java.io.ByteArrayOutputStream()
    val stride = (w * 2 + 3) / 4 * 4
    var row = h - 1
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val p = rgb(row * w + x)
        val v = ((((p >> 16) & 0xff) >> 3) << 10) |
          ((((p >> 8) & 0xff) >> 3) << 5) | ((p & 0xff) >> 3)
        data.write(v & 0xff); data.write((v >> 8) & 0xff)
        x += 1
      }
      var pad = w * 2
      while (pad < stride) { data.write(0); pad += 1 }
      row -= 1
    }
    bmpWrap(w, h, 16, 0, Array.empty, data.toByteArray)
  }

  private def bmpWrap(w: Int, h: Int, bpp: Int, compression: Int,
      palette: Array[Int], data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
    }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16(v >>> 16) }
    val dataAt = 54 + 4 * palette.length
    out.write('B'); out.write('M')
    le32(dataAt + data.length); le32(0); le32(dataAt)
    le32(40); le32(w); le32(h) // bottom-up
    le16(1); le16(bpp); le32(compression); le32(data.length)
    le32(2835); le32(2835); le32(palette.length); le32(0)
    palette.foreach { c =>
      out.write(c & 0xff); out.write((c >> 8) & 0xff)
      out.write((c >> 16) & 0xff); out.write(0)
    }
    out.write(data)
    out.toByteArray
  }

  /** Real 8-bit grayscale PNG from `gray` (row-major, 0..255). */
  def encodePngGray(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h, "encodePngGray: bad length")
    encodePng(w, h, colorType = 0, channels = 1,
      (y, x) => gray(y * w + x) & 0xff)
  }

  /** Real 8-bit RGB PNG from packed 0xRRGGBB (row-major). */
  def encodePngRgb(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, "encodePngRgb: bad length")
    encodePng(w, h, colorType = 2, channels = 3, (y, x) => {
      val p = rgb(y * w + x / 3)
      x % 3 match {
        case 0 => (p >>> 16) & 0xff
        case 1 => (p >>> 8) & 0xff
        case _ => p & 0xff
      }
    })
  }

  // ------------------------------------------------------------------
  // integer-exact features
  // ------------------------------------------------------------------

  /** Integer luma per pixel: (299r + 587g + 114b) / 1000 (floor).
    * Exactly the gray value on achromatic pixels (r=g=b).
    */
  def grayLuma(p: Pixels): Array[Int] = {
    val out = new Array[Int](p.rgb.length)
    var i = 0
    while (i < out.length) {
      val v = p.rgb(i)
      out(i) = (299 * ((v >>> 16) & 0xff) + 587 * ((v >>> 8) & 0xff) +
        114 * (v & 0xff)) / 1000
      i += 1
    }
    out
  }

  /** Exact area-average resample (floor): output cell (j,i) is the
    * box average of the source region it covers, computed with
    * scaled-integer box overlaps (source x scaled by tw, y by th — so
    * each output cell's total weight is exactly w*h). Identity when
    * (tw,th) == (w,h); on upscale each cell averages the 1-4 source
    * pixels it intersects (box sampling), still integer-exact.
    */
  def resizeArea(
      src: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    require(src.length == w * h, "resizeArea: bad length")
    require(tw >= 1 && th >= 1, s"resizeArea: ${w}x$h -> ${tw}x$th")
    if (tw == w && th == h) return src.clone()
    val out = new Array[Int](tw * th)
    val denom = w.toLong * h
    var j = 0
    while (j < th) {
      val y0 = j.toLong * h // cell spans [y0, y0+h) in y-scaled-by-th
      var i = 0
      while (i < tw) {
        val x0 = i.toLong * w
        var acc = 0L
        var r = (y0 / th).toInt // first source row overlapping
        while (r.toLong * th < y0 + h) {
          val ovY = math.min((r + 1).toLong * th, y0 + h) -
            math.max(r.toLong * th, y0)
          var c = (x0 / tw).toInt
          while (c.toLong * tw < x0 + w) {
            val ovX = math.min((c + 1).toLong * tw, x0 + w) -
              math.max(c.toLong * tw, x0)
            acc += ovX * ovY * src(r * w + c)
            c += 1
          }
          r += 1
        }
        out(j * tw + i) = (acc / denom).toInt
        i += 1
      }
      j += 1
    }
    out
  }

  /** Difference hash: area-resize to 9x8, bit (r*8+c) set iff
    * g(r,c) > g(r,c+1). Full 64 bits (bit 63 may set the sign).
    */
  def dHash(gray: Array[Int], w: Int, h: Int): Long = {
    val g = resizeArea(gray, w, h, 9, 8)
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c) > g(r * 9 + c + 1)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** The shared integer DCT-II cosine table: DctCos(u)(x) =
    * round(cos((2x+1) * u * pi / 64) * 10000) for u in 0..7 (the only
    * rows the 8x8 output block needs), x in 0..31. These CONSTANTS
    * are the contract — oracle SQL inlines the same values, so no
    * cross-engine libm/rounding question exists.
    */
  val DctScale = 10000L
  val DctCos: Array[Array[Long]] = Array.tabulate(8, 32) { (u, x) =>
    math.round(math.cos((2 * x + 1) * u * math.Pi / 64) * DctScale)
  }

  /** Perceptual hash: area-resize to 32x32, integer DCT-II, top-left
    * 8x8 coefficient block, drop DC, threshold the 63 AC coefficients
    * at their median (the 32nd smallest — exact order statistic, no
    * interpolation): bit (u*8+v-1) set iff coef(u,v) > median.
    * 63 bits — never negative.
    */
  def pHash(gray: Array[Int], w: Int, h: Int): Long = {
    val g = resizeArea(gray, w, h, 32, 32)
    pHash32(g)
  }

  /** The DCT + threshold half of [[pHash]] on an already-32x32 image. */
  def pHash32(g: Array[Int]): Long = {
    require(g.length == 32 * 32, "pHash32 needs 32x32")
    // separable: t(u)(y) = sum_x cos(u,x) * g(x,y)  (x = row index)
    val t = Array.ofDim[Long](8, 32)
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 32) {
        var s = 0L
        var x = 0
        while (x < 32) { s += DctCos(u)(x) * g(x * 32 + yy); x += 1 }
        t(u)(yy) = s
        yy += 1
      }
      u += 1
    }
    val coefs = new Array[Long](64)
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L
        var yy = 0
        while (yy < 32) { s += DctCos(v)(yy) * t(u)(yy); yy += 1 }
        coefs(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    val ac = coefs.drop(1).sorted
    val med = ac(31) // 32nd smallest of 63
    var bits = 0L
    var i = 1
    while (i < 64) {
      if (coefs(i) > med) bits |= 1L << (i - 1)
      i += 1
    }
    bits
  }
}
