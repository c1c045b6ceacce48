package graft.operators

/** Pure-JVM image header parsing: container format + pixel dimensions
  * from the first bytes of a blob, no codec libraries. This makes the
  * multimodal `width`/`height` feature columns REAL for the formats a
  * training-data pipeline actually meets (PNG, JPEG, GIF, BMP, TIFF,
  * WebP); the pixel decode itself lives in [[PixelDecode]]. Header
  * layouts are from the public specs: PNG (RFC 2083 §4.1.1 IHDR),
  * JPEG (ITU T.81 SOFn segment), GIF (GIF89a §17 logical screen
  * descriptor), BMP (BITMAPINFOHEADER), TIFF (TIFF 6.0 §2 IFD),
  * WebP (RFC 9649 VP8/VP8L/VP8X chunks).
  *
  * Reference analog: the reference has no media path at all; this is
  * part of the pipeline surface the survey adds beyond it.
  */
object ImageHeader {

  /** Parsed header: container format and pixel dimensions. */
  final case class Info(format: String, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = (u8(b, i + 1) << 8) | u8(b, i)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    (u8(b, i + 3) << 24) | (u8(b, i + 2) << 16) | (u8(b, i + 1) << 8) | u8(b, i)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Parse the header, or None when no supported signature matches or
    * the header is truncated/corrupt. Never throws on arbitrary bytes.
    */
  def parse(bytes: Array[Byte]): Option[Info] =
    if (bytes == null) None
    else png(bytes).orElse(gif(bytes)).orElse(bmp(bytes))
      .orElse(jpeg(bytes)).orElse(tiff(bytes)).orElse(webp(bytes))

  /** WebP: RIFF container ("RIFF" size "WEBP"), first chunk one of
    * (RFC 9649): VP8 lossy — frame tag(3) + start code 9D 01 2A +
    * width(2 LE, 14 bits) height(2 LE, 14 bits); VP8L lossless —
    * 0x2F byte then 14-bit width-1 / height-1 packed LE; VP8X
    * extended — flags(4) + 24-bit LE width-1 / height-1.
    */
  private def webp(b: Array[Byte]): Option[Info] = {
    if (b.length < 25) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'))
      return None
    val tag = new String(b, 12, 4, "US-ASCII")
    tag match {
      case "VP8 " =>
        // key-frame start code at payload offset 3
        if (b.length < 30 ||
            !(u8(b, 23) == 0x9d && u8(b, 24) == 0x01 && u8(b, 25) == 0x2a))
          return None
        val w = le16(b, 26) & 0x3fff
        val h = le16(b, 28) & 0x3fff
        if (w < 1 || h < 1) None else Some(Info("webp", w, h))
      case "VP8L" =>
        if (u8(b, 20) != 0x2f) return None
        val bits = le32(b, 21)
        val w = (bits & 0x3fff) + 1
        val h = ((bits >>> 14) & 0x3fff) + 1
        Some(Info("webp", w, h))
      case "VP8X" =>
        if (b.length < 30) return None
        val w = (u8(b, 24) | (u8(b, 25) << 8) | (u8(b, 26) << 16)) + 1
        val h = (u8(b, 27) | (u8(b, 28) << 8) | (u8(b, 29) << 16)) + 1
        Some(Info("webp", w, h))
      case _ => None
    }
  }

  /** PNG: 8-byte signature, then the IHDR chunk (always first, RFC 2083
    * §4.1.1): length(4) "IHDR"(4) width(4 BE) height(4 BE).
    */
  private def png(b: Array[Byte]): Option[Info] = {
    if (b.length < 24 || !b.startsWith(PngSig)) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    // spec: 4-byte unsigned, zero is invalid
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Info("png", w.toInt, h.toInt))
  }

  /** GIF87a/GIF89a: 6-byte signature, then the logical screen
    * descriptor: width(2 LE) height(2 LE).
    */
  private def gif(b: Array[Byte]): Option[Info] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w < 1 || h < 1) None else Some(Info("gif", w, h))
  }

  /** BMP: "BM", BITMAPINFOHEADER at offset 14: size(4) width(4 LE
    * signed) height(4 LE signed — negative means top-down rows; the
    * pixel extent is |height|).
    */
  private def bmp(b: Array[Byte]): Option[Info] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    val w = le32(b, 18)
    val h = math.abs(le32(b, 22))
    if (w < 1 || h < 1) None else Some(Info("bmp", w, h))
  }

  /** JPEG: FF D8, then a marker-segment walk to the first SOFn frame
    * header (ITU T.81 B.2.2): FF Cn len(2 BE) precision(1)
    * height(2 BE) width(2 BE). C4/C8/CC are not frame markers (DHT /
    * JPG-extension / DAC); standalone markers (D0-D9, 01) carry no
    * length field.
    */
  private def jpeg(b: Array[Byte]): Option[Info] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced: not a marker
      var m = u8(b, i + 1)
      // fill bytes: FF may be repeated before the marker code
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) }
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (i + 8 >= b.length) return None
        val h = be16(b, i + 5)
        val w = be16(b, i + 7)
        return if (w < 1 || h < 1) None else Some(Info("jpeg", w, h))
      } else if ((m >= 0xd0 && m <= 0xd9) || m == 0x01) {
        i += 2 // standalone marker, no payload
      } else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        i += 2 + len
      }
    }
    None
  }

  /** EXIF orientation (tag 274 of the EXIF IFD — CIPA DC-008 §4.6.4):
    * 1 = upright ... 6/8 = 90° rotations (width/height swap), read
    * from a JPEG APP1 "Exif\0\0" segment (a TIFF structure at the
    * payload) or a bare TIFF's first IFD. The one metadata field a
    * resize/thumbnail pipeline MUST consult before trusting the SOFn
    * dimensions. None when absent/corrupt; never throws.
    */
  def exifOrientation(bytes: Array[Byte]): Option[Int] = {
    if (bytes == null || bytes.length < 4) return None
    // bare TIFF: the orientation lives in the first IFD directly
    if ((bytes(0) == 'I' && bytes(1) == 'I') ||
      (bytes(0) == 'M' && bytes(1) == 'M'))
      return ifdTag(bytes, 0, 274)
    // JPEG: walk marker segments to APP1 "Exif\0\0"
    if (u8(bytes, 0) != 0xff || u8(bytes, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < bytes.length) {
      if (u8(bytes, i) != 0xff) return None
      var m = u8(bytes, i + 1)
      while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(bytes, i + 1) }
      if ((m >= 0xd0 && m <= 0xd9) || m == 0x01) i += 2
      else {
        val len = be16(bytes, i + 2)
        if (len < 2 || i + 2L + len > bytes.length) return None
        if (m == 0xe1 && len >= 8 + 6 &&
          bytes(i + 4) == 'E' && bytes(i + 5) == 'x' &&
          bytes(i + 6) == 'i' && bytes(i + 7) == 'f' &&
          bytes(i + 8) == 0 && bytes(i + 9) == 0)
          return ifdTag(bytes, i + 10, 274)
        if (m == 0xda) return None // SOS: entropy data, no APP1 follows
        i += 2 + len
      }
    }
    None
  }

  /** Read one inline SHORT/LONG tag from the first IFD of the TIFF
    * structure starting at `base`. Offsets inside the structure are
    * relative to `base` (EXIF-in-JPEG semantics).
    */
  private def ifdTag(b: Array[Byte], base: Int, wantTag: Int): Option[Int] = {
    if (base + 8 > b.length) return None
    val le =
      if (b(base) == 'I' && b(base + 1) == 'I' && u8(b, base + 2) == 42 &&
        u8(b, base + 3) == 0) true
      else if (b(base) == 'M' && b(base + 1) == 'M' &&
        u8(b, base + 2) == 0 && u8(b, base + 3) == 42) false
      else return None
    def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
    def u32(i: Int): Long =
      if (le) le32(b, i).toLong & 0xffffffffL else be32(b, i)
    val ifd = u32(base + 4)
    if (ifd < 8 || base + ifd + 2 > b.length) return None
    val at0 = base + ifd.toInt
    val n = u16(at0)
    var e = 0
    while (e < n) {
      val at = at0 + 2 + e * 12
      if (at + 12 > b.length) return None
      if (u16(at) == wantTag) {
        val vtype = u16(at + 2)
        return if (vtype == 3) Some(u16(at + 8))
        else if (vtype == 4) Some(u32(at + 8).toInt)
        else None
      }
      e += 1
    }
    None
  }

  /** TIFF (TIFF 6.0 §2): "II*\0" (little-endian) or "MM\0*"
    * (big-endian), IFD offset at byte 4; the first IFD's 12-byte
    * entries carry ImageWidth (tag 256) / ImageLength (tag 257) as
    * inline SHORT(3)/LONG(4) values.
    */
  private def tiff(b: Array[Byte]): Option[Info] = {
    if (b.length < 8) return None
    val le =
      if (b(0) == 'I' && b(1) == 'I' && u8(b, 2) == 42 && u8(b, 3) == 0)
        true
      else if (b(0) == 'M' && b(1) == 'M' && u8(b, 2) == 0 &&
        u8(b, 3) == 42) false
      else return None
    def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
    def u32(i: Int): Long =
      if (le) le32(b, i).toLong & 0xffffffffL else be32(b, i)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return None
    val n = u16(ifd.toInt)
    var w = 0L
    var h = 0L
    var e = 0
    while (e < n) {
      val at = ifd.toInt + 2 + e * 12
      if (at + 12 > b.length) return None
      val tag = u16(at)
      if (tag == 256 || tag == 257) {
        val vtype = u16(at + 2)
        val v: Long =
          if (vtype == 3) u16(at + 8).toLong // SHORT, left-justified
          else if (vtype == 4) u32(at + 8) // LONG
          else -1L
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(Info("tiff", w.toInt, h.toInt))
  }
}
