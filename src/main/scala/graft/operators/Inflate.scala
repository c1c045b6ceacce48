package graft.operators

/** From-the-spec DEFLATE decompression (RFC 1951) plus the gzip
  * member wrapper (RFC 1952) — the second engine for the single
  * most load-bearing codec in the stack: every WARC/WET gzip
  * member, TAR shard, and PNG IDAT stream rides on deflate, and
  * until now only the JDK engine read them. LSB-first bit reader,
  * stored blocks, the fixed literal/length and distance codes, and
  * dynamic blocks (the HCLEN-permuted code-length alphabet with
  * 16/17/18 repeat codes feeding canonical litlen/dist tables),
  * LZ77 back-references over the 32 KiB window with the spec's
  * length/distance extra-bit tables.
  *
  * Hostile-input contract: never throws; output bounded by the
  * caller's cap; any malformation (oversubscribed code, reference
  * before start, bad stored-block complement, truncation) yields
  * None.
  *
  * Reference analog: none — infrastructure beneath the crawl/media
  * surface the survey adds beyond the reference.
  */
object Inflate {

  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** LSB-first bit reader over the byte array (RFC 1951 §3.1.1). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) bail()
        cur = b(pos) & 0xff
        pos += 1
        nbits = 8
      }
      val v = cur & 1
      cur >>= 1
      nbits -= 1
      v
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= bit() << i; i += 1 }
      v
    }
    def align(): Unit = nbits = 0
  }

  /** Canonical Huffman decode table from code lengths (RFC 1951
    * §3.2.2): codes assigned by (length, symbol order); a table of
    * (firstCode, firstIndex, count) per length walks one bit at a
    * time.
    */
  private final class Huff(lengths: Array[Int]) {
    private val maxLen = 15
    private val count = new Array[Int](maxLen + 1)
    lengths.foreach { l => if (l < 0 || l > maxLen) bail()
      if (l > 0) count(l) += 1 }
    // an EMPTY table is legal at build time — RFC 1951 allows "one
    // distance code of zero bits" meaning no distance codes at all
    // (a literal-only block); read() bails if it is ever consulted
    private val firstCode = new Array[Int](maxLen + 2)
    private val firstSym = new Array[Int](maxLen + 1)
    private val syms = new Array[Int](count.sum)
    locally {
      var code = 0
      var si = 0
      var l = 1
      while (l <= maxLen) {
        firstCode(l) = code
        firstSym(l) = si
        var s = 0
        while (s < lengths.length) {
          if (lengths(s) == l) { syms(si) = s; si += 1 }
          s += 1
        }
        if (code + count(l) > (1 << l)) bail() // oversubscribed
        code = (code + count(l)) << 1
        l += 1
      }
    }
    def read(r: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code |= r.bit()
        val c = count(l)
        if (c > 0 && code >= firstCode(l) &&
          code < firstCode(l) + c)
          return syms(firstSym(l) + (code - firstCode(l)))
        code <<= 1
        l += 1
      }
      bail()
    }
  }

  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15,
    17, 19, 23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163,
    195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33,
    49, 65, 97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049,
    3073, 4097, 6145, 8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11,
    4, 12, 3, 13, 2, 14, 1, 15)

  private lazy val FixedLit: Huff = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9
        else if (i < 280) 7 else 8
      i += 1
    }
    new Huff(l)
  }
  private lazy val FixedDist: Huff = new Huff(Array.fill(30)(5))

  /** Inflate a raw deflate stream; None on malformation or when the
    * output would exceed `maxOut`. Never throws.
    */
  def inflate(b: Array[Byte],
      maxOut: Int = 1 << 28): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      inflateInto(b, 0, out, maxOut)
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Core loop; returns the byte position just past the final
    * block's last bit (the start of any trailing bytes).
    */
  private def inflateInto(b: Array[Byte], at: Int,
      out: java.io.ByteArrayOutputStream, maxOut: Int): Int = {
    if (b == null) bail()
    val r = new BitReader(b, at)
    // 32 KiB sliding window for back-references
    val win = new Array[Byte](1 << 15)
    var wpos = 0
    var total = 0
    def emit(v: Int): Unit = {
      if (total >= maxOut) bail()
      out.write(v)
      win(wpos) = v.toByte
      wpos = (wpos + 1) & 0x7fff
      total += 1
    }
    var fin = false
    while (!fin) {
      fin = r.bit() == 1
      r.bits(2) match {
        case 0 => // stored
          r.align()
          if (r.pos + 4 > b.length) bail()
          val len = ((b(r.pos) & 0xff)) | ((b(r.pos + 1) & 0xff) << 8)
          val nlen = ((b(r.pos + 2) & 0xff)) |
            ((b(r.pos + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) bail()
          if (r.pos + 4 + len > b.length) bail()
          var i = 0
          while (i < len) { emit(b(r.pos + 4 + i) & 0xff); i += 1 }
          r.pos += 4 + len
        case t if t == 1 || t == 2 =>
          val (lit, dist) =
            if (t == 1) (FixedLit, FixedDist)
            else { // dynamic
              val hlit = r.bits(5) + 257
              val hdist = r.bits(5) + 1
              val hclen = r.bits(4) + 4
              if (hlit > 286 || hdist > 30) bail()
              val clLens = new Array[Int](19)
              var i = 0
              while (i < hclen) {
                clLens(ClOrder(i)) = r.bits(3)
                i += 1
              }
              val clTab = new Huff(clLens)
              val lens = new Array[Int](hlit + hdist)
              var k = 0
              while (k < lens.length) {
                val s = clTab.read(r)
                if (s < 16) { lens(k) = s; k += 1 }
                else if (s == 16) {
                  if (k == 0) bail()
                  val rep = 3 + r.bits(2)
                  val v = lens(k - 1)
                  var j = 0
                  while (j < rep) {
                    if (k >= lens.length) bail()
                    lens(k) = v; k += 1; j += 1
                  }
                } else {
                  val rep =
                    if (s == 17) 3 + r.bits(3) else 11 + r.bits(7)
                  var j = 0
                  while (j < rep) {
                    if (k >= lens.length) bail()
                    lens(k) = 0; k += 1; j += 1
                  }
                }
              }
              (new Huff(lens.take(hlit)),
                new Huff(lens.drop(hlit)))
            }
          var open = true
          while (open) {
            val sym = lit.read(r)
            if (sym < 256) emit(sym)
            else if (sym == 256) open = false
            else {
              if (sym > 285) bail()
              val li = sym - 257
              val len = LenBase(li) + r.bits(LenExtra(li))
              val ds = dist.read(r)
              if (ds > 29) bail()
              val d = DistBase(ds) + r.bits(DistExtra(ds))
              if (d > total) bail() // reference before stream start
              var j = 0
              var src = (wpos - d) & 0x7fff
              while (j < len) {
                emit(win(src) & 0xff)
                src = (src + 1) & 0x7fff
                j += 1
              }
            }
          }
        case _ => bail() // reserved block type
      }
    }
    r.align()
    r.pos
  }

  /** RFC 1950: inflate a ZLIB-wrapped stream (the PNG IDAT
    * envelope) — CMF/FLG header check (deflate method, window
    * <= 32K, header checksum, no preset dictionary) and the
    * Adler-32 trailer VERIFIED. None on any malformation.
    */
  def zlib(b: Array[Byte],
      maxOut: Int = 1 << 28): Option[Array[Byte]] =
    try {
      if (b == null || b.length < 6) bail()
      val cmf = b(0) & 0xff
      val flg = b(1) & 0xff
      if ((cmf & 0x0f) != 8 || (cmf >> 4) > 7) bail()
      if ((cmf * 256 + flg) % 31 != 0) bail()
      if ((flg & 0x20) != 0) bail() // preset dictionary: not in PNG
      val out = new java.io.ByteArrayOutputStream()
      val end = inflateInto(b, 2, out, maxOut)
      if (end + 4 > b.length) bail()
      val data = out.toByteArray
      var a = 1L
      var s2 = 0L
      var i = 0
      while (i < data.length) {
        a = (a + (data(i) & 0xff)) % 65521
        s2 = (s2 + a) % 65521
        i += 1
      }
      val want = ((b(end) & 0xffL) << 24) | ((b(end + 1) & 0xffL) << 16) |
        ((b(end + 2) & 0xffL) << 8) | (b(end + 3) & 0xffL)
      if (((s2 << 16) | a) != want) bail()
      Some(data)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RFC 1952: inflate one-or-more concatenated gzip MEMBERS (the
    * WARC/WET member-per-record layout) with the header walk (FLG
    * bits: FEXTRA/FNAME/FCOMMENT/FHCRC) and the CRC32 + ISIZE
    * trailer VERIFIED per member. None on any malformation.
    */
  def gunzip(b: Array[Byte],
      maxOut: Int = 1 << 28): Option[Array[Byte]] =
    try {
      if (b == null || b.length < 18) bail()
      val out = new java.io.ByteArrayOutputStream()
      var pos = 0
      while (pos < b.length) {
        if ((b(pos) & 0xff) != 0x1f || (b(pos + 1) & 0xff) != 0x8b ||
          (b(pos + 2) & 0xff) != 8) bail()
        val flg = b(pos + 3) & 0xff
        var p = pos + 10
        if ((flg & 4) != 0) { // FEXTRA
          val xlen = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
          p += 2 + xlen
        }
        if ((flg & 8) != 0) { while (b(p) != 0) p += 1; p += 1 }
        if ((flg & 16) != 0) { while (b(p) != 0) p += 1; p += 1 }
        if ((flg & 2) != 0) p += 2 // FHCRC (not verified)
        val memberOut = new java.io.ByteArrayOutputStream()
        val end = inflateInto(b, p, memberOut, maxOut - out.size)
        val data = memberOut.toByteArray
        if (end + 8 > b.length) bail()
        def le32(q: Int): Long =
          ((b(q) & 0xffL)) | ((b(q + 1) & 0xffL) << 8) |
            ((b(q + 2) & 0xffL) << 16) | ((b(q + 3) & 0xffL) << 24)
        val crc = new java.util.zip.CRC32()
        crc.update(data)
        if (crc.getValue != le32(end)) bail()
        if ((data.length & 0xffffffffL) != le32(end + 4)) bail()
        out.write(data)
        pos = end + 8
      }
      Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
}
