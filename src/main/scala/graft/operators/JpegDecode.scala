package graft.operators

/** Pure-JVM JPEG (ITU-T T.81 Huffman DCT) decode — the second engine
  * for the one decodable image format that was ImageIO-only
  * (PNG/GIF/BMP/WebP-lossless already have from-the-spec twins):
  * marker walk (DQT/DHT/DRI/SOF0/SOF2/SOS), the BITS/HUFFVAL
  * canonical Huffman build, MSB-first entropy reading with 0xFF00
  * byte-unstuffing and restart markers, DC prediction + the
  * sign-extension rule, AC run-length (ZRL/EOB), dequantize +
  * de-zigzag, a separable double-precision IDCT, chroma upsampling
  * for 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 sampling, and the BT.601
  * YCbCr -> RGB transform. Covers BASELINE sequential (SOF0) frames
  * and PROGRESSIVE (SOF2, T.81 Annex G) frames — multi-scan spectral
  * selection + successive approximation: interleaved/single DC first
  * and refinement scans, non-interleaved AC first scans with EOB
  * runs, and the G.1.2.3 AC correction-bit refinement — grayscale
  * (1 component) and YCbCr (3); arithmetic/lossless/12-bit frames
  * return None honestly.
  *
  * Exactness contract: the DCT stage is float, so two conforming
  * decoders may differ by ±1 per sample (T.81 Annex A tolerances) —
  * the spec cross-checks against ImageIO within that bound, and the
  * Huffman/marker/prediction machinery is pinned EXACTLY by
  * [[decodeQuantized]] (decoded quantized coefficients must equal the
  * encoder's, bit for bit, for baseline AND progressive scripts).
  * DC-ONLY blocks decode integer-exactly in any conforming decoder
  * (a flat block is q*c/8 + 128 in every IDCT), which is what the
  * oracle query plants.
  *
  * [[encodeJpeg]] writes real baseline JPEG bytes with the same
  * canonical-code machinery (flat per-image Huffman tables with a
  * phantom symbol so the all-ones code stays unassigned, flat
  * quantization tables, optional 4:2:0/4:2:2 subsampling and restart
  * intervals) — ImageIO reads them, which proves the bitstream, and
  * roundtrip specs prove the decoder against it. [[encodeProgressive]]
  * writes real SOF2 streams (a libjpeg-style scan script: DC first at
  * Al=1, per-component AC bands at Al=1, AC refinement to Al=0, DC
  * refinement; per-scan flat Huffman tables, EOB-run folding, the
  * G.1.2.3 correction-bit buffering) under the same exactness pins.
  *
  * Hostile-input contract: never throws; decode bombs bounded by
  * [[MaxPixels]].
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object JpegDecode {

  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  /** Decode-bomb guard shared with PixelDecode. */
  private val MaxPixels = 1L << 26

  /** Natural (row-major) position of each zigzag-scan index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // ------------------------------------------------------------------
  // canonical Huffman (the T.81 BITS/HUFFVAL construction)
  // ------------------------------------------------------------------

  /** Bit-at-a-time walk against a (len, code) -> symbol map — codes
    * assigned in HUFFVAL order, sequentially per length, doubled
    * between lengths (T.81 Annex C).
    */
  private final class Huff(
      table: java.util.HashMap[Integer, Integer]) {
    def read(r: BitReader): Int = {
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

  private def buildHuff(counts: Array[Int], vals: Array[Int]): Huff = {
    val table = new java.util.HashMap[Integer, Integer]()
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < counts(len - 1)) {
        if (k >= vals.length || code >= (1 << len)) bail()
        table.put((len << 16) | code, vals(k))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      len += 1
    }
    new Huff(table)
  }

  // ------------------------------------------------------------------
  // MSB-first entropy reader with 0xFF00 unstuffing
  // ------------------------------------------------------------------

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) bail()
        val byt = b(pos) & 0xff
        pos += 1
        if (byt == 0xff) {
          if (pos >= b.length) bail()
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed data byte
          else bail() // a real marker inside entropy data
        }
        cur = byt
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Drop to the next byte boundary (restart alignment). */
    def align(): Unit = nbits = 0
    /** Consume an expected RSTn marker at a restart boundary. */
    def expectRst(n: Int): Unit = {
      align()
      if (pos + 1 >= b.length) bail()
      if ((b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != (0xd0 + n)) bail()
      pos += 2
    }
  }

  /** The T.81 sign-extension rule: an s-bit magnitude v maps to
    * v when its top bit is set, v - 2^s + 1 otherwise.
    */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0
    else if (v < (1 << (s - 1))) v - (1 << s) + 1
    else v

  // ------------------------------------------------------------------
  // IDCT (separable, double) — shared 1D kernel with the forward side
  // ------------------------------------------------------------------

  /** cosTab(u)(x) = c(u) * cos((2x+1) u pi / 16) / 2, the 1D basis. */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) =>
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      cu * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
  }

  /** In-place-free 8x8 IDCT: coefficients (natural order) -> spatial
    * samples, unshifted (caller adds the +128 level shift).
    */
  private def idct(coef: Array[Int]): Array[Double] = {
    // rows then columns
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(u)(x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += CosTab(v)(yy) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = s
        yy += 1
      }
      x += 1
    }
    out
  }

  /** Forward 8x8 DCT (level-shifted samples -> coefficients). */
  private def fdct(samples: Array[Double]): Array[Double] = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += CosTab(u)(x) * samples(y * 8 + x); x += 1 }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += CosTab(v)(yy) * tmp(yy * 8 + u); yy += 1 }
        out(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
    out
  }

  // ------------------------------------------------------------------
  // frame state
  // ------------------------------------------------------------------

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  private final class Frame {
    var w = 0
    var h = 0
    var progressive = false
    var comps: Array[Component] = Array.empty
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var restartInterval = 0
  }

  /** Progressive coefficient store: one zigzag-ordered 64-int slot
    * per block of each component's MCU-padded grid, accumulated
    * across scans (T.81 G.2 requires a full-image buffer — the
    * format interleaves frequency bands, not rows). `nibW`/`nibH`
    * are the component's OWN block grid (ceil of its sample dims /
    * 8), the coverage of non-interleaved scans per A.2.2.
    */
  private final class ProgState(f: Frame) {
    val hmax: Int = f.comps.map(_.h).max
    val vmax: Int = f.comps.map(_.v).max
    val mcusX: Int = (f.w + 8 * hmax - 1) / (8 * hmax)
    val mcusY: Int = (f.h + 8 * vmax - 1) / (8 * vmax)
    if (mcusX.toLong * mcusY * hmax * vmax * 64 > 4 * MaxPixels) bail()
    val bw: Array[Int] = f.comps.map(c => mcusX * c.h)
    val bh: Array[Int] = f.comps.map(c => mcusY * c.v)
    val nibW: Array[Int] = f.comps.map(c =>
      ((f.w * c.h + hmax - 1) / hmax + 7) / 8)
    val nibH: Array[Int] = f.comps.map(c =>
      ((f.h * c.v + vmax - 1) / vmax + 7) / 8)
    val coefs: Array[Array[Int]] = f.comps.indices.map(i =>
      new Array[Int](bw(i) * bh(i) * 64)).toArray
  }

  // ------------------------------------------------------------------
  // decode
  // ------------------------------------------------------------------

  /** Decode baseline or progressive JPEG bytes to pixels; None for
    * anything this engine does not cover (arithmetic, lossless,
    * 12-bit, >3 components, malformation). Never throws.
    */
  def decode(bytes: Array[Byte]): Option[PixelDecode.Pixels] =
    try Some(decodeOrBail(bytes, keepCoefficients = false)._1)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Spec hook: the decoded QUANTIZED coefficient blocks, keyed by
    * (component index, block row, block col) in the component's own
    * sampling grid — pins Huffman/prediction/zigzag/restart machinery
    * bit-exactly, independent of the float IDCT. None on any decode
    * failure.
    */
  private[operators] def decodeQuantized(
      bytes: Array[Byte]): Option[Map[(Int, Int, Int), Array[Int]]] =
    try Some(decodeOrBail(bytes, keepCoefficients = true)._2)
    catch { case scala.util.control.NonFatal(_) => None }

  // keepCoefficients materializes the per-block quantized map (the
  // spec hook) — off on the production decode path, where it would
  // cost real memory on large images
  private def decodeOrBail(b: Array[Byte], keepCoefficients: Boolean)
      : (PixelDecode.Pixels, Map[(Int, Int, Int), Array[Int]]) = {
    if (b == null || b.length < 4) bail()
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) bail() // SOI
    val f = new Frame
    var prog: ProgState = null
    var scans = 0
    var pos = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (pos + 2 > b.length) bail()
      if ((b(pos) & 0xff) != 0xff) bail()
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd9) { // EOI — the progressive end of frame
        if (!f.progressive || prog == null) bail()
        return reconstructProgressive(f, prog, keepCoefficients)
      }
      if (pos + 4 > b.length) bail()
      val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      if (len < 2 || pos + 2 + len > b.length) bail()
      val seg = pos + 4
      val segEnd = pos + 2 + len
      var nextPos = segEnd
      marker match {
        case 0xc0 | 0xc2 => // SOF0 baseline / SOF2 progressive
          if (f.comps.nonEmpty) bail() // one frame header per stream
          f.progressive = marker == 0xc2
          if (b(seg) != 8) bail() // precision
          f.h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
          f.w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
          val nc = b(seg + 5) & 0xff
          if (f.w < 1 || f.h < 1 ||
            f.w.toLong * f.h > MaxPixels) bail()
          if (nc != 1 && nc != 3) bail()
          f.comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + i * 3
            val hv = b(o + 1) & 0xff
            val c = Component(b(o) & 0xff, hv >> 4, hv & 15,
              b(o + 2) & 0xff)
            if (c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
              c.tq > 3) bail()
            c
          }
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
            0xcb | 0xcd | 0xce | 0xcf =>
          bail() // extended/lossless/arithmetic: not here
        case 0xdb => // DQT
          var o = seg
          while (o < segEnd) {
            val pq = (b(o) & 0xff) >> 4
            val tq = b(o) & 15
            if (tq > 3 || pq > 1) bail()
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(i) =
                if (pq == 0) b(o + 1 + i) & 0xff
                else ((b(o + 1 + 2 * i) & 0xff) << 8) |
                  (b(o + 2 + 2 * i) & 0xff)
              i += 1
            }
            f.quant(tq) = t
            o += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xc4 => // DHT
          var o = seg
          while (o < segEnd) {
            val tc = (b(o) & 0xff) >> 4
            val th = b(o) & 15
            if (tc > 1 || th > 3) bail()
            val counts = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
            val n = counts.sum
            if (o + 17 + n > segEnd) bail()
            val vals = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
            val huff = buildHuff(counts, vals)
            if (tc == 0) f.dcTabs(th) = huff else f.acTabs(th) = huff
            o += 17 + n
          }
        case 0xdd => // DRI
          f.restartInterval =
            ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
        case 0xda => // SOS
          if (f.comps.isEmpty) bail()
          if (f.progressive) {
            if (prog == null) prog = new ProgState(f)
            // decode-bomb cap: a legal script never needs more than
            // ~14 bit-planes x 64 coefficients x 3 components
            scans += 1
            if (scans > 3072) bail()
            nextPos = progScan(b, seg, segEnd, f, prog)
          } else {
            val ns = b(seg) & 0xff
            if (ns != f.comps.length) bail()
            var i = 0
            while (i < ns) {
              val cs = b(seg + 1 + 2 * i) & 0xff
              val c = f.comps.find(_.id == cs).getOrElse(bail())
              val tt = b(seg + 2 + 2 * i) & 0xff
              c.td = tt >> 4
              c.ta = tt & 15
              i += 1
            }
            sosAt = segEnd
          }
        case m if m >= 0xe0 && m <= 0xef => () // APPn
        case 0xfe => () // COM
        case _ => () // other tables/segments: skip by length
      }
      pos = nextPos
    }
    decodeScan(b, sosAt, f, keepCoefficients)
  }

  // ------------------------------------------------------------------
  // progressive scans (T.81 Annex G)
  // ------------------------------------------------------------------

  /** Decode one progressive scan (header at `seg`, entropy data from
    * `segEnd`) into the coefficient store; returns the position of
    * the next marker after the entropy segment.
    */
  private def progScan(b: Array[Byte], seg: Int, segEnd: Int,
      f: Frame, st: ProgState): Int = {
    val ns = b(seg) & 0xff
    if (ns < 1 || ns > f.comps.length ||
      seg + 4 + 2 * ns > segEnd) bail()
    val scanCis = new Array[Int](ns)
    var i = 0
    while (i < ns) {
      val cs = b(seg + 1 + 2 * i) & 0xff
      val ci = f.comps.indexWhere(_.id == cs)
      if (ci < 0) bail()
      val tt = b(seg + 2 + 2 * i) & 0xff
      f.comps(ci).td = tt >> 4
      f.comps(ci).ta = tt & 15
      scanCis(i) = ci
      i += 1
    }
    val ss = b(seg + 1 + 2 * ns) & 0xff
    val se = b(seg + 2 + 2 * ns) & 0xff
    val ahal = b(seg + 3 + 2 * ns) & 0xff
    val ah = ahal >> 4
    val al = ahal & 15
    // scan-header legality per G.1.1.1.1
    if (se > 63 || se < ss || al > 13 || ah > 13) bail()
    if (ss == 0 && se != 0) bail() // a DC scan is exactly [0, 0]
    if (ss > 0 && ns != 1) bail() // AC scans are non-interleaved
    if (ah != 0 && ah != al + 1) bail() // one bit per refinement
    val r = new BitReader(b, segEnd)
    if (ss == 0) dcScan(r, f, st, scanCis, ah, al)
    else acScan(r, f, st, scanCis(0), ss, se, ah, al)
    r.align()
    // skip pad bytes to the next true marker (not stuffing, not RST)
    var p = r.pos
    while (p + 1 < b.length && !((b(p) & 0xff) == 0xff && {
      val m = b(p + 1) & 0xff
      m != 0x00 && (m < 0xd0 || m > 0xd7)
    })) p += 1
    if (p + 1 >= b.length) bail()
    p
  }

  /** DC scan: first pass (Ah=0) decodes Huffman-coded diffs of the
    * point-transformed DC (stored << Al); refinement (Ah>0) appends
    * one raw bit per block at position Al (G.1.2.1).
    */
  private def dcScan(r: BitReader, f: Frame, st: ProgState,
      scanCis: Array[Int], ah: Int, al: Int): Unit = {
    val pred = new Array[Int](f.comps.length)
    var rstIdx = 0
    var sinceRst = 0
    def maybeRestart(): Unit =
      if (f.restartInterval > 0 && sinceRst == f.restartInterval) {
        r.expectRst(rstIdx % 8)
        rstIdx += 1
        java.util.Arrays.fill(pred, 0)
        sinceRst = 0
      }
    def block(ci: Int, by: Int, bx: Int): Unit = {
      val off = (by * st.bw(ci) + bx) * 64
      if (ah == 0) {
        val tab = f.dcTabs(f.comps(ci).td)
        if (tab == null) bail()
        val s = tab.read(r)
        if (s > 11) bail()
        pred(ci) += extend(r.readBits(s), s)
        st.coefs(ci)(off) = pred(ci) << al
      } else if (r.readBit() == 1) st.coefs(ci)(off) |= 1 << al
    }
    if (scanCis.length > 1) { // interleaved: the MCU walk
      val n = st.mcusX * st.mcusY
      var mcu = 0
      while (mcu < n) {
        maybeRestart()
        val my = mcu / st.mcusX
        val mx = mcu % st.mcusX
        var k = 0
        while (k < scanCis.length) {
          val ci = scanCis(k)
          val c = f.comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              block(ci, my * c.v + by, mx * c.h + bx)
              bx += 1
            }
            by += 1
          }
          k += 1
        }
        sinceRst += 1
        mcu += 1
      }
    } else { // single component: raster over its own grid (A.2.2)
      val ci = scanCis(0)
      val n = st.nibW(ci) * st.nibH(ci)
      var u = 0
      while (u < n) {
        maybeRestart()
        block(ci, u / st.nibW(ci), u % st.nibW(ci))
        sinceRst += 1
        u += 1
      }
    }
  }

  /** AC scan over one component's own block grid: first pass
    * (G.1.2.2, EOB runs) or correction-bit refinement (G.1.2.3).
    */
  private def acScan(r: BitReader, f: Frame, st: ProgState, ci: Int,
      ss: Int, se: Int, ah: Int, al: Int): Unit = {
    val tab = f.acTabs(f.comps(ci).ta)
    if (tab == null) bail()
    val zz = st.coefs(ci)
    val w = st.nibW(ci)
    val n = w * st.nibH(ci)
    var eobrun = 0
    var rstIdx = 0
    var sinceRst = 0
    var u = 0
    while (u < n) {
      if (f.restartInterval > 0 && sinceRst == f.restartInterval) {
        r.expectRst(rstIdx % 8)
        rstIdx += 1
        eobrun = 0
        sinceRst = 0
      }
      val off = ((u / w) * st.bw(ci) + (u % w)) * 64
      eobrun =
        if (ah == 0) acFirstBlock(r, tab, zz, off, ss, se, al, eobrun)
        else acRefineBlock(r, tab, zz, off, ss, se, al, eobrun)
      sinceRst += 1
      u += 1
    }
  }

  /** One block of an AC first scan (G.1.2.2): run-length symbols as
    * in baseline, coefficients stored << Al, EOBn symbols starting a
    * run of (1 << n) + n-extra-bits end-of-band blocks. Returns the
    * EOB run remaining for FOLLOWING blocks.
    */
  private def acFirstBlock(r: BitReader, tab: Huff, zz: Array[Int],
      off: Int, ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    if (eobrun0 > 0) return eobrun0 - 1
    var k = ss
    while (k <= se) {
      val rs = tab.read(r)
      val run = rs >> 4
      val size = rs & 15
      if (size == 0) {
        if (run == 15) k += 16 // ZRL
        else return (1 << run) - 1 +
          (if (run > 0) r.readBits(run) else 0) // EOBn
      } else {
        k += run
        if (k > se) bail()
        zz(off + k) = extend(r.readBits(size), size) << al
        k += 1
      }
    }
    0
  }

  /** One block of an AC refinement scan — the G.1.2.3 algorithm:
    * every nonzero-history coefficient crossed carries a correction
    * bit; (run, 1) symbols place a newly-significant ±(1 << Al) after
    * `run` zero-history positions; ZRL skips 16 zero-history
    * positions; EOBn refines the rest of the band in this and the
    * following (run count) blocks. Returns the remaining EOB run.
    */
  private def acRefineBlock(r: BitReader, tab: Huff, zz: Array[Int],
      off: Int, ss: Int, se: Int, al: Int, eobrun0: Int): Int = {
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = eobrun0
    var k = ss
    def refineBit(idx: Int): Unit =
      if (r.readBit() == 1 && (zz(idx) & p1) == 0)
        zz(idx) += (if (zz(idx) >= 0) p1 else m1)
    if (eobrun == 0) {
      var open = true
      while (open && k <= se) {
        val rs = tab.read(r)
        var run = rs >> 4
        val size = rs & 15
        var newVal = 0
        if (size == 0) {
          if (run < 15) { // EOBn: this block joins the run
            eobrun = (1 << run) +
              (if (run > 0) r.readBits(run) else 0)
            open = false
          } // run == 15 (ZRL): skip 16 zero-history positions below
        } else {
          if (size != 1) bail() // refinement codes only carry s = 1
          newVal = if (r.readBit() == 1) p1 else m1
        }
        if (open) {
          var placing = true
          while (placing && k <= se) {
            if (zz(off + k) != 0) refineBit(off + k)
            else if (run == 0) {
              if (newVal != 0) zz(off + k) = newVal
              placing = false
            } else run -= 1
            k += 1
          }
          if (placing && newVal != 0) bail() // fell past Se unplaced
        }
      }
    }
    if (eobrun > 0) {
      while (k <= se) { // end-of-band: refinement bits only
        if (zz(off + k) != 0) refineBit(off + k)
        k += 1
      }
      eobrun - 1
    } else 0
  }

  /** After EOI: dequantize + IDCT every block of the accumulated
    * coefficient store and hand the planes to the shared
    * upsample/color pipeline.
    */
  private def reconstructProgressive(f: Frame, st: ProgState,
      keepCoefficients: Boolean)
      : (PixelDecode.Pixels, Map[(Int, Int, Int), Array[Int]]) = {
    val planeW = f.comps.indices.map(i => st.bw(i) * 8).toArray
    val planes = f.comps.indices.map(i =>
      new Array[Int](st.bw(i) * 8 * st.bh(i) * 8)).toArray
    val quantized =
      scala.collection.mutable.Map[(Int, Int, Int), Array[Int]]()
    var ci = 0
    while (ci < f.comps.length) {
      val q = f.quant(f.comps(ci).tq)
      if (q == null) bail()
      val pw = planeW(ci)
      var by = 0
      while (by < st.bh(ci)) {
        var bx = 0
        while (bx < st.bw(ci)) {
          val off = (by * st.bw(ci) + bx) * 64
          val zz = java.util.Arrays.copyOfRange(
            st.coefs(ci), off, off + 64)
          if (keepCoefficients) quantized((ci, by, bx)) = zz
          val coef = new Array[Int](64)
          var i = 0
          while (i < 64) { coef(Zigzag(i)) = zz(i) * q(i); i += 1 }
          val px = idct(coef)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val v = math.round(px(yy * 8 + xx)).toInt + 128
              planes(ci)((by * 8 + yy) * pw + (bx * 8 + xx)) =
                if (v < 0) 0 else if (v > 255) 255 else v
              xx += 1
            }
            yy += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    (assemble(f, planes, planeW, st.hmax, st.vmax), quantized.toMap)
  }

  private def decodeScan(b: Array[Byte], at: Int, f: Frame,
      keepCoefficients: Boolean)
      : (PixelDecode.Pixels, Map[(Int, Int, Int), Array[Int]]) = {
    // a single-component scan is NON-INTERLEAVED (T.81 A.2.2): one
    // data unit per MCU in raster order over the component's own
    // grid — declared sampling factors do not cluster blocks
    if (f.comps.length == 1) {
      val c0 = f.comps(0)
      val c1 = c0.copy(h = 1, v = 1)
      c1.td = c0.td
      c1.ta = c0.ta
      f.comps = Array(c1)
    }
    val hmax = f.comps.map(_.h).max
    val vmax = f.comps.map(_.v).max
    val mcusX = (f.w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (f.h + 8 * vmax - 1) / (8 * vmax)
    if (mcusX.toLong * mcusY * hmax * vmax * 64 > 4 * MaxPixels) bail()
    // per-component planes at their own sampled resolution
    val planeW = f.comps.map(c => mcusX * c.h * 8)
    val planeH = f.comps.map(c => mcusY * c.v * 8)
    val planes = f.comps.indices.map(i =>
      new Array[Int](planeW(i) * planeH(i))).toArray
    val quantized =
      scala.collection.mutable.Map[(Int, Int, Int), Array[Int]]()
    val r = new BitReader(b, at)
    val dcPred = new Array[Int](f.comps.length)
    var rstIdx = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (f.restartInterval > 0 && mcu > 0 &&
        mcu % f.restartInterval == 0) {
        r.expectRst(rstIdx % 8)
        rstIdx += 1
        java.util.Arrays.fill(dcPred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < f.comps.length) {
        val c = f.comps(ci)
        val dcTab = f.dcTabs(c.td)
        val acTab = f.acTabs(c.ta)
        val q = f.quant(c.tq)
        if (dcTab == null || acTab == null || q == null) bail()
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            val zz = new Array[Int](64) // quantized, zigzag order
            val s = dcTab.read(r)
            if (s > 11) bail()
            dcPred(ci) += extend(r.readBits(s), s)
            zz(0) = dcPred(ci)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = acTab.read(r)
              val run = rs >> 4
              val size = rs & 15
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else open = false // EOB
              } else {
                k += run
                if (k > 63) bail()
                zz(k) = extend(r.readBits(size), size)
                k += 1
              }
            }
            if (keepCoefficients)
              quantized((ci, my * c.v + by, mx * c.h + bx)) = zz
            // dequantize + de-zigzag + IDCT + level shift
            val coef = new Array[Int](64)
            var i = 0
            while (i < 64) { coef(Zigzag(i)) = zz(i) * q(i); i += 1 }
            val px = idct(coef)
            val pw = planeW(ci)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(px(yy * 8 + xx)).toInt + 128
                planes(ci)((oy + yy) * pw + (ox + xx)) =
                  if (v < 0) 0 else if (v > 255) 255 else v
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    (assemble(f, planes, planeW, hmax, vmax), quantized.toMap)
  }

  /** Upsample the component planes to full resolution and apply the
    * BT.601 color transform — shared by the baseline and progressive
    * paths.
    */
  private def assemble(f: Frame, planes: Array[Array[Int]],
      planeW: Array[Int], hmax: Int, vmax: Int): PixelDecode.Pixels = {
    val out = new Array[Int](f.w * f.h)
    if (f.comps.length == 1) {
      val pw = planeW(0)
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val g = planes(0)(y * pw + x)
          out(y * f.w + x) = (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      val up = f.comps.indices.map { ci =>
        val c = f.comps(ci)
        upsample(planes(ci), planeW(ci),
          hmax / c.h, vmax / c.v,
          hmax % c.h == 0 && vmax % c.v == 0,
          c.h, c.v, hmax, vmax, f.w, f.h)
      }
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val i = y * f.w + x
          val yv = up(0)(i).toDouble
          val cb = up(1)(i) - 128.0
          val cr = up(2)(i) - 128.0
          def cl(d: Double): Int = {
            val v = math.round(d).toInt
            if (v < 0) 0 else if (v > 255) 255 else v
          }
          val rr = cl(yv + 1.402 * cr)
          val gg = cl(yv - 0.344136 * cb - 0.714136 * cr)
          val bb = cl(yv + 1.772 * cb)
          out(i) = (rr << 16) | (gg << 8) | bb
          x += 1
        }
        y += 1
      }
    }
    PixelDecode.Pixels(f.w, f.h, out)
  }

  /** Upsample one component plane to (w, h). Factors of exactly 2
    * use CENTERED TRIANGULAR interpolation (weights 3:1, edges
    * replicated — the "fancy" filter libjpeg-family decoders apply,
    * so the ImageIO cross-check stays within the ±1-per-stage
    * rounding envelope); factor 1 is a crop; anything else falls
    * back to nearest-neighbor (conforming — T.81 mandates no filter).
    */
  private def upsample(
      plane: Array[Int], pw: Int,
      hs: Int, vs: Int, exact: Boolean,
      ch: Int, cv: Int, hmax: Int, vmax: Int,
      w: Int, h: Int): Array[Int] = {
    if (!exact || (hs != 1 && hs != 2) || (vs != 1 && vs != 2)) {
      // irregular sampling ratio: nearest
      val o = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          o(y * w + x) = plane((y * cv / vmax) * pw + (x * ch / hmax))
          x += 1
        }
        y += 1
      }
      return o
    }
    val cw = (w + hs - 1) / hs // valid source region (sans padding)
    val chh = (h + vs - 1) / vs
    // vertical pass: source width, full height
    val ver =
      if (vs == 1) {
        val o = new Array[Int](cw * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < cw) { o(y * cw + x) = plane(y * pw + x); x += 1 }
          y += 1
        }
        o
      } else {
        val o = new Array[Int](cw * h)
        var y = 0
        while (y < h) {
          val i = y / 2
          val nb =
            if ((y & 1) == 0) math.max(i - 1, 0)
            else math.min(i + 1, chh - 1)
          var x = 0
          while (x < cw) {
            o(y * cw + x) =
              (3 * plane(i * pw + x) + plane(nb * pw + x) + 2) >> 2
            x += 1
          }
          y += 1
        }
        o
      }
    // horizontal pass: full width
    if (hs == 1) ver
    else {
      val o = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = x / 2
          val nb =
            if ((x & 1) == 0) math.max(i - 1, 0)
            else math.min(i + 1, cw - 1)
          o(y * w + x) =
            (3 * ver(y * cw + i) + ver(y * cw + nb) + 2) >> 2
          x += 1
        }
        y += 1
      }
      o
    }
  }

  // ------------------------------------------------------------------
  // encoder (real decodable baseline JPEG bytes)
  // ------------------------------------------------------------------

  private final class BitWriter(
      out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var nb = 0
    def writeBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1)
        nb += 1
        if (nb == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0
          nb = 0
        }
        k -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (the spec's fill). */
    def flush(): Unit =
      if (nb > 0) { writeBits((1 << (8 - nb)) - 1, 8 - nb) }
  }

  /** Magnitude category of a coefficient (T.81 Table F.1). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Flat canonical lengths over the used symbols PLUS a phantom so
    * the all-ones code stays unassigned (encoders must not emit it —
    * T.81 reserves it from the code space real tables use). Returns
    * (counts per length 1..16, HUFFVAL in code order, symbol ->
    * (code, len)).
    */
  private def buildFlatTable(used: Seq[Int])
      : (Array[Int], Array[Int], Map[Int, (Int, Int)]) = {
    val n = used.length + 1 // + phantom
    var k = 1
    while ((1 << k) < n) k += 1
    val shorter = (1 << k) - n
    // earlier symbols get length k-1 (if any), the rest length k;
    // the phantom is LAST, so it owns the final (all-ones) code
    val lens = used.zipWithIndex.map { case (s, i) =>
      s -> (if (i < shorter) math.max(k - 1, 1) else k)
    }
    val counts = new Array[Int](16)
    lens.foreach { case (_, l) => counts(l - 1) += 1 }
    // canonical assignment in (length, listed-order)
    val ordered = lens.sortBy(_._2)
    val codes = scala.collection.mutable.Map[Int, (Int, Int)]()
    var code = 0
    var len = 1
    val huffval = new scala.collection.mutable.ArrayBuffer[Int]()
    var idx = 0
    while (idx < ordered.length) {
      val (sym, l) = ordered(idx)
      while (len < l) { code <<= 1; len += 1 }
      codes(sym) = (code, l)
      huffval += sym
      code += 1
      idx += 1
    }
    (counts, huffval.toArray, codes.toMap)
  }

  /** Encode RGB pixels as real baseline JPEG: flat quantization
    * (every entry = `lumaQ` / `chromaQ`), per-image flat Huffman
    * tables, `subsample` in {"444", "422", "440", "420"}, optional
    * restart interval, `gray = true` for a single-component frame.
    * decode() inverts the entropy layer exactly
    * ([[decodeQuantized]]); pixels are IDCT-tolerance-exact.
    */
  def encodeJpeg(
      w: Int, h: Int, rgb: Array[Int],
      lumaQ: Int = 8, chromaQ: Int = 12,
      subsample: String = "444",
      restartInterval: Int = 0,
      gray: Boolean = false): Array[Byte] =
    encodeJpegFull(w, h, rgb, lumaQ, chromaQ, subsample,
      restartInterval, gray)._1

  /** Spec hook: the bytes plus the encoder's quantized blocks, keyed
    * like [[decodeQuantized]] — decode(encode(x)) must reproduce
    * them bit for bit (the entropy-layer exactness pin).
    */
  /** Shared encoder front half: color transform, chroma subsample,
    * FDCT, flat quantization — everything up to the per-mode entropy
    * coding. `ch`/`cv` are the luma sampling factors; chroma is
    * always (1, 1).
    */
  private final class EncPlan(
      val w: Int, val h: Int, val ch: Int, val cv: Int,
      val gray: Boolean, val mcusX: Int, val mcusY: Int,
      val yBlocks: Array[Array[Int]],
      val cbBlocks: Array[Array[Int]],
      val crBlocks: Array[Array[Int]]) {
    /** Blocks of component ci (zigzag quantized, padded grid). */
    def blocks(ci: Int): Array[Array[Int]] =
      if (ci == 0) yBlocks else if (ci == 1) cbBlocks else crBlocks
    def gridW(ci: Int): Int = if (ci == 0) mcusX * ch else mcusX
    def gridH(ci: Int): Int = if (ci == 0) mcusY * cv else mcusY
    /** The component's own (non-interleaved) block grid. */
    def nibW(ci: Int): Int =
      if (ci == 0) (w + 7) / 8 else (((w + ch - 1) / ch) + 7) / 8
    def nibH(ci: Int): Int =
      if (ci == 0) (h + 7) / 8 else (((h + cv - 1) / cv) + 7) / 8
    def nComps: Int = if (gray) 1 else 3
    /** The spec-hook coefficient map over the padded grids. */
    def coefMap(zeroPadAc: Boolean)
        : Map[(Int, Int, Int), Array[Int]] = {
      val m = scala.collection.mutable.Map[(Int, Int, Int),
        Array[Int]]()
      var ci = 0
      while (ci < nComps) {
        val bw = gridW(ci)
        blocks(ci).zipWithIndex.foreach { case (zz, bi) =>
          val by = bi / bw
          val bx = bi % bw
          // progressive AC scans never cover padding blocks beyond
          // the component's own grid: their ACs stay zero on the wire
          val out =
            if (zeroPadAc && (bx >= nibW(ci) || by >= nibH(ci))) {
              val z = new Array[Int](64)
              z(0) = zz(0)
              z
            } else zz
          m((ci, by, bx)) = out
        }
        ci += 1
      }
      m.toMap
    }
  }

  private def prepareBlocks(
      w: Int, h: Int, rgb: Array[Int],
      lumaQ: Int, chromaQ: Int,
      subsample: String,
      gray: Boolean): EncPlan = {
    require(w >= 1 && h >= 1 && rgb.length == w * h, s"dims $w x $h")
    require(lumaQ >= 2 && lumaQ <= 255 && chromaQ >= 2 &&
      chromaQ <= 255,
      "flat quant in [2, 255]: q >= 2 keeps every AC category <= 10" +
        " (the baseline bound)")
    // a single-component scan is NON-INTERLEAVED per T.81 (one data
    // unit per MCU, raster block order, no sampling clusters): gray
    // frames ignore the subsample request
    val (ch, cv) =
      if (gray) (1, 1)
      else subsample match {
        case "444" => (1, 1)
        case "422" => (2, 1)
        case "440" => (1, 2)
        case "420" => (2, 2)
        case s => throw new IllegalArgumentException(s"subsample: $s")
      }
    // color transform (BT.601, rounded to ints)
    val n = w * h
    val yP = new Array[Int](n)
    val cbP = new Array[Int](n)
    val crP = new Array[Int](n)
    var i = 0
    while (i < n) {
      val p = rgb(i)
      val r = (p >> 16) & 0xff
      val g = (p >> 8) & 0xff
      val b = p & 0xff
      def cl(d: Double): Int = {
        val v = math.round(d).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      yP(i) = cl(0.299 * r + 0.587 * g + 0.114 * b)
      cbP(i) = cl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
      crP(i) = cl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
      i += 1
    }
    // chroma subsample (box average over the ch x cv cell)
    val cw = (w + ch - 1) / ch
    val chh = (h + cv - 1) / cv
    def shrink(p: Array[Int]): Array[Int] = {
      val o = new Array[Int](cw * chh)
      var y = 0
      while (y < chh) {
        var x = 0
        while (x < cw) {
          var s = 0
          var c = 0
          var dy = 0
          while (dy < cv) {
            var dx = 0
            while (dx < ch) {
              val sx = x * ch + dx
              val sy = y * cv + dy
              if (sx < w && sy < h) { s += p(sy * w + sx); c += 1 }
              dx += 1
            }
            dy += 1
          }
          o(y * cw + x) = (s + c / 2) / c
          x += 1
        }
        y += 1
      }
      o
    }
    val (cbS, crS) =
      if (ch == 1 && cv == 1) (cbP, crP) else (shrink(cbP), shrink(crP))

    // pad each plane to its MCU-grid block multiple (edge replicate)
    // and cut into quantized blocks
    val mcusX = (w + 8 * ch - 1) / (8 * ch)
    val mcusY = (h + 8 * cv - 1) / (8 * cv)
    def blocksOf(p: Array[Int], pw0: Int, ph0: Int, bw: Int, bh: Int,
        q: Int): Array[Array[Int]] = {
      // bw x bh blocks across the padded grid, zigzag quantized
      val out = new Array[Array[Int]](bw * bh)
      var byi = 0
      while (byi < bh) {
        var bxi = 0
        while (bxi < bw) {
          val samples = new Array[Double](64)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              val sx = math.min(bxi * 8 + xx, pw0 - 1)
              val sy = math.min(byi * 8 + yy, ph0 - 1)
              samples(yy * 8 + xx) = p(sy * pw0 + sx) - 128.0
              xx += 1
            }
            yy += 1
          }
          val coef = fdct(samples)
          val zz = new Array[Int](64)
          var k = 0
          while (k < 64) {
            zz(k) = math.round(coef(Zigzag(k)) / q).toInt
            k += 1
          }
          out(byi * bw + bxi) = zz
          bxi += 1
        }
        byi += 1
      }
      out
    }
    val yBlocks = blocksOf(yP, w, h, mcusX * ch, mcusY * cv, lumaQ)
    val cbBlocks =
      if (gray) null else blocksOf(cbS, cw, chh, mcusX, mcusY, chromaQ)
    val crBlocks =
      if (gray) null else blocksOf(crS, cw, chh, mcusX, mcusY, chromaQ)
    new EncPlan(w, h, ch, cv, gray, mcusX, mcusY,
      yBlocks, cbBlocks, crBlocks)
  }

  private[operators] def encodeJpegFull(
      w: Int, h: Int, rgb: Array[Int],
      lumaQ: Int, chromaQ: Int,
      subsample: String,
      restartInterval: Int,
      gray: Boolean)
      : (Array[Byte], Map[(Int, Int, Int), Array[Int]]) = {
    val p = prepareBlocks(w, h, rgb, lumaQ, chromaQ, subsample, gray)
    val ch = p.ch
    val cv = p.cv
    val mcusX = p.mcusX
    val mcusY = p.mcusY
    val yBlocks = p.yBlocks
    val cbBlocks = p.cbBlocks
    val crBlocks = p.crBlocks

    // collect the symbol alphabets actually used, per table class
    val dcSyms = Array.fill(2)(
      scala.collection.mutable.SortedSet[Int]())
    val acSyms = Array.fill(2)(
      scala.collection.mutable.SortedSet[Int]())
    def scanSymbols(blocks: Array[Array[Int]], tab: Int,
        order: Seq[Int]): Unit = {
      var pred = 0
      order.foreach { bi =>
        val zz = blocks(bi)
        dcSyms(tab) += category(zz(0) - pred)
        pred = zz(0)
        var k = 1
        var zrun = 0
        while (k < 64) {
          if (zz(k) == 0) zrun += 1
          else {
            while (zrun > 15) { acSyms(tab) += 0xf0; zrun -= 16 }
            acSyms(tab) += (zrun << 4) | category(zz(k))
            zrun = 0
          }
          k += 1
        }
        if (zrun > 0) acSyms(tab) += 0x00 // EOB
      }
    }
    // interleaved MCU order per component
    def mcuOrder(bw: Int, hs: Int, vs: Int): Seq[Int] =
      (0 until mcusY * mcusX).flatMap { m =>
        val my = m / mcusX
        val mx = m % mcusX
        for (by <- 0 until vs; bx <- 0 until hs)
          yield (my * vs + by) * bw + (mx * hs + bx)
      }
    val yOrder = mcuOrder(mcusX * ch, ch, cv)
    val cOrder = mcuOrder(mcusX, 1, 1)
    // restart intervals reset DC prediction: scan symbols per segment
    def segments(order: Seq[Int], perMcu: Int): Seq[Seq[Int]] =
      if (restartInterval == 0) Seq(order)
      else order.grouped(restartInterval * perMcu).toSeq
    segments(yOrder, ch * cv).foreach(scanSymbols(yBlocks, 0, _))
    if (!gray) {
      segments(cOrder, 1).foreach { seg =>
        scanSymbols(cbBlocks, 1, seg)
        scanSymbols(crBlocks, 1, seg)
      }
    }
    val (dcCounts0, dcVals0, dcCodes0) =
      buildFlatTable(dcSyms(0).toSeq)
    val (acCounts0, acVals0, acCodes0) =
      buildFlatTable(acSyms(0).toSeq)
    val (dcCounts1, dcVals1, dcCodes1) =
      if (gray) (null, null, null)
      else {
        val t = buildFlatTable(dcSyms(1).toSeq)
        (t._1, t._2, t._3)
      }
    val (acCounts1, acVals1, acCodes1) =
      if (gray) (null, null, null)
      else {
        val t = buildFlatTable(acSyms(1).toSeq)
        (t._1, t._2, t._3)
      }

    val out = new java.io.ByteArrayOutputStream()
    // each marker segment writes its body into a scratch buffer so
    // the 2-byte length prefix is always honest
    def marker(m: Int)(
        body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val tmp = new java.io.ByteArrayOutputStream()
      body(tmp)
      out.write(0xff); out.write(m)
      out.write(((tmp.size + 2) >> 8) & 0xff)
      out.write((tmp.size + 2) & 0xff)
      tmp.writeTo(out)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb) { s => // DQT: flat luma table (+ chroma)
      s.write(0x00)
      (0 until 64).foreach(_ => s.write(lumaQ))
      if (!gray) {
        s.write(0x01)
        (0 until 64).foreach(_ => s.write(chromaQ))
      }
    }
    marker(0xc0) { s => // SOF0
      s.write(8)
      s.write((h >> 8) & 0xff); s.write(h & 0xff)
      s.write((w >> 8) & 0xff); s.write(w & 0xff)
      s.write(if (gray) 1 else 3)
      s.write(1); s.write((ch << 4) | cv); s.write(0)
      if (!gray) {
        s.write(2); s.write(0x11); s.write(1)
        s.write(3); s.write(0x11); s.write(1)
      }
    }
    def dht(tc: Int, th: Int, counts: Array[Int],
        vals: Array[Int]): Unit =
      marker(0xc4) { s =>
        s.write((tc << 4) | th)
        counts.foreach(s.write)
        vals.foreach(s.write)
      }
    dht(0, 0, dcCounts0, dcVals0)
    dht(1, 0, acCounts0, acVals0)
    if (!gray) {
      dht(0, 1, dcCounts1, dcVals1)
      dht(1, 1, acCounts1, acVals1)
    }
    if (restartInterval > 0)
      marker(0xdd) { s =>
        s.write((restartInterval >> 8) & 0xff)
        s.write(restartInterval & 0xff)
      }
    marker(0xda) { s => // SOS
      s.write(if (gray) 1 else 3)
      s.write(1); s.write(0x00)
      if (!gray) {
        s.write(2); s.write(0x11)
        s.write(3); s.write(0x11)
      }
      s.write(0); s.write(63); s.write(0) // Ss / Se / Ah-Al
    }
    // entropy-coded data, interleaved MCUs with optional restarts
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    def writeBlock(zz: Array[Int], ci: Int,
        dcCodes: Map[Int, (Int, Int)],
        acCodes: Map[Int, (Int, Int)]): Unit = {
      val diff = zz(0) - preds(ci)
      preds(ci) = zz(0)
      val s = category(diff)
      val (dc, dl) = dcCodes(s)
      bw.writeBits(dc, dl)
      if (s > 0) {
        val v = if (diff >= 0) diff else diff + (1 << s) - 1
        bw.writeBits(v, s)
      }
      var k = 1
      var zrun = 0
      while (k < 64) {
        if (zz(k) == 0) zrun += 1
        else {
          while (zrun > 15) {
            val (zc, zl) = acCodes(0xf0)
            bw.writeBits(zc, zl)
            zrun -= 16
          }
          val sz = category(zz(k))
          val (ac, al) = acCodes((zrun << 4) | sz)
          bw.writeBits(ac, al)
          val v = if (zz(k) >= 0) zz(k) else zz(k) + (1 << sz) - 1
          bw.writeBits(v, sz)
          zrun = 0
        }
        k += 1
      }
      if (zrun > 0) {
        val (ec, el) = acCodes(0x00)
        bw.writeBits(ec, el)
      }
    }
    var rst = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 &&
        mcu % restartInterval == 0) {
        bw.flush()
        out.write(0xff); out.write(0xd0 + (rst % 8))
        rst += 1
        java.util.Arrays.fill(preds, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      for (by <- 0 until cv; bx <- 0 until ch)
        writeBlock(
          yBlocks((my * cv + by) * (mcusX * ch) + (mx * ch + bx)),
          0, dcCodes0, acCodes0)
      if (!gray) {
        writeBlock(cbBlocks(my * mcusX + mx), 1, dcCodes1, acCodes1)
        writeBlock(crBlocks(my * mcusX + mx), 2, dcCodes1, acCodes1)
      }
      mcu += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    (out.toByteArray, p.coefMap(zeroPadAc = false))
  }

  // ------------------------------------------------------------------
  // progressive encoder (real decodable SOF2 bytes)
  // ------------------------------------------------------------------

  /** One scan of the progressive script: `cis` component indices
    * (several only for DC scans), spectral band [ss, se], successive
    * approximation (ah, al).
    */
  private final case class Scan(
      cis: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** Entropy sink shared by the two scan passes: pass 1 collects the
    * symbol alphabet per Huffman table, pass 2 emits codes and raw
    * bits. Both passes run the SAME walker so restart/EOB-run state
    * lines up exactly.
    */
  private trait ScanSink {
    def sym(tab: Int, s: Int): Unit
    def bits(v: Int, n: Int): Unit
    def restart(idx: Int): Unit
  }

  private final class SymCollector extends ScanSink {
    val syms: Array[scala.collection.mutable.SortedSet[Int]] =
      Array.fill(2)(scala.collection.mutable.SortedSet[Int]())
    def sym(tab: Int, s: Int): Unit = syms(tab) += s
    def bits(v: Int, n: Int): Unit = ()
    def restart(idx: Int): Unit = ()
  }

  private final class SymEmitter(
      out: java.io.ByteArrayOutputStream,
      codes: Array[Map[Int, (Int, Int)]]) extends ScanSink {
    val bw = new BitWriter(out)
    def sym(tab: Int, s: Int): Unit = {
      val (c, l) = codes(tab)(s)
      bw.writeBits(c, l)
    }
    def bits(v: Int, n: Int): Unit = bw.writeBits(v, n)
    def restart(idx: Int): Unit = {
      bw.flush()
      out.write(0xff)
      out.write(0xd0 + (idx % 8))
    }
  }

  /** Encode RGB pixels as real PROGRESSIVE (SOF2) JPEG with the same
    * flat quantization/Huffman machinery as [[encodeJpeg]]. The scan
    * script is libjpeg-shaped: interleaved DC first at Al=1, per-
    * component AC bands [1,5] and [6,63] at Al=1, AC refinement of
    * both bands to Al=0, DC refinement to Al=0 — every Annex G
    * decode path (EOB runs, ZRL-in-refinement, correction bits,
    * newly-significant placement) is exercised. ImageIO reads the
    * output; [[decodeQuantized]] must reproduce the returned blocks
    * bit for bit.
    */
  def encodeProgressive(
      w: Int, h: Int, rgb: Array[Int],
      lumaQ: Int = 8, chromaQ: Int = 12,
      subsample: String = "444",
      restartInterval: Int = 0,
      gray: Boolean = false): Array[Byte] =
    encodeProgressiveFull(w, h, rgb, lumaQ, chromaQ, subsample,
      restartInterval, gray)._1

  /** Spec hook: the bytes plus the quantized blocks AS TRANSMITTED —
    * padding blocks beyond a component's own grid carry DC only
    * (non-interleaved AC scans never visit them), so their ACs are
    * zero in the returned map exactly as on the wire.
    */
  private[operators] def encodeProgressiveFull(
      w: Int, h: Int, rgb: Array[Int],
      lumaQ: Int, chromaQ: Int,
      subsample: String,
      restartInterval: Int,
      gray: Boolean)
      : (Array[Byte], Map[(Int, Int, Int), Array[Int]]) = {
    val p = prepareBlocks(w, h, rgb, lumaQ, chromaQ, subsample, gray)
    val comps = 0 until p.nComps
    val script =
      Scan(comps, 0, 0, 0, 1) +:
        (comps.flatMap(ci =>
          Seq(Scan(Seq(ci), 1, 5, 0, 1), Scan(Seq(ci), 6, 63, 0, 1))) ++
          comps.flatMap(ci =>
            Seq(Scan(Seq(ci), 1, 5, 1, 0), Scan(Seq(ci), 6, 63, 1, 0))) :+
          Scan(comps, 0, 0, 1, 0))

    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int)(
        body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val tmp = new java.io.ByteArrayOutputStream()
      body(tmp)
      out.write(0xff); out.write(m)
      out.write(((tmp.size + 2) >> 8) & 0xff)
      out.write((tmp.size + 2) & 0xff)
      tmp.writeTo(out)
    }
    out.write(0xff); out.write(0xd8) // SOI
    marker(0xdb) { s =>
      s.write(0x00)
      (0 until 64).foreach(_ => s.write(lumaQ))
      if (!gray) {
        s.write(0x01)
        (0 until 64).foreach(_ => s.write(chromaQ))
      }
    }
    marker(0xc2) { s => // SOF2
      s.write(8)
      s.write((h >> 8) & 0xff); s.write(h & 0xff)
      s.write((w >> 8) & 0xff); s.write(w & 0xff)
      s.write(if (gray) 1 else 3)
      s.write(1); s.write((p.ch << 4) | p.cv); s.write(0)
      if (!gray) {
        s.write(2); s.write(0x11); s.write(1)
        s.write(3); s.write(0x11); s.write(1)
      }
    }
    if (restartInterval > 0)
      marker(0xdd) { s =>
        s.write((restartInterval >> 8) & 0xff)
        s.write(restartInterval & 0xff)
      }

    script.foreach { scan =>
      // pass 1: collect the symbol alphabet this scan actually uses
      val coll = new SymCollector
      walkScan(p, scan, restartInterval, coll)
      val isDc = scan.ss == 0
      val needTables = !(isDc && scan.ah > 0) // DC refinement: raw bits
      val codes = new Array[Map[Int, (Int, Int)]](2)
      if (needTables) {
        val tc = if (isDc) 0 else 1
        coll.syms.zipWithIndex.foreach { case (ss, tab) =>
          if (ss.nonEmpty) {
            val (counts, vals, cmap) = buildFlatTable(ss.toSeq)
            marker(0xc4) { s =>
              s.write((tc << 4) | tab)
              counts.foreach(s.write)
              vals.foreach(s.write)
            }
            codes(tab) = cmap
          }
        }
      }
      marker(0xda) { s => // SOS
        s.write(scan.cis.length)
        scan.cis.foreach { ci =>
          s.write(ci + 1) // component ids are 1-based in our SOF
          val tab = if (ci == 0) 0 else 1
          s.write(if (isDc) (tab << 4) | 0 else 0x00 | tab)
        }
        s.write(scan.ss); s.write(scan.se)
        s.write((scan.ah << 4) | scan.al)
      }
      // pass 2: emit
      val em = new SymEmitter(out, codes)
      walkScan(p, scan, restartInterval, em)
      em.bw.flush()
    }
    out.write(0xff); out.write(0xd9) // EOI
    (out.toByteArray, p.coefMap(zeroPadAc = true))
  }

  /** Drive one scan over the block grid(s), feeding `sink` — the
    * walker both passes share. Restart boundaries flush EOB runs and
    * reset prediction state in lockstep with the decoder.
    */
  private def walkScan(p: EncPlan, scan: Scan, ri: Int,
      sink: ScanSink): Unit = {
    if (scan.ss == 0) walkDcScan(p, scan, ri, sink)
    else walkAcScan(p, scan, ri, sink)
  }

  private def walkDcScan(p: EncPlan, scan: Scan, ri: Int,
      sink: ScanSink): Unit = {
    val preds = new Array[Int](3)
    var rst = 0
    var since = 0
    def maybeRestart(): Unit =
      if (ri > 0 && since == ri) {
        sink.restart(rst)
        rst += 1
        java.util.Arrays.fill(preds, 0)
        since = 0
      }
    def block(ci: Int, zz: Array[Int]): Unit = {
      val tab = if (ci == 0) 0 else 1
      if (scan.ah == 0) {
        val v = zz(0) >> scan.al // DC point transform: arith shift
        val diff = v - preds(ci)
        preds(ci) = v
        val s = category(diff)
        sink.sym(tab, s)
        if (s > 0)
          sink.bits(if (diff >= 0) diff else diff + (1 << s) - 1, s)
      } else sink.bits((zz(0) >> scan.al) & 1, 1)
    }
    if (scan.cis.length > 1) { // interleaved MCU walk
      var mcu = 0
      val n = p.mcusX * p.mcusY
      while (mcu < n) {
        maybeRestart()
        val my = mcu / p.mcusX
        val mx = mcu % p.mcusX
        scan.cis.foreach { ci =>
          val (hs, vs) = if (ci == 0) (p.ch, p.cv) else (1, 1)
          val gw = p.gridW(ci)
          var by = 0
          while (by < vs) {
            var bx = 0
            while (bx < hs) {
              block(ci,
                p.blocks(ci)((my * vs + by) * gw + (mx * hs + bx)))
              bx += 1
            }
            by += 1
          }
        }
        since += 1
        mcu += 1
      }
    } else { // single component: its own grid, one block per MCU
      val ci = scan.cis.head
      val n = p.nibW(ci) * p.nibH(ci)
      var u = 0
      while (u < n) {
        maybeRestart()
        block(ci, p.blocks(ci)(
          (u / p.nibW(ci)) * p.gridW(ci) + u % p.nibW(ci)))
        since += 1
        u += 1
      }
    }
  }

  private def walkAcScan(p: EncPlan, scan: Scan, ri: Int,
      sink: ScanSink): Unit = {
    val ci = scan.cis.head
    val tid = if (ci == 0) 0 else 1 // AC table id by component
    var eobrun = 0
    // correction bits owed to pending EOB runs (G.1.2.3 buffering)
    val pending = new scala.collection.mutable.ArrayBuffer[Int]()
    def flushEob(): Unit = {
      if (eobrun > 0) {
        val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
        sink.sym(tid, nbits << 4)
        if (nbits > 0) sink.bits(eobrun - (1 << nbits), nbits)
        eobrun = 0
      }
      pending.foreach(bit => sink.bits(bit, 1))
      pending.clear()
    }
    var rst = 0
    var since = 0
    val n = p.nibW(ci) * p.nibH(ci)
    var u = 0
    while (u < n) {
      if (ri > 0 && since == ri) {
        flushEob()
        sink.restart(rst)
        rst += 1
        since = 0
      }
      val zz = p.blocks(ci)(
        (u / p.nibW(ci)) * p.gridW(ci) + u % p.nibW(ci))
      if (scan.ah == 0) { // AC first pass (G.1.2.2)
        var r = 0
        var k = scan.ss
        while (k <= scan.se) {
          val t = math.abs(zz(k)) >> scan.al
          if (t == 0) r += 1
          else {
            flushEob()
            while (r > 15) { sink.sym(tid, 0xf0); r -= 16 } // ZRL
            val nbits = category(t)
            sink.sym(tid, (r << 4) | nbits)
            val sv = if (zz(k) >= 0) t else -t
            sink.bits(if (sv >= 0) sv else sv + (1 << nbits) - 1,
              nbits)
            r = 0
          }
          k += 1
        }
        if (r > 0) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        }
      } else { // AC refinement (G.1.2.3)
        // last newly-significant position bounds ZRL emission
        var eobPos = scan.ss - 1
        var k = scan.ss
        while (k <= scan.se) {
          if ((math.abs(zz(k)) >> scan.al) == 1) eobPos = k
          k += 1
        }
        var r = 0
        val br = new scala.collection.mutable.ArrayBuffer[Int]()
        k = scan.ss
        while (k <= scan.se) {
          val t = math.abs(zz(k)) >> scan.al
          if (t == 0) r += 1
          else {
            // ZRLs are due at ANY nonzero coefficient (the decoder
            // reads history correction bits positionally inside each
            // symbol's zero-run window), but never past the last
            // newly-significant position — those runs fold into EOB
            while (r > 15 && k <= eobPos) {
              flushEob()
              sink.sym(tid, 0xf0) // ZRL
              r -= 16
              br.foreach(bit => sink.bits(bit, 1))
              br.clear()
            }
            if (t > 1) br += (t & 1) // history coef: correction bit
            else { // newly significant
              flushEob()
              sink.sym(tid, (r << 4) | 1)
              sink.bits(if (zz(k) >= 0) 1 else 0, 1)
              br.foreach(bit => sink.bits(bit, 1))
              br.clear()
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || br.nonEmpty) {
          eobrun += 1
          pending ++= br
          // bound the buffered-correction-bit pool (libjpeg's
          // MAX_CORR_BITS discipline)
          if (eobrun == 0x7fff || pending.length > 937) flushEob()
        }
      }
      since += 1
      u += 1
    }
    flushEob()
  }
}
