package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The real pixel path: PNG encode → decode roundtrips (both the
  * ImageIO engine and the from-the-spec pure decoder), cross-engine
  * pixel agreement on images the JDK's own writer filters, and the
  * integer-exact feature kernels (area resample vs a BigInt rational
  * reference, dHash/pHash structure properties).
  */
class PixelDecodeSpec extends AnyFunSuite {

  private var seed = 987654321L
  private def next(): Long = {
    seed = seed * 6364136223846793005L + 1442695040888963407L
    seed >>> 16
  }

  test("gray PNG roundtrip is pixel-exact through BOTH decoders") {
    val (w, h) = (13, 7)
    val gray = Array.fill(w * h)((next() % 256).toInt)
    val png = PixelDecode.encodePngGray(w, h, gray)
    for (decoded <- Seq(PixelDecode.decodeImageIo(png),
        PixelDecode.decodePngPure(png))) {
      val p = decoded.get
      assert(p.width === w && p.height === h)
      // achromatic: every channel equals the gray sample
      assert(p.rgb.toSeq === gray.map(g => (g << 16) | (g << 8) | g).toSeq)
      assert(PixelDecode.grayLuma(p).toSeq === gray.toSeq)
    }
  }

  test("RGB PNG roundtrip is pixel-exact through BOTH decoders") {
    val (w, h) = (9, 11)
    val rgb = Array.fill(w * h)((next() & 0xffffff).toInt)
    val png = PixelDecode.encodePngRgb(w, h, rgb)
    for (decoded <- Seq(PixelDecode.decodeImageIo(png),
        PixelDecode.decodePngPure(png))) {
      val p = decoded.get
      assert(p.width === w && p.height === h)
      assert(p.rgb.toSeq === rgb.toSeq)
    }
  }

  test("pure decoder == ImageIO on PNGs the JDK writer encodes " +
    "(exercises the Sub/Up/Average/Paeth unfilter paths)") {
    // the JDK PNG writer picks per-row adaptive filters our encoder
    // never emits — roundtripping ImageIO-WRITTEN bytes through the
    // pure decoder covers the full unfilter matrix
    for (trial <- 1 to 5) {
      val w = 8 + (next() % 40).toInt
      val h = 8 + (next() % 40).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // smooth gradients + noise: makes Sub/Up/Paeth filters win
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 255 / w + (next() % 8)).toInt.min(255)
        val g = (y * 255 / h + (next() % 8)).toInt.min(255)
        val b = ((x + y) * 127 / (w + h)).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val bytes = bos.toByteArray
      val a = PixelDecode.decodeImageIo(bytes).get
      val b = PixelDecode.decodePngPure(bytes).get
      assert(a.width === b.width && a.height === b.height, s"trial $trial")
      assert(a.rgb.toSeq === b.rgb.toSeq, s"trial $trial")
    }
  }

  test("decode returns None on garbage, truncated PNGs, and null-safe " +
    "empty input") {
    assert(PixelDecode.decode("not an image".getBytes) === None)
    assert(PixelDecode.decode(Array.empty[Byte]) === None)
    val png = PixelDecode.encodePngGray(4, 4, Array.fill(16)(7))
    assert(PixelDecode.decode(png.take(30)) === None)
    assert(PixelDecode.decodePngPure(png.take(30)) === None)
    // a hostile IHDR claiming a 100000x100000 image must bail at the
    // allocation guard, not OOM the executor
    val evil = png.clone()
    for (i <- 16 to 19) evil(i) = 0
    evil(17) = 1; evil(18) = 0x86.toByte; evil(19) = 0xa0.toByte // w
    for (i <- 20 to 23) evil(i) = evil(i - 4) // h = w
    assert(PixelDecode.decodePngPure(evil) === None)
    // a chunk whose 4-byte length would wrap 32-bit bounds math
    val wrap = png.clone()
    wrap(8) = 0x7f.toByte // IHDR length -> 0x7f00000d
    assert(PixelDecode.decodePngPure(wrap) === None)
    // a hostile IHDR with len < 13 must return None via the explicit
    // per-chunk length check, not via exception control flow
    val shortIhdr = png.clone()
    shortIhdr(8) = 0; shortIhdr(9) = 0; shortIhdr(10) = 0
    shortIhdr(11) = 4 // IHDR claims only 4 payload bytes
    assert(PixelDecode.decodePngPure(shortIhdr) === None)
  }

  test("resizeArea: identity, exact known boxes, and agreement with a " +
    "BigInt rational reference on randomized geometry") {
    val src = Array(10, 20, 30, 40)
    assert(PixelDecode.resizeArea(src, 2, 2, 2, 2).toSeq === src.toSeq)
    // 2x2 -> 1x1: plain average
    assert(PixelDecode.resizeArea(src, 2, 2, 1, 1).toSeq === Seq(25))
    // 4x1 -> 2x1: halves average pairwise
    assert(PixelDecode.resizeArea(Array(0, 100, 50, 250), 4, 1, 2, 1)
      .toSeq === Seq(50, 150))
    // reference: output cell (j,i) = floor of the exact rational box
    // integral, brute-forced by supersampling each source pixel into
    // tw*th subcells
    def ref(src: Array[Int], w: Int, h: Int, tw: Int, th: Int) = {
      val acc = Array.fill(tw * th)(BigInt(0))
      for (y <- 0 until h * th; x <- 0 until w * tw) {
        // subcell (y,x) of the (w*tw x h*th) supersampled grid
        val sPix = (y / th) * w + (x / tw)
        val oCell = (y / h) * tw + (x / w)
        acc(oCell) += src(sPix)
      }
      acc.map(a => (a / (BigInt(w) * h)).toInt).toSeq
    }
    for (_ <- 1 to 10) {
      val w = 1 + (next() % 24).toInt
      val h = 1 + (next() % 24).toInt
      val tw = 1 + (next() % 24).toInt
      val th = 1 + (next() % 24).toInt
      val s = Array.fill(w * h)((next() % 256).toInt)
      assert(PixelDecode.resizeArea(s, w, h, tw, th).toSeq
        === ref(s, w, h, tw, th), s"${w}x$h -> ${tw}x$th")
    }
  }

  test("dHash/pHash structure: flat images hash to 0, gradients set " +
    "the expected comparisons, tiny images upscale without error") {
    val flat = Array.fill(32 * 32)(128)
    assert(PixelDecode.pHash(flat, 32, 32) === 0L) // all AC coefs 0
    assert(PixelDecode.dHash(flat, 32, 32) === 0L) // no strict decrease
    // rows strictly increasing left-to-right: g(r,c) > g(r,c+1) never
    val inc = Array.tabulate(9 * 8)(i => (i % 9) * 20)
    assert(PixelDecode.dHash(inc, 9, 8) === 0L)
    // strictly decreasing: every one of the 64 comparison bits set
    val dec = Array.tabulate(9 * 8)(i => 255 - (i % 9) * 20)
    assert(PixelDecode.dHash(dec, 9, 8) === -1L) // all 64 bits
    // pHash never sets bit 63 (63 AC bits only)
    val rnd = Array.fill(32 * 32)((next() % 256).toInt)
    assert(PixelDecode.pHash(rnd, 32, 32) >= 0L)
    // a 2x2 image resamples up to both hash geometries without error
    val tiny = Array(0, 255, 255, 0)
    PixelDecode.dHash(tiny, 2, 2)
    PixelDecode.pHash(tiny, 2, 2)
    // near-duplicate property: small noise leaves most pHash bits alone
    val noisy = rnd.map(v => (v + 3).min(255))
    val d = java.lang.Long.bitCount(
      PixelDecode.pHash(rnd, 32, 32) ^ PixelDecode.pHash(noisy, 32, 32))
    assert(d <= 10, s"hamming $d")
  }

  test("TIFF: header parse (both byte orders via the IFD walk) and " +
    "ImageIO pixel decode agree with the written image") {
    val (w, h) = (21, 13)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((next() & 0xffffff)).toInt)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", bos))
    val bytes = bos.toByteArray
    assert(ImageHeader.parse(bytes) ===
      Some(ImageHeader.Info("tiff", w, h)))
    val p = PixelDecode.decode(bytes).get
    assert(p.width === w && p.height === h)
    val want = (0 until h).flatMap(y => (0 until w).map(x =>
      img.getRGB(x, y) & 0xffffff))
    assert(p.rgb.toSeq === want)
    // a truncated header never parses
    assert(ImageHeader.parse(bytes.take(6)) === None)
  }

  test("pure GIF decoder == ImageIO on JDK-written GIFs, plain and " +
    "interlaced (LZW, color tables, 4-pass reorder)") {
    def writeGif(img: java.awt.image.BufferedImage,
        interlaced: Boolean): Array[Byte] = {
      val w = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      w.setOutput(ios)
      val p = w.getDefaultWriteParam
      p.setProgressiveMode(
        if (interlaced) javax.imageio.ImageWriteParam.MODE_DEFAULT
        else javax.imageio.ImageWriteParam.MODE_DISABLED)
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      ios.close(); w.dispose()
      bos.toByteArray
    }
    for (trial <- 1 to 4; interlaced <- Seq(false, true)) {
      val w = 5 + (next() % 50).toInt
      val h = 5 + (next() % 40).toInt
      // indexed image: the GIF write is lossless, so both decoders
      // must agree with each other exactly
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (next() % 256).toInt)
      val bytes = writeGif(img, interlaced)
      val a = PixelDecode.decodeImageIo(bytes).get
      val b = PixelDecode.decodeGifPure(bytes).get
      assert(a.width === b.width && a.height === b.height,
        s"trial $trial interlaced=$interlaced")
      assert(a.rgb.toSeq === b.rgb.toSeq,
        s"trial $trial interlaced=$interlaced ${w}x$h")
    }
    // garbage / header-only GIF bytes never decode
    assert(PixelDecode.decodeGifPure("GIF89a junk".getBytes) === None)
    assert(PixelDecode.decodeGifPure("nope".getBytes) === None)
  }

  test("pure BMP decoder == ImageIO on JDK-written BMPs: 24-bit " +
    "true-color and 8-bit palette") {
    for (trial <- 1 to 3;
        imgType <- Seq(java.awt.image.BufferedImage.TYPE_INT_RGB,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)) {
      val w = 5 + (next() % 40).toInt // odd widths exercise row padding
      val h = 5 + (next() % 30).toInt
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (next() & 0xffffff).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos))
      val bytes = bos.toByteArray
      val a = PixelDecode.decodeImageIo(bytes).get
      val b = PixelDecode.decodeBmpPure(bytes).get
      assert(a.width === b.width && a.height === b.height,
        s"trial $trial type=$imgType")
      assert(a.rgb.toSeq === b.rgb.toSeq, s"trial $trial type=$imgType")
    }
    // garbage and header-only bytes never decode
    assert(PixelDecode.decodeBmpPure("BM not a bitmap".getBytes) === None)
    assert(PixelDecode.decodeBmpPure(Array.empty[Byte]) === None)
  }

  test("EXIF orientation: APP1-embedded TIFF in both byte orders, " +
    "bare TIFF, and absent/corrupt cases") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // little-endian TIFF: header(8) + count(2) + one entry(12) + next(4)
    val tiffLe = b('I', 'I', 42, 0, 8, 0, 0, 0, // IFD at offset 8
      1, 0, // one entry
      18, 1, // tag 274 LE
      3, 0, // type SHORT
      1, 0, 0, 0, // count 1
      6, 0, 0, 0) ++ b(0, 0, 0, 0) // value 6, next-IFD 0
    val tiffBe = b('M', 'M', 0, 42, 0, 0, 0, 8,
      0, 1,
      1, 18, // tag 274 BE
      0, 3,
      0, 0, 0, 1,
      0, 8, 0, 0) ++ b(0, 0, 0, 0) // value 8 (left-justified SHORT)
    def jpegWith(tiff: Array[Byte]): Array[Byte] = {
      val payload = "Exif".getBytes("US-ASCII") ++ b(0, 0) ++ tiff
      val len = payload.length + 2
      b(0xff, 0xd8, 0xff, 0xe1, len >> 8, len & 0xff) ++ payload ++
        b(0xff, 0xd9)
    }
    assert(ImageHeader.exifOrientation(jpegWith(tiffLe)) === Some(6))
    assert(ImageHeader.exifOrientation(jpegWith(tiffBe)) === Some(8))
    // bare TIFF structures parse directly
    assert(ImageHeader.exifOrientation(tiffLe) === Some(6))
    assert(ImageHeader.exifOrientation(tiffBe) === Some(8))
    // a JPEG without APP1 (the ImageIO writer emits JFIF only), plain
    // text, and truncation all yield None
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    assert(ImageHeader.exifOrientation(bos.toByteArray) === None)
    assert(ImageHeader.exifOrientation("hello".getBytes) === None)
    assert(ImageHeader.exifOrientation(jpegWith(tiffLe).take(12)) === None)
    assert(ImageHeader.exifOrientation(null) === None)
  }

  test("the DCT cosine table is the pinned integer contract") {
    // u=0 row is the DC basis: all 10000
    assert(PixelDecode.DctCos(0).toSeq === Seq.fill(32)(10000L))
    // symmetry of cos((2x+1)u*pi/64): row u is antisymmetric in x for
    // odd u, symmetric for even u
    for (u <- 1 until 8; x <- 0 until 16) {
      val a = PixelDecode.DctCos(u)(x)
      val b = PixelDecode.DctCos(u)(31 - x)
      if (u % 2 == 1) assert(a === -b) else assert(a === b)
    }
    // spot values from the published DCT-II definition
    assert(PixelDecode.DctCos(1)(0) ===
      math.round(math.cos(math.Pi / 64) * 10000))
    assert(PixelDecode.DctCos(4)(3) ===
      math.round(math.cos(28 * math.Pi / 64) * 10000))
  }
}
