package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Vp8lDecode: WebP lossless per the public bitstream spec, pinned by
  * encode->decode roundtrips over every coding/transform shape the
  * encoder can emit (canonical + simple codes, color cache, LZ77 row
  * backrefs, all four transforms, sub-byte palette packing), plus
  * hostility and fuzz. The synthesizer writes real RIFF/VP8L files,
  * so ImageHeader and the image kernel see them as ordinary WebPs.
  */
class Vp8lSpec extends AnyFunSuite {

  // diverse deterministic color pixels (all channels exercised)
  private def colorImg(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val r = (seed * 47 + i * 13 + (i * i) % 29) % 256
      val g = (seed * 31 + i * 7) % 256
      val b = (seed * 59 + i * 17 + (i / w) * 5) % 256
      (r << 16) | (g << 8) | b
    }

  private def gray(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val v = (seed * 89 + i * 11 + (i * i) % 23) % 256
      (v << 16) | (v << 8) | v
    }

  private def roundtrip(
      w: Int, h: Int, rgb: Array[Int], label: String,
      cacheBits: Int = 0, rowBackrefs: Boolean = false,
      subtractGreen: Boolean = false, predictor: Option[Int] = None,
      colorDeltas: Option[(Int, Int, Int)] = None,
      palette: Boolean = false, metaBits: Int = 0): Array[Byte] = {
    val webp = Vp8lDecode.encodeWebpLossless(w, h, rgb,
      cacheBits = cacheBits, rowBackrefs = rowBackrefs,
      subtractGreen = subtractGreen, predictor = predictor,
      colorDeltas = colorDeltas, palette = palette,
      metaBits = metaBits)
    val px = Vp8lDecode.decode(webp).getOrElse(fail(s"decode: $label"))
    assert(px.width === w && px.height === h, label)
    assert(px.rgb.toSeq === rgb.toSeq, label)
    webp
  }

  test("plain literals, color cache, and row backrefs roundtrip " +
    "exactly; the container reads as an ordinary WebP") {
    val img = colorImg(17, 11, 3)
    val webp = roundtrip(17, 11, img, "plain")
    val info = ImageHeader.parse(webp).get
    assert(info.format === "webp" && info.width === 17 &&
      info.height === 11)
    // color cache: many repeated colors -> cache symbols on the wire
    val repeaty = Array.tabulate(24 * 16)(i => colorImg(4, 2, 9)(i % 8))
    val cached = roundtrip(24, 16, repeaty, "cache", cacheBits = 6)
    val plain = Vp8lDecode.encodeWebpLossless(24, 16, repeaty)
    assert(cached.length < plain.length,
      "cache hits must actually shrink the stream")
    // row backrefs: repeated rows -> LZ77 distance = xsize (the 2D
    // distance map's (0,1) entry)
    val rows = Array.tabulate(20 * 12)(i =>
      colorImg(20, 1, 5)((i % 20) + 20 * 0) )
    val br = roundtrip(20, 12, rows, "rows", rowBackrefs = true)
    val noBr = Vp8lDecode.encodeWebpLossless(20, 12, rows)
    assert(br.length < noBr.length,
      "row backrefs must actually shrink the stream")
    // row repeats at LAGS 2, 5, and 9: lags <= 7 ride the 2D map's
    // (0, dy) entries, lag 9 the DIRECT distance codes (dist + 120) —
    // all three decoder distance shapes are encoder-exercised
    for (lag <- Seq(2, 5, 9)) {
      val h = 3 * lag
      val laggy = Array.tabulate(16 * h)(i =>
        colorImg(16, 1, 7 + (i / 16) % lag)(i % 16))
      val enc = roundtrip(16, h, laggy, s"lag$lag", rowBackrefs = true)
      val plainLag = Vp8lDecode.encodeWebpLossless(16, h, laggy)
      assert(enc.length < plainLag.length, s"lag $lag must compress")
    }
    // both together, non-uniform tail
    val mix = rows.zipWithIndex.map { case (p, i) =>
      if (i >= 20 * 10) colorImg(20, 2, 7)(i - 20 * 10) else p }
    roundtrip(20, 12, mix, "mix", cacheBits = 5, rowBackrefs = true)
  }

  test("all four transforms roundtrip: subtract-green, every " +
    "predictor mode, color deltas, palette with each packing width") {
    val img = colorImg(13, 9, 11)
    roundtrip(13, 9, img, "subgreen", subtractGreen = true)
    for (mode <- 0 to 13)
      roundtrip(13, 9, img, s"pred$mode", predictor = Some(mode))
    for (deltas <- Seq((32, -16, 25), (-128, 127, 1), (0, 0, 0)))
      roundtrip(13, 9, img, s"color$deltas",
        colorDeltas = Some(deltas))
    // palettes: 2 colors (3-bit packing: 8 px/byte), 4 (2-bit), 16
    // (1-bit), 200 (no packing) — widths not divisible by the pack
    // factor exercise the ragged final packed pixel
    def palImg(n: Int, w: Int, h: Int): Array[Int] = {
      val colors = Array.tabulate(n)(k =>
        ((k * 37 + 11) % 256) << 16 | ((k * 91 + 3) % 256) << 8 |
          ((k * 53 + 7) % 256))
      Array.tabulate(w * h)(i => colors((i * 31 + i / w) % n))
    }
    for ((n, w, h) <- Seq((2, 19, 7), (4, 13, 6), (16, 9, 9),
        (200, 23, 11)))
      roundtrip(w, h, palImg(n, w, h), s"palette$n", palette = true)
    // composition: subtract-green + predictor + cache + backrefs
    val rows = Array.tabulate(16 * 10)(i => colorImg(16, 1, 5)(i % 16))
    roundtrip(16, 10, rows, "combo", cacheBits = 4, rowBackrefs = true,
      subtractGreen = true, predictor = Some(7))
    // COLOR_INDEXING read BEFORE the predictor (legal per the
    // grammar: each transform at most once, ANY order): the main
    // image and the predictor tiles live at the PACKED width, and
    // the predictor inverse must iterate that packed width — the
    // shape that used to index past the packed buffer. Each packing
    // width (3/2/1/0-bit), ragged final packed pixel included.
    for ((n, w, h) <- Seq((2, 19, 7), (4, 13, 6), (16, 9, 9),
        (200, 23, 11)); mode <- Seq(1, 2, 11))
      roundtrip(w, h, palImg(n, w, h), s"palette$n+pred$mode",
        palette = true, predictor = Some(mode))
  }

  test("meta-Huffman entropy image roundtrips: spatially varying " +
    "code groups in a tile checkerboard, alone and with cache + " +
    "backrefs + subtract-green") {
    val img = colorImg(21, 13, 8)
    roundtrip(21, 13, img, "meta2", metaBits = 2)
    roundtrip(21, 13, img, "meta4", metaBits = 4)
    val rows = Array.tabulate(16 * 10)(i => colorImg(16, 1, 5)(i % 16))
    roundtrip(16, 10, rows, "metaCombo", metaBits = 2, cacheBits = 4,
      rowBackrefs = true, subtractGreen = true)
  }

  test("the image kernel decodes lossless WebP for real: features, " +
    "pHash parity with the PNG twin of the same pixels") {
    val g = gray(32, 32, 4)
    val webp = Vp8lDecode.encodeWebpLossless(32, 32, g,
      subtractGreen = true)
    val png = PixelDecode.encodePngGray(32, 32, g.map(_ & 0xff))
    val fw = Multimodal.featuresOf(webp, 256)
    val fp = Multimodal.featuresOf(png, 256)
    assert(fw.format === "webp" && fw.decoded, "webp must DECODE now")
    assert((fw.width, fw.height, fw.px_sum, fw.px_sumsq, fw.dhash,
      fw.phash) ===
      ((fp.width, fp.height, fp.px_sum, fp.px_sumsq, fp.dhash,
        fp.phash)))
    // PixelDecode.decode dispatches the container too
    assert(PixelDecode.decode(webp).get.rgb.toSeq === g.toSeq)
  }

  test("VP8X-wrapped VP8L decodes through the chunk walk") {
    val img = colorImg(9, 7, 6)
    val plain = Vp8lDecode.encodeWebpLossless(9, 7, img)
    val vp8l = plain.drop(12) // the VP8L chunk, header included
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    val vp8x = "VP8X".getBytes("US-ASCII") ++ le32(10) ++
      Array[Byte](0, 0, 0, 0) ++
      Array[Byte](8, 0, 0) ++ Array[Byte](6, 0, 0) // (w-1, h-1) 24-bit LE
    val body = "WEBP".getBytes("US-ASCII") ++ vp8x ++ vp8l
    val riff = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    assert(Vp8lDecode.decode(riff).get.rgb.toSeq === img.toSeq)
    assert(ImageHeader.parse(riff).exists(i =>
      i.format == "webp" && i.width == 9 && i.height == 7))
  }

  test("hostility: truncation, bit damage, lossy VP8, and garbage " +
    "return None; fuzz never throws") {
    val webp = Vp8lDecode.encodeWebpLossless(13, 9, colorImg(13, 9, 2),
      cacheBits = 4)
    (0 until webp.length by 3).foreach { n =>
      assert(Vp8lDecode.decode(webp.take(n)) === None, s"prefix $n")
    }
    // a lossy VP8 chunk is honestly undecodable here
    val lossy = "RIFF".getBytes ++ Array[Byte](30, 0, 0, 0) ++
      "WEBP".getBytes ++ "VP8 ".getBytes ++
      Array[Byte](18, 0, 0, 0) ++ new Array[Byte](3) ++
      Array[Byte](0x9d.toByte, 0x01, 0x2a, 13, 0, 9, 0) ++
      new Array[Byte](8)
    assert(Vp8lDecode.decode(lossy) === None)
    assert(ImageHeader.parse(lossy).exists(_.format == "webp"),
      "lossy stays header-parseable")
    assert(Vp8lDecode.decode("not webp".getBytes) === None)
    assert(Vp8lDecode.decode(Array.empty[Byte]) === None)
    val rnd = new scala.util.Random(17)
    (1 to 400).foreach { _ =>
      val m = webp.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      Vp8lDecode.decode(m) // must never throw; wrong pixels are
      // possible (VP8L carries no payload CRC — the container is
      // honest about that), crashes are not
    }
  }
}
