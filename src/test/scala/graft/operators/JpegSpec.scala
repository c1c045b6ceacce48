package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** JpegDecode: the from-the-spec baseline JPEG engine, cross-checked
  * three ways — (1) the entropy layer (Huffman, DC prediction,
  * zigzag, restarts, byte stuffing) is EXACT against the encoder's
  * quantized coefficients; (2) pixels match ImageIO within the T.81
  * IDCT tolerance; (3) DC-only frames (flat blocks) are
  * integer-exact in BOTH engines.
  */
class JpegSpec extends AnyFunSuite {

  private def colorImg(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val r = (seed * 37 + i * 7) % 256
      val g = (seed * 91 + i * 13 + 100) % 256
      val b = (seed * 53 + (i * i) % 97) % 256
      (r << 16) | (g << 8) | b
    }

  private def smoothImg(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      val v = (seed * 11 + x * 3 + y * 5) % 200 + 28
      val g = (v + x) % 256
      (v << 16) | (g << 8) | ((255 - v) & 0xff)
    }

  private def imageIoPixels(jpeg: Array[Byte]): PixelDecode.Pixels =
    PixelDecode.decodeImageIo(jpeg)
      .getOrElse(fail("ImageIO must read the synthesized JPEG"))

  private def maxDelta(
      a: PixelDecode.Pixels, b: PixelDecode.Pixels): Int = {
    assert(a.width === b.width && a.height === b.height)
    a.rgb.zip(b.rgb).map { case (p, q) =>
      Seq(16, 8, 0).map(s => math.abs(((p >> s) & 0xff) -
        ((q >> s) & 0xff))).max
    }.max
  }

  test("the entropy layer roundtrips EXACTLY: decoded quantized " +
    "coefficients equal the encoder's for every sampling mode and " +
    "restart interval") {
    val img = colorImg(37, 23, 5)
    for (sub <- Seq("444", "422", "440", "420"); rst <- Seq(0, 3)) {
      val (jpeg, want) = JpegDecode.encodeJpegFull(37, 23, img,
        lumaQ = 6, chromaQ = 10, subsample = sub,
        restartInterval = rst, gray = false)
      // a slip in Huffman build, sign extension, ZRL/EOB, byte
      // stuffing, DC prediction, or restart reset changes some
      // coefficient somewhere
      val got = JpegDecode.decodeQuantized(jpeg)
        .getOrElse(fail(s"decode $sub rst=$rst"))
      assert(got.keySet === want.keySet, s"$sub rst=$rst")
      got.foreach { case (k, zz) =>
        assert(zz.toSeq === want(k).toSeq, s"$sub rst=$rst at $k")
      }
      val px = JpegDecode.decode(jpeg).getOrElse(fail("pixels"))
      assert(px.width === 37 && px.height === 23)
      // gray variant exercises the single-component scan
      val (gjpeg, gwant) = JpegDecode.encodeJpegFull(37, 23, img,
        lumaQ = 6, chromaQ = 10, subsample = "444",
        restartInterval = rst, gray = true)
      val ggot = JpegDecode.decodeQuantized(gjpeg)
        .getOrElse(fail(s"gray decode rst=$rst"))
      assert(ggot.keySet === gwant.keySet)
      ggot.foreach { case (k, zz) =>
        assert(zz.toSeq === gwant(k).toSeq, s"gray rst=$rst at $k")
      }
    }
  }

  test("pixels agree with ImageIO within the T.81 IDCT tolerance " +
    "on every sampling mode; dims exact; ImageIO reads our bytes") {
    val img = smoothImg(41, 29, 3)
    for (sub <- Seq("444", "422", "440", "420"); rst <- Seq(0, 2)) {
      val jpeg = JpegDecode.encodeJpeg(41, 29, img, lumaQ = 4,
        chromaQ = 6, subsample = sub, restartInterval = rst)
      val ours = JpegDecode.decode(jpeg)
        .getOrElse(fail(s"our decode: $sub rst=$rst"))
      val theirs = imageIoPixels(jpeg)
      // two conforming IDCTs may each be off by 1, upsampling may
      // differ by a sample at chroma edges: bound the worst channel
      val d = maxDelta(ours, theirs)
      assert(d <= 4, s"$sub rst=$rst: max channel delta $d")
    }
    // grayscale leg
    val gjpeg = JpegDecode.encodeJpeg(41, 29, img, lumaQ = 4,
      chromaQ = 6, gray = true)
    val d = maxDelta(JpegDecode.decode(gjpeg).get, imageIoPixels(gjpeg))
    assert(d <= 2, s"gray: max channel delta $d")
  }

  test("DC-only frames decode INTEGER-EXACTLY in both engines: flat " +
    "8x8 blocks of q*c/8 + 128 — the arithmetic the oracle replays") {
    // flat 8x8 tiles: every block quantizes to a DC-only spectrum
    // when tile values are exactly representable
    val w = 32
    val h = 24
    val q = 8
    def tileVal(bx: Int, by: Int): Int = ((bx * 5 + by * 3) % 25) * 8
    val img = Array.tabulate(w * h) { i =>
      val v = 128 + tileVal((i % w) / 8, (i / w) / 8) - 96
      (v << 16) | (v << 8) | v
    }
    val jpeg = JpegDecode.encodeJpeg(w, h, img, lumaQ = q,
      chromaQ = q, subsample = "444")
    val ours = JpegDecode.decode(jpeg).get
    val theirs = imageIoPixels(jpeg)
    // both engines land on the same exact flat blocks
    assert(ours.rgb.toSeq === theirs.rgb.toSeq)
    // and the blocks are the PREDICTED values: gray pixels survive
    // the YCbCr roundtrip exactly (Cb = Cr = 128 -> R = G = B = Y),
    // and a DC-only block is round(dc * q / 8) + 128 everywhere
    val quant = JpegDecode.decodeQuantized(jpeg).get
    quant.foreach { case ((ci, by, bx), zz) =>
      assert(zz.drop(1).forall(_ == 0), s"AC leak at ($ci,$by,$bx)")
    }
    val got00 = ours.rgb(0) & 0xff
    val want00 = 128 + tileVal(0, 0) - 96
    assert(got00 === want00)
  }

  test("hostility: truncation, bit damage, frame-type confusion, " +
    "garbage — None, never a throw; the kernel chain picks it up") {
    val img = colorImg(19, 13, 7)
    val jpeg = JpegDecode.encodeJpeg(19, 13, img)
    assert(JpegDecode.decode(jpeg).isDefined)
    // the image kernel decodes it too (ImageIO first in the chain)
    assert(PixelDecode.decode(jpeg).isDefined)
    (0 until jpeg.length by 23).foreach { n =>
      JpegDecode.decode(jpeg.take(n)) // never throws
    }
    val rnd = new scala.util.Random(91)
    (1 to 300).foreach { _ =>
      val m = jpeg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      JpegDecode.decode(m) // never throws
    }
    assert(JpegDecode.decode(null) === None)
    assert(JpegDecode.decode(Array.empty[Byte]) === None)
    assert(JpegDecode.decode("not a jpeg".getBytes) === None)
    // a baseline stream relabeled SOF2 carries an Ss=0/Se=63 scan
    // header no legal progressive stream can have (G.1.1.1.1) — the
    // progressive path must reject it, not mis-decode it
    val prog = jpeg.clone()
    var i = 2
    var sof = -1
    while (sof < 0 && i + 1 < prog.length) {
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)
        sof = i
      i += 1
    }
    assert(sof > 0)
    prog(sof + 1) = 0xc2.toByte
    assert(JpegDecode.decode(prog) === None)
  }
}
