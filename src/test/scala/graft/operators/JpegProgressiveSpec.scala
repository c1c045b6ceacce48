package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Progressive (SOF2) JPEG: the Annex G scan machinery is pinned
  * three ways — (1) decoded quantized coefficients equal the
  * encoder's AS-TRANSMITTED blocks bit for bit (Huffman, EOB runs,
  * ZRL-in-refinement, correction-bit buffering, DC/AC point
  * transforms, restart resets); (2) progressive pixels equal OUR
  * baseline decode of the same image byte-for-byte (identical
  * coefficients through the identical IDCT — the padding blocks a
  * progressive stream never refines cannot reach visible pixels);
  * (3) ImageIO reads our SOF2 bytes and agrees within the T.81
  * tolerance.
  */
class JpegProgressiveSpec extends AnyFunSuite {

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

  private def maxDelta(
      a: PixelDecode.Pixels, b: PixelDecode.Pixels): Int = {
    assert(a.width === b.width && a.height === b.height)
    a.rgb.zip(b.rgb).map { case (p, q) =>
      Seq(16, 8, 0).map(s => math.abs(((p >> s) & 0xff) -
        ((q >> s) & 0xff))).max
    }.max
  }

  test("the scan machinery roundtrips EXACTLY: decoded quantized " +
    "coefficients equal the encoder's transmitted blocks for every " +
    "sampling mode, restart interval, and grayscale") {
    val img = colorImg(37, 23, 5)
    for (sub <- Seq("444", "422", "440", "420"); rst <- Seq(0, 3)) {
      val (jpeg, want) = JpegDecode.encodeProgressiveFull(37, 23, img,
        lumaQ = 6, chromaQ = 10, subsample = sub,
        restartInterval = rst, gray = false)
      val got = JpegDecode.decodeQuantized(jpeg)
        .getOrElse(fail(s"decode $sub rst=$rst"))
      assert(got.keySet === want.keySet, s"$sub rst=$rst")
      got.foreach { case (k, zz) =>
        assert(zz.toSeq === want(k).toSeq, s"$sub rst=$rst at $k")
      }
      val (gjpeg, gwant) = JpegDecode.encodeProgressiveFull(37, 23,
        img, lumaQ = 6, chromaQ = 10, subsample = "444",
        restartInterval = rst, gray = true)
      val ggot = JpegDecode.decodeQuantized(gjpeg)
        .getOrElse(fail(s"gray decode rst=$rst"))
      assert(ggot.keySet === gwant.keySet)
      ggot.foreach { case (k, zz) =>
        assert(zz.toSeq === gwant(k).toSeq, s"gray rst=$rst at $k")
      }
    }
  }

  test("progressive pixels equal OUR baseline decode byte-for-byte " +
    "(same coefficients, same IDCT), and ImageIO agrees within the " +
    "T.81 tolerance") {
    val img = smoothImg(41, 29, 3)
    for (sub <- Seq("444", "422", "440", "420"); rst <- Seq(0, 2)) {
      val base = JpegDecode.decode(JpegDecode.encodeJpeg(41, 29, img,
        lumaQ = 4, chromaQ = 6, subsample = sub,
        restartInterval = rst)).getOrElse(fail("baseline"))
      val pjpeg = JpegDecode.encodeProgressive(41, 29, img,
        lumaQ = 4, chromaQ = 6, subsample = sub,
        restartInterval = rst)
      val prog = JpegDecode.decode(pjpeg)
        .getOrElse(fail(s"progressive decode: $sub rst=$rst"))
      assert(prog.rgb.toSeq === base.rgb.toSeq, s"$sub rst=$rst")
      val theirs = PixelDecode.decodeImageIo(pjpeg)
        .getOrElse(fail(s"ImageIO must read our SOF2: $sub rst=$rst"))
      val d = maxDelta(prog, theirs)
      assert(d <= 4, s"$sub rst=$rst: max channel delta $d")
    }
    // grayscale leg (single-component non-interleaved DC scans)
    val gjpeg = JpegDecode.encodeProgressive(41, 29, img, lumaQ = 4,
      chromaQ = 6, gray = true)
    val gprog = JpegDecode.decode(gjpeg).getOrElse(fail("gray"))
    val gbase = JpegDecode.decode(JpegDecode.encodeJpeg(41, 29, img,
      lumaQ = 4, chromaQ = 6, gray = true)).get
    assert(gprog.rgb.toSeq === gbase.rgb.toSeq)
    val gd = maxDelta(gprog,
      PixelDecode.decodeImageIo(gjpeg).getOrElse(fail("ImageIO gray")))
    assert(gd <= 2, s"gray: max channel delta $gd")
  }

  test("wide-band values exercise deep EOB runs and dense " +
    "refinement: a high-frequency image and a near-flat image " +
    "both roundtrip exactly") {
    // near-flat: almost every AC band is an EOB run (run-length arith)
    val flat = Array.tabulate(64 * 48) { i =>
      val v = 120 + (if (i % 257 == 0) 40 else 0)
      (v << 16) | (v << 8) | v
    }
    // high-frequency: checkerboard pushes energy into the last band
    val busy = Array.tabulate(64 * 48) { i =>
      val x = i % 64
      val y = i / 64
      val v = if (((x ^ y) & 1) == 0) 30 else 225
      (v << 16) | ((255 - v) << 8) | v
    }
    for ((img, tag) <- Seq((flat, "flat"), (busy, "busy"));
        rst <- Seq(0, 5)) {
      val (jpeg, want) = JpegDecode.encodeProgressiveFull(64, 48, img,
        lumaQ = 4, chromaQ = 6, subsample = "420",
        restartInterval = rst, gray = false)
      val got = JpegDecode.decodeQuantized(jpeg)
        .getOrElse(fail(s"$tag rst=$rst"))
      assert(got.keySet === want.keySet, s"$tag rst=$rst")
      got.foreach { case (k, zz) =>
        assert(zz.toSeq === want(k).toSeq, s"$tag rst=$rst at $k")
      }
      // and the kernel chain picks progressive up end to end
      assert(PixelDecode.decode(jpeg).isDefined, s"$tag kernel")
    }
  }

  test("hostility: truncation, bit damage, garbage scan headers — " +
    "None, never a throw; a baseline scan mislabeled SOF2 is " +
    "malformed (Ss=0, Se=63 is no legal progressive scan)") {
    val img = colorImg(19, 13, 7)
    val jpeg = JpegDecode.encodeProgressive(19, 13, img)
    assert(JpegDecode.decode(jpeg).isDefined)
    (0 until jpeg.length by 23).foreach { n =>
      JpegDecode.decode(jpeg.take(n)) // never throws
    }
    val rnd = new scala.util.Random(91)
    (1 to 300).foreach { _ =>
      val m = jpeg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      JpegDecode.decode(m) // never throws
    }
    // SOF0 stream relabeled SOF2: its single scan header (0, 63)
    // violates G.1.1.1.1 and must be rejected, not mis-decoded
    val base = JpegDecode.encodeJpeg(19, 13, img)
    var i = 2
    var sof = -1
    while (sof < 0 && i + 1 < base.length) {
      if ((base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0)
        sof = i
      i += 1
    }
    assert(sof > 0)
    base(sof + 1) = 0xc2.toByte
    assert(JpegDecode.decode(base) === None)
  }
}
