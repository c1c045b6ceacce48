package graft.operators

import java.awt.image.{BufferedImage, IndexColorModel}
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.scalatest.funsuite.AnyFunSuite

/** decodePngPure across the FULL IHDR matrix: Adam7 interlace, bit
  * depths 1/2/4/8/16, gray/rgb/palette/alpha color types — pinned
  * EXACTLY (PNG is lossless) against ImageIO on ImageIO-written
  * streams whose actual IHDR is asserted, and against a hand-built
  * from-the-spec Adam7 vector all three ways.
  */
class PngFullMatrixSpec extends AnyFunSuite {

  private def writePng(img: BufferedImage,
      interlaced: Boolean): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(baos)
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    if (interlaced) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    writer.write(null, new IIOImage(img, null, null), p)
    writer.dispose()
    ios.close()
    baos.toByteArray
  }

  /** (bitDepth, colorType, interlace) from the produced IHDR. */
  private def ihdr(png: Array[Byte]): (Int, Int, Int) =
    (png(24) & 0xff, png(25) & 0xff, png(28) & 0xff)

  private def exact(png: Array[Byte], what: String): Unit = {
    val ours = PixelDecode.decodePngPure(png)
      .getOrElse(fail(s"$what: our decode"))
    val io = PixelDecode.decodeImageIo(png)
      .getOrElse(fail(s"$what: ImageIO"))
    assert(ours.width === io.width && ours.height === io.height, what)
    assert(ours.rgb.toSeq === io.rgb.toSeq, what)
  }

  test("rgb8 / gray8 / opaque-rgba8: interlaced and sequential " +
    "streams decode EXACTLY equal to ImageIO") {
    val w = 21
    val h = 13 // odd dims exercise every Adam7 edge pass
    val rgb = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val argb = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    val gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 31) % 256
      rgb.setRGB(x, y, (v << 16) | ((255 - v) << 8) | ((x * y) % 256))
      argb.setRGB(x, y, 0xff000000 | (v << 16) | (v << 8) | (x % 256))
      gray.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    for (il <- Seq(false, true)) {
      val p1 = writePng(rgb, il)
      assert(ihdr(p1) === ((8, 2, if (il) 1 else 0)), "rgb ihdr")
      exact(p1, s"rgb8 il=$il")
      val p2 = writePng(argb, il)
      assert(ihdr(p2)._2 === 6, "rgba ihdr")
      exact(p2, s"rgba8 il=$il")
      val p3 = writePng(gray, il)
      assert(ihdr(p3) === ((8, 0, if (il) 1 else 0)), "gray ihdr")
      exact(p3, s"gray8 il=$il")
    }
  }

  test("palette depths 1/2/4/8 (IndexColorModel sizes 2/4/16/256), " +
    "interlaced and sequential: exact vs ImageIO") {
    for ((n, wantDepth) <- Seq((2, 1), (4, 2), (16, 4), (256, 8));
        il <- Seq(false, true)) {
      val r = new Array[Byte](n)
      val g = new Array[Byte](n)
      val b = new Array[Byte](n)
      for (i <- 0 until n) {
        r(i) = ((i * 37 + 11) % 256).toByte
        g(i) = ((i * 91 + 3) % 256).toByte
        b(i) = ((i * 53 + 200) % 256).toByte
      }
      val icm = new IndexColorModel(wantDepth, n, r, g, b)
      // sub-byte palettes need a BINARY (1/2/4-bit) raster — an
      // INDEXED BufferedImage is byte-per-pixel and the PNG writer
      // mirrors the raster's bit size into the IHDR
      val img = new BufferedImage(19, 11,
        if (n < 256) BufferedImage.TYPE_BYTE_BINARY
        else BufferedImage.TYPE_BYTE_INDEXED, icm)
      for (y <- 0 until 11; x <- 0 until 19) {
        val i = (x + y * 3) % n
        img.setRGB(x, y, ((r(i) & 0xff) << 16) | ((g(i) & 0xff) << 8)
          | (b(i) & 0xff))
      }
      val png = writePng(img, il)
      val (d, ct, ilf) = ihdr(png)
      assert(ct === 3 && ilf === (if (il) 1 else 0), s"palette $n")
      assert(d === wantDepth, s"palette $n depth")
      exact(png, s"palette$n il=$il")
    }
  }

  test("16-bit gray (values g*257 so both 8-bit reductions agree): " +
    "exact vs ImageIO, interlaced and sequential") {
    val img = new BufferedImage(17, 9,
      BufferedImage.TYPE_USHORT_GRAY)
    val raster = img.getRaster
    for (y <- 0 until 9; x <- 0 until 17)
      raster.setSample(x, y, 0, ((x * 13 + y * 5) % 256) * 257)
    for (il <- Seq(false, true)) {
      val png = writePng(img, il)
      assert(ihdr(png) === ((16, 0, if (il) 1 else 0)), "ihdr16")
      exact(png, s"gray16 il=$il")
    }
  }

  test("hand-built from-the-spec Adam7 gray depth-2 stream: our " +
    "decode == ImageIO == the constructed truth") {
    val w = 5
    val h = 3
    def v(x: Int, y: Int): Int = (x + y) % 4
    // Adam7 pass geometry per the spec
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
      (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val scan = new ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = (w - x0 + dx - 1) / dx
      val ph = (h - y0 + dy - 1) / dy
      if (pw > 0 && ph > 0) {
        for (py <- 0 until ph) {
          scan.write(0) // filter: none
          var acc = 0
          var nb = 0
          for (px <- 0 until pw) {
            acc = (acc << 2) | v(x0 + px * dx, y0 + py * dy)
            nb += 2
            if (nb == 8) { scan.write(acc); acc = 0; nb = 0 }
          }
          if (nb > 0) scan.write(acc << (8 - nb))
        }
      }
    }
    val idat = {
      val d = new java.util.zip.Deflater()
      d.setInput(scan.toByteArray)
      d.finish()
      val buf = new Array[Byte](256)
      val o = new ByteArrayOutputStream()
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      o.toByteArray
    }
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(name: String, data: Array[Byte]): Unit = {
      def be32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      out.write(be32(data.length))
      val nd = name.getBytes("US-ASCII") ++ data
      out.write(nd)
      val crc = new java.util.zip.CRC32()
      crc.update(nd)
      out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", Array[Byte](0, 0, 0, w.toByte, 0, 0, 0, h.toByte,
      2 /*depth*/, 0 /*gray*/, 0, 0, 1 /*Adam7*/))
    chunk("IDAT", idat)
    chunk("IEND", Array.empty)
    val png = out.toByteArray
    val want = (0 until h).flatMap(y => (0 until w).map { x =>
      val g = v(x, y) * 85 // 255 / (2^2 - 1)
      (g << 16) | (g << 8) | g
    })
    val ours = PixelDecode.decodePngPure(png).getOrElse(fail("ours"))
    assert(ours.rgb.toSeq === want)
    val io = PixelDecode.decodeImageIo(png).getOrElse(fail("ImageIO"))
    assert(io.rgb.toSeq === want)
  }

  test("hostility: truncation and bit damage on an interlaced " +
    "stream — None or a decode, never a throw") {
    val img = new BufferedImage(9, 7, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 7; x <- 0 until 9)
      img.setRGB(x, y, (x * 40 << 16) | (y * 36 << 8))
    val png = writePng(img, interlaced = true)
    (0 until png.length by 7).foreach { n =>
      PixelDecode.decodePngPure(png.take(n))
    }
    val rnd = new scala.util.Random(5)
    (1 to 300).foreach { _ =>
      val m = png.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      PixelDecode.decodePngPure(m)
    }
  }
}
