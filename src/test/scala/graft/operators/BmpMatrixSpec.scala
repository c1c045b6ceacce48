package graft.operators

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

/** decodeBmpPure across the classic BMP matrix: 1/4/8-bit palette,
  * 16-bit X1R5G5B5, 24/32-bit, and the RLE8/RLE4 compressions —
  * hand-built from the format description, decoded by our engine
  * AND the JDK's BMP reader, pinned to the constructed truth.
  */
class BmpMatrixSpec extends AnyFunSuite {

  private def bmp(w: Int, h: Int, bpp: Int, compression: Int,
      palette: Seq[Int], data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
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

  /** Decode with both engines; both must agree with `want` (rows
    * top-down).
    */
  private def pin(png: Array[Byte], w: Int, h: Int,
      want: Seq[Int], what: String): Unit = {
    val ours = PixelDecode.decodeBmpPure(png)
      .getOrElse(fail(s"$what: ours"))
    assert(ours.width === w && ours.height === h, what)
    assert(ours.rgb.toSeq === want, s"$what: ours vs truth")
    val io = PixelDecode.decodeImageIo(png)
      .getOrElse(fail(s"$what: ImageIO"))
    assert(io.rgb.toSeq === want, s"$what: ImageIO vs truth")
  }

  test("1-bit and 4-bit palette rows (MSB-first packed, 4-byte " +
    "padded), bottom-up") {
    // 1-bit, 10x2: top row pattern 1010101010, bottom 1111100000
    val pal1 = Seq(0x112233, 0xddeeff)
    def packBits(bits: Seq[Int]): Array[Byte] = {
      val row = new Array[Byte](4) // 10 bits -> 2 bytes -> pad to 4
      bits.zipWithIndex.foreach { case (v, i) =>
        if (v != 0) row(i / 8) = (row(i / 8) | (0x80 >> (i % 8))).toByte
      }
      row
    }
    val top = Seq(1, 0, 1, 0, 1, 0, 1, 0, 1, 0)
    val bot = Seq(1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
    val data1 = packBits(bot) ++ packBits(top) // bottom-up on disk
    val want1 = (top ++ bot).map(pal1(_))
    pin(bmp(10, 2, 1, 0, pal1, data1), 10, 2, want1, "1-bit")
    // 4-bit, 5x2: nibbles MSB-first, 3 bytes used -> pad to 4
    val pal4 = (0 until 16).map(i => i * 0x111111 & 0xffffff)
    val top4 = Seq(1, 15, 3, 7, 9)
    val bot4 = Seq(0, 2, 4, 6, 8)
    def packNibbles(ns: Seq[Int]): Array[Byte] = {
      val row = new Array[Byte](4)
      ns.zipWithIndex.foreach { case (v, i) =>
        val sh = if (i % 2 == 0) 4 else 0
        row(i / 2) = (row(i / 2) | (v << sh)).toByte
      }
      row
    }
    val want4 = (top4 ++ bot4).map(pal4(_))
    pin(bmp(5, 2, 4, 0, pal4, packNibbles(bot4) ++ packNibbles(top4)),
      5, 2, want4, "4-bit")
  }

  test("16-bit X1R5G5B5 with round-scaling expansion") {
    // 3x1: saturated red, mid gray (16,16,16), white
    def px(r: Int, g: Int, b: Int): Seq[Byte] = {
      val v = (r << 10) | (g << 5) | b
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    }
    val data = (px(31, 0, 0) ++ px(16, 16, 16) ++ px(31, 31, 31) ++
      Seq(0.toByte, 0.toByte)).toArray // pad 6 -> 8
    def s5(c: Int) = (c * 255 + 15) / 31
    val want = Seq(0xff0000,
      (s5(16) << 16) | (s5(16) << 8) | s5(16), 0xffffff)
    pin(bmp(3, 1, 16, 0, Seq.empty, data), 3, 1, want, "16-bit")
  }

  test("RLE8: encoded runs, absolute mode with word padding, EOL, " +
    "delta skip (undrawn cells keep color 0), EOB") {
    val pal = Seq(0x000000, 0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    // 6x3 bottom-up construction:
    // bottom row: run 4 of idx1, run 2 of idx2, EOL
    // middle row: absolute run of 3 (3,4,1) + pad, delta (2,1)
    // (skips to the top row), then run 1 of idx2, EOB
    val data = Array[Byte](
      4, 1, 2, 2, 0, 0, // bottom row + EOL
      0, 3, 3, 4, 1, 0, // absolute 3: idx 3,4,1 (+1 pad byte)
      0, 2, 2, 1, // delta: dx=2 dy=1 -> lands on top row x=5
      1, 2, // run 1 of idx2 at (top, x=5)
      0, 1) // end of bitmap
    val want = Seq(
      0, 0, 0, 0, 0, 2, // top row: delta left cells undrawn
      3, 4, 1, 0, 0, 0, // middle row
      1, 1, 1, 1, 2, 2).map(pal(_)) // bottom row
    pin(bmp(6, 3, 8, 1, pal, data), 6, 3, want, "rle8")
  }

  test("RLE4: nibble runs alternate the two packed indices; " +
    "absolute mode packs nibbles word-aligned") {
    val pal = (0 until 16).map(i => i * 0x101010 & 0xffffff)
    // 6x2 bottom-up:
    // bottom: run 5 of byte 0x1f -> 1,15,1,15,1 then run 1 idx 2, EOL
    // top: absolute 4 nibbles (0xab, 0xcd -> 10,11,12,13) pad to
    // word, then run 2 of 0x77, EOB
    val data = Array[Byte](
      5, 0x1f, 1, 0x22, 0, 0, // run values pack TWO nibbles
      0, 4, 0xab.toByte, 0xcd.toByte, // 2 bytes used -> already even
      2, 0x77, 0, 1)
    val want = (Seq(10, 11, 12, 13, 7, 7) ++
      Seq(1, 15, 1, 15, 1, 2)).map(pal(_))
    pin(bmp(6, 2, 4, 2, pal, data), 6, 2, want, "rle4")
  }

  test("hostility: truncation and bit damage over every variant — " +
    "None or pixels, never a throw; runaway RLE cursors bounded") {
    val pal = (0 until 16).map(i => i * 0x111111 & 0xffffff)
    val base = bmp(6, 3, 8, 1, pal,
      Array[Byte](4, 1, 2, 2, 0, 0, 0, 3, 3, 4, 1, 0, 0, 1))
    (0 until base.length by 3).foreach { n =>
      PixelDecode.decodeBmpPure(base.take(n))
    }
    val rnd = new scala.util.Random(41)
    (1 to 400).foreach { _ =>
      val m = base.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      PixelDecode.decodeBmpPure(m) // never throws
    }
    // an RLE stream that never ends must not loop forever
    val runaway = bmp(4, 2, 8, 1, pal,
      Array.fill(64)(Array[Byte](0, 0)).flatten)
    assert(PixelDecode.decodeBmpPure(runaway) === None)
  }
}
