package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Animated-PNG decode (PixelDecode.apngFrames) — acTL/fcTL/fdAT
  * roundtrips, compositing semantics on hand-built streams, and the
  * three-container fingerprint convergence: APNG, GIF, and MP4 of the
  * same frames must shingle identically.
  */
class ApngSpec extends AnyFunSuite {

  private def grayFrame(seed: Int): Array[Int] =
    Array.tabulate(72)(i => (seed * 41 + i * 13 + (i * i) % 19) % 200)

  test("encodeApngGray -> apngFrames is a pixel-exact roundtrip") {
    val frames = (0 until 5).map(grayFrame)
    val apng = PixelDecode.encodeApngGray(9, 8, frames)
    val got = PixelDecode.apngFrames(apng).get
    assert(got.length === 5)
    got.zip(frames).foreach { case (px, f) =>
      assert(px.width === 9 && px.height === 8)
      assert(PixelDecode.grayLuma(px).toSeq === f.toSeq)
    }
    // a still PNG (no acTL) is NOT an animation; the still decoder
    // ignores APNG chunks and yields frame 1 (the default image)
    val still = PixelDecode.encodePngGray(9, 8, frames.head.toArray)
    assert(PixelDecode.apngFrames(still) === None)
    assert(PixelDecode.grayLuma(
      PixelDecode.decodePngPure(apng).get).toSeq === frames.head.toSeq)
  }

  test("compositing semantics on a hand-built stream: frame rects at " +
    "(x, y), dispose 1 clears to black, dispose 2 restores previous") {
    // canvas 2x2 gray; frames carry their own IDAT-shaped zlib data
    def be32(v: Long) = Seq((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(ctype: String, data: Seq[Byte]): Seq[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(ctype.getBytes("US-ASCII"))
      crc.update(data.toArray)
      be32(data.length.toLong) ++ ctype.getBytes("US-ASCII").toSeq ++
        data ++ be32(crc.getValue)
    }
    def z(raw: Seq[Byte]): Seq[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw.toArray); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray.toSeq
    }
    def fctl(seq: Int, w: Int, h: Int, x: Int, y: Int,
        dispose: Int): Seq[Byte] =
      chunk("fcTL", be32(seq.toLong) ++ be32(w.toLong) ++ be32(h.toLong) ++
        be32(x.toLong) ++ be32(y.toLong) ++
        Seq[Byte](0, 1, 0, 10, dispose.toByte, 0))
    val sig = Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = chunk("IHDR",
      be32(2) ++ be32(2) ++ Seq[Byte](8, 0, 0, 0, 0))
    // frame 1: full 2x2 of 100s (dispose 0); frame 2: 1x1 of 200 at
    // (1,0), dispose 1 (clear rect to black); frame 3: 1x1 of 50 at
    // (0,1), dispose 2 (restore); frame 4: full canvas of 10s
    val f1 = z(Seq[Byte](0, 100, 100, 0, 100, 100))
    val f2 = z(Seq[Byte](0, 200.toByte))
    val f3 = z(Seq[Byte](0, 50))
    val f4 = z(Seq[Byte](0, 10, 10, 0, 10, 10))
    val stream = sig ++ ihdr ++ chunk("acTL", be32(4) ++ be32(0)) ++
      fctl(0, 2, 2, 0, 0, 0) ++ chunk("IDAT", f1) ++
      fctl(1, 1, 1, 1, 0, 1) ++ chunk("fdAT", be32(2) ++ f2) ++
      fctl(3, 1, 1, 0, 1, 2) ++ chunk("fdAT", be32(4) ++ f3) ++
      fctl(5, 2, 2, 0, 0, 0) ++ chunk("fdAT", be32(6) ++ f4) ++
      chunk("IEND", Nil)
    val fr = PixelDecode.apngFrames(stream.toArray).get
    assert(fr.length === 4)
    def grays(p: PixelDecode.Pixels) = PixelDecode.grayLuma(p).toSeq
    assert(grays(fr(0)) === Seq(100, 100, 100, 100))
    assert(grays(fr(1)) === Seq(100, 200, 100, 100)) // rect at (1,0)
    // dispose 1 cleared (1,0) to black before frame 3's rect at (0,1)
    assert(grays(fr(2)) === Seq(100, 0, 50, 100))
    // dispose 2 undid frame 3; frame 4 overwrites the full canvas
    assert(grays(fr(3)) === Seq(10, 10, 10, 10))
  }

  test("hostility: truncation, sequence-number disorder, frame-count " +
    "mismatch, out-of-canvas rects -> None; fuzz never throws") {
    val apng = PixelDecode.encodeApngGray(9, 8, (0 until 3).map(grayFrame))
    (0 until apng.length by 7).foreach { n =>
      assert(PixelDecode.apngFrames(apng.take(n)) === None, s"prefix $n")
    }
    val rnd = new scala.util.Random(23)
    (1 to 300).foreach { _ =>
      val m = apng.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      PixelDecode.apngFrames(m) // must not throw
    }
    assert(PixelDecode.apngFrames("not a png".getBytes) === None)
  }

  test("three containers, one fingerprint: APNG, GIF, and MP4 of the " +
    "SAME frames yield identical shingles") {
    val frames = (0 until 8).map(grayFrame)
    val apng = PixelDecode.encodeApngGray(9, 8, frames)
    val gif = PixelDecode.encodeGifGrayAnimated(9, 8, frames)
    val mp4 = VideoHeader.synthesizeMp4WithSamples("mp42", 600,
      frames.length * 100L,
      VideoHeader.TrackSpec("vide", "avc1", 9, 8, 600,
        frames.length * 100L),
      frames.map(f => PixelDecode.encodePngGray(9, 8, f.toArray)),
      100, samplesPerChunk = 3)
    val a = Multimodal.apngShingleRows(apng, 3)
    val g = Multimodal.gifShingleRows(gif, 3)
    val v = Multimodal.videoShingleRows(mp4, 3)
    assert(a.nonEmpty && a.toSeq === g.toSeq && a.toSeq === v.toSeq)
    assert(Multimodal.apngShingleRows(gif, 3) === Seq.empty)
  }
}
