package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Animated-GIF decode (PixelDecode.gifFrames) + the GIF shingle
  * kernel: encode->decode roundtrips, GIF89a compositing semantics
  * (disposal, transparency, frame rects), hostility, and MP4/GIF
  * fingerprint convergence — the same frames must shingle identically
  * through either container.
  */
class GifAnimSpec extends AnyFunSuite {

  private def grayFrame(seed: Int): Array[Int] =
    Array.tabulate(72)(i => (seed * 37 + i * 11 + (i * i) % 13) % 200)

  test("encodeGifGrayAnimated -> gifFrames is a pixel-exact " +
    "roundtrip, incl. frames wider than one LZW clear span") {
    val frames = (0 until 5).map(grayFrame)
    val gif = PixelDecode.encodeGifGrayAnimated(9, 8, frames)
    val got = PixelDecode.gifFrames(gif).get
    assert(got.length === 5)
    got.zip(frames).foreach { case (px, f) =>
      assert(px.width === 9 && px.height === 8)
      assert(PixelDecode.grayLuma(px).toSeq === f.toSeq)
    }
    // > 250 pixels per frame crosses the encoder's clear cadence
    val big = Array.tabulate(32 * 32)(i => i % 251)
    val bgif = PixelDecode.encodeGifGrayAnimated(32, 32, Seq(big))
    assert(PixelDecode.grayLuma(
      PixelDecode.gifFrames(bgif).get.head).toSeq === big.toSeq)
    // single-frame agreement with the first-frame decoder
    assert(PixelDecode.decodeGifPure(bgif).get.rgb.toSeq ===
      PixelDecode.gifFrames(bgif).get.head.rgb.toSeq)
  }

  test("GIF89a compositing semantics: transparency holds the prior " +
    "canvas, disposal 2 restores background, disposal 3 restores " +
    "the previous frame, rects composite at (left, top)") {
    // hand-built 2x2 stream: GCT = [black, white, red, blue], bg = 0
    def le(v: Int) = Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def lzwLiterals(pixels: Seq[Int]): Seq[Byte] = {
      // 3-bit roots -> minCode 2, clear 4, eoi 5, 3-bit codes
      val bits = new scala.collection.mutable.ArrayBuffer[Byte]()
      var cur = 0; var nb = 0
      def put(c: Int, width: Int): Unit = {
        cur |= c << nb; nb += width
        while (nb >= 8) { bits += (cur & 0xff).toByte; cur >>= 8; nb -= 8 }
      }
      put(4, 3) // clear
      var width = 3
      var next = 6
      var first = true
      pixels.foreach { p =>
        put(p, width)
        // the decoder adds NO table entry for the first post-clear
        // code; afterwards one per code, widening when full
        if (!first) {
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        } else first = false
      }
      put(5, width) // eoi
      if (nb > 0) bits += (cur & 0xff).toByte
      bits.toSeq
    }
    def img(left: Int, top: Int, w: Int, h: Int,
        pixels: Seq[Int]): Seq[Byte] = {
      val lzw = lzwLiterals(pixels)
      Seq(0x2c.toByte) ++ le(left) ++ le(top) ++ le(w) ++ le(h) ++
        Seq(0.toByte, 2.toByte, lzw.length.toByte) ++ lzw :+ 0.toByte
    }
    def gce(disposal: Int, transparent: Int): Seq[Byte] =
      Seq(0x21.toByte, 0xf9.toByte, 4.toByte,
        (((disposal & 7) << 2) | (if (transparent >= 0) 1 else 0)).toByte,
        0.toByte, 0.toByte,
        (if (transparent >= 0) transparent else 0).toByte, 0.toByte)
    val header: Seq[Byte] =
      "GIF89a".getBytes("US-ASCII").toSeq ++ le(2) ++ le(2) ++
        Seq((0x80 | 0x01).toByte, 0.toByte, 0.toByte) ++ // 4-entry GCT
        Seq(0, 0, 0, 255, 255, 255, 255, 0, 0, 0, 0, 255)
          .map(_.toByte)
    val black = 0; val white = 0xffffff; val red = 0xff0000
    val blue = 0x0000ff
    // f1: full white; f2 (disposal 2): red top-left 1x1, transparent
    // elsewhere? -> 1x1 rect only; f3 after disposal-2: bg-restored
    // rect, then a transparent full-frame (holds canvas); f4
    // (disposal 3 on f3's result) ... build and check step by step
    val stream = header ++
      gce(1, -1) ++ img(0, 0, 2, 2, Seq(1, 1, 1, 1)) ++ // all white
      gce(2, -1) ++ img(0, 0, 1, 1, Seq(2)) ++ // red px, then bg-restore
      gce(3, -1) ++ img(1, 1, 1, 1, Seq(3)) ++ // blue px, then undo
      gce(1, 1) ++ img(0, 0, 2, 2, Seq(2, 1, 1, 1)) :+ // white transparent
      0x3b.toByte
    val fr = PixelDecode.gifFrames(stream.toArray).get
    assert(fr.length === 4)
    assert(fr(0).rgb.toSeq === Seq(white, white, white, white))
    // f2: red composited at (0,0) over the held white canvas
    assert(fr(1).rgb.toSeq === Seq(red, white, white, white))
    // f3: disposal 2 restored BLACK bg at (0,0), blue lands at (1,1)
    assert(fr(2).rgb.toSeq === Seq(black, white, white, blue))
    // f4: disposal 3 undid the blue; index 1 (white) is transparent,
    // so only the red at (0,0) lands and white cells hold the canvas
    assert(fr(3).rgb.toSeq === Seq(red, white, white, white))
  }

  test("hostility: truncation at every prefix, rect outside the " +
    "screen, and fuzz never throw; trailer required") {
    val gif = PixelDecode.encodeGifGrayAnimated(9, 8,
      (0 until 3).map(grayFrame))
    (0 until gif.length by 5).foreach { n =>
      assert(PixelDecode.gifFrames(gif.take(n)) === None, s"prefix $n")
    }
    val rnd = new scala.util.Random(17)
    (1 to 300).foreach { _ =>
      val m = gif.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      PixelDecode.gifFrames(m) // must not throw
    }
    assert(PixelDecode.gifFrames("GIF89a junk".getBytes) === None)
    assert(PixelDecode.gifFrames(Array.empty[Byte]) === None)
  }

  test("gifShingleRows: GIF and MP4 containers of the SAME frames " +
    "yield identical shingle keys; truncated GIFs emit nothing") {
    val frames = (0 until 8).map(grayFrame)
    val gif = PixelDecode.encodeGifGrayAnimated(9, 8, frames)
    val mp4 = VideoHeader.synthesizeMp4WithSamples("mp42", 600,
      frames.length * 100L,
      VideoHeader.TrackSpec("vide", "avc1", 9, 8, 600,
        frames.length * 100L),
      frames.map(f => PixelDecode.encodePngGray(9, 8, f.toArray)),
      100, samplesPerChunk = 3)
    val g = Multimodal.gifShingleRows(gif, 3)
    val v = Multimodal.videoShingleRows(mp4, 3)
    assert(g.nonEmpty)
    assert(g.toSeq === v.toSeq) // cross-container fingerprint parity
    assert(Multimodal.gifShingleRows(gif.take(50), 3) === Seq.empty)
    assert(Multimodal.gifShingleRows(mp4, 3) === Seq.empty) // not a GIF
  }
}
