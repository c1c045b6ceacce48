package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** OggHeader (RFC 3533 page walk + Opus/Vorbis id headers, CRC
  * verified) and AudioHeader.id3TextFrames (the MP3 -> text bridge).
  */
class OggId3Spec extends AnyFunSuite {

  test("Ogg Opus roundtrip: codec fields, terminal granule, pre-skip " +
    "duration, page count; multi-segment lacing") {
    val ogg = OggHeader.synthesizeOggOpus(2, 312, 48000,
      Seq(960L, 1920L, 2880L))
    val i = OggHeader.parse(ogg).get
    assert(i.codec === "opus")
    assert(i.channels === 2)
    assert(i.sampleRate === 48000)
    assert(i.preSkip === 312)
    assert(i.lastGranule === 2880L)
    assert(i.durationMs === (2880L - 312) * 1000 / 48000)
    assert(i.nPages === 5) // OpusHead + OpusTags + 3 audio pages
    // payload > 255 bytes exercises the 255+tail lacing, and an
    // exact multiple of 255 requires the trailing 0 segment
    for (len <- Seq(300, 510)) {
      val big = OggHeader.synthesizeOggOpus(1, 0, 48000,
        Seq(960L), payloadLen = len)
      assert(OggHeader.parse(big).get.lastGranule === 960L, s"len $len")
    }
  }

  test("Ogg Vorbis roundtrip: rate-based duration") {
    val ogg = OggHeader.synthesizeOggVorbis(1, 44100,
      Seq(4410L, 22050L))
    val i = OggHeader.parse(ogg).get
    assert(i.codec === "vorbis")
    assert(i.channels === 1)
    assert(i.sampleRate === 44100)
    assert(i.lastGranule === 22050L)
    assert(i.durationMs === 500L)
    assert(i.nPages === 3)
  }

  test("Ogg hostility: CRC damage, truncation, unknown codec, " +
    "missing EOS -> None; fuzz never throws") {
    val ogg = OggHeader.synthesizeOggOpus(1, 0, 48000, Seq(960L, 1920L))
    // flip one payload byte: the page CRC must catch it
    val dmg = ogg.clone()
    dmg(dmg.length - 3) = (dmg(dmg.length - 3) ^ 0x20).toByte
    assert(OggHeader.parse(dmg) === None)
    (0 until ogg.length by 7).foreach { n =>
      assert(OggHeader.parse(ogg.take(n)) === None, s"prefix $n")
    }
    // a stream that never flags end-of-stream is incomplete
    val noEos = OggHeader.synthesizeOggOpus(1, 0, 48000, Seq(960L, 1920L))
    val cut = noEos.take(noEos.length -
      (27 + 1 + 120)) // drop the final (EOS) page entirely
    assert(OggHeader.parse(cut) === None)
    val rnd = new scala.util.Random(29)
    (1 to 300).foreach { _ =>
      val m = ogg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      OggHeader.parse(m) // must not throw
    }
    assert(OggHeader.parse("OggS but not really".getBytes) === None)
    assert(OggHeader.parse(Array.empty[Byte]) === None)
  }

  test("Ogg-FLAC: reassembled payload decodes to the SAME samples as " +
    "the raw FLAC stream, across packet/page geometries") {
    val tone: Array[Short] =
      Array.tabulate(900)(i => (math.sin(i * 0.06) * 11000).toShort)
    val flac = FlacDecode.synthesizeFlacPcm16(8000, tone,
      blockSize = 192, subframe = "lpc4")
    val want = FlacDecode.decode(flac).get.samples.toSeq
    // small audioChunk + tiny pages force packets to SPAN page
    // boundaries (continuation flag); large ones keep pages whole
    for ((chunk, segs) <- Seq((1000, 16), (333, 2), (255, 1),
        (64, 50), (flac.length, 16))) {
      val ogg = OggHeader.synthesizeOggFlac(flac, chunk, segs)
      val re = OggHeader.oggFlacStream(ogg).getOrElse(
        fail(s"reassembly failed chunk=$chunk segs=$segs"))
      assert(FlacDecode.decode(re).get.samples.toSeq === want,
        s"chunk=$chunk segs=$segs")
      // the page-level parse also identifies the codec + duration
      val i = OggHeader.parse(ogg).get
      assert(i.codec === "flac" && i.sampleRate === 8000 &&
        i.lastGranule === 900L, s"chunk=$chunk segs=$segs")
    }
    // the one audio kernel: .oga blobs get the .flac twin's numbers
    val ogg = OggHeader.synthesizeOggFlac(flac)
    val of = Multimodal.audioFeaturesOf(ogg)
    val ff = Multimodal.audioFeaturesOf(flac)
    assert(of.a_format === "ogg-flac" && ff.a_format === "flac")
    assert((of.n_samples, of.duration_ms, of.peak, of.rms_x1000,
      of.n_clipped) ===
      ((ff.n_samples, ff.duration_ms, ff.peak, ff.rms_x1000,
        ff.n_clipped)))
    // hostility: CRC damage in any page, truncation, and a non-FLAC
    // Ogg stream all return None; fuzz never throws
    val dmg = ogg.clone()
    dmg(dmg.length - 3) = (dmg(dmg.length - 3) ^ 0x20).toByte
    assert(OggHeader.oggFlacStream(dmg) === None)
    (0 until ogg.length by 11).foreach { n =>
      assert(OggHeader.oggFlacStream(ogg.take(n)) === None, s"pfx $n")
    }
    assert(OggHeader.oggFlacStream(
      OggHeader.synthesizeOggOpus(1, 0, 48000, Seq(960L))) === None)
    val rnd = new scala.util.Random(31)
    (1 to 200).foreach { _ =>
      val m = ogg.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      OggHeader.oggFlacStream(m).foreach { re =>
        // any surviving mutation must still decode to the original
        // or fail FLAC's own CRCs — never different samples
        FlacDecode.decode(re).foreach(d =>
          assert(d.samples.toSeq === want))
      }
    }
  }

  test("ID3v2.2 tags, whole-tag unsynchronisation, and extended " +
    "headers: 6-byte frames + PIC art, FF-stuffed tags de-unsync " +
    "exactly, ext headers are skipped, v2.4 unsync stays out") {
    import AudioHeader._
    // v2.2: 3-char ids, 3-byte sizes, PIC picture frames
    val png = Array.tabulate[Byte](40)(i => (i * 7 - 100).toByte)
    val t22 = synthesizeId3v2(
      Seq("TT2" -> "old title", "TP1" -> "artist"),
      major = 2, apic = Seq(("image/png", 3, png)))
    assert(id3TextFrames(t22) ===
      Seq("TT2" -> "old title", "TP1" -> "artist"))
    val Seq((mime22, tp22, img22)) = id3ApicFrames(t22)
    assert(mime22 === "image/png" && tp22 === 3 &&
      img22.toSeq === png.toSeq)
    // whole-tag unsync: picture data full of FF bytes (the case the
    // stuffing exists for) must de-unsync to the exact payload
    val ffpng = Array.tabulate[Byte](64)(i =>
      if (i % 3 == 0) 0xff.toByte else i.toByte)
    for (major <- Seq(2, 3)) {
      val tid = if (major == 2) "TT2" else "TIT2"
      val tu = synthesizeId3v2(Seq(tid -> s"u$major"), major = major,
        apic = Seq(("image/png", 3, ffpng)), unsync = true)
      assert((tu(5) & 0x80) !== 0, s"v2.$major unsync flag set")
      assert(id3TextFrames(tu) === Seq(tid -> s"u$major"),
        s"v2.$major text under unsync")
      val Seq((m, t, img)) = id3ApicFrames(tu)
      assert(m === "image/png" && t === 3 &&
        img.toSeq === ffpng.toSeq, s"v2.$major art under unsync")
      // the stuffed body really differs from the unstuffed tag
      val plain = synthesizeId3v2(Seq(tid -> s"u$major"),
        major = major, apic = Seq(("image/png", 3, ffpng)))
      assert(tu.length > plain.length)
    }
    // v2.3 extended header: 4-byte size (excluding itself) + data,
    // skipped by declared size
    val base = synthesizeId3v2(Seq("TIT2" -> "ext"), major = 3)
    val body = Array[Byte](0, 0, 0, 6, 0, 0, 0, 0, 0, 0) ++ base.drop(10)
    val sz = body.length
    val tagged = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0x40.toByte,
        ((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
        ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte) ++ body
    assert(id3TextFrames(tagged) === Seq("TIT2" -> "ext"))
    // v2.4's flag means PER-FRAME unsync — still skipped, not mangled
    val t4 = synthesizeId3v2(Seq("TIT2" -> "x"), major = 4)
    val t4u = t4.clone(); t4u(5) = 0x80.toByte
    assert(id3TextFrames(t4u) === Seq.empty)
    // fuzz: arbitrary corruption never throws
    val rnd = new scala.util.Random(41)
    val tu3 = synthesizeId3v2(Seq("TIT2" -> "z"), major = 3,
      apic = Seq(("image/png", 3, ffpng)), unsync = true)
    (1 to 200).foreach { _ =>
      val m = tu3.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      id3TextFrames(m); id3ApicFrames(m)
    }
  }

  test("id3TextFrames: v2.3 and v2.4 roundtrips, padding, non-text " +
    "and UTF-16 frames skipped, hostile tags empty") {
    import AudioHeader._
    val frames = Seq("TIT2" -> "A Title", "TPE1" -> "Some Artist",
      "TALB" -> "ål bûm") // UTF-8 beyond latin1
    for (major <- Seq(3, 4); pad <- Seq(0, 37)) {
      val tag = synthesizeId3v2(frames, major, pad)
      assert(id3TextFrames(tag) === frames, s"v2.$major pad $pad")
      // prepended to a real MP3 body: the frame walk still skips the
      // tag by its syncsafe size and the text bridge still reads it
      val mp3 = tag ++ synthesizeMp3(mpeg1 = true, brIdx = 9,
        srIdx = 0, mono = true, nFrames = 3)
      assert(id3TextFrames(mp3) === frames)
      assert(parseMp3(mp3).get.nFrames === 3)
    }
    // a UTF-16 text frame (encoding 1) is skipped, not mangled:
    // hand-build one v2.3 frame with encoding byte 1
    val utf16Payload = Array[Byte](1, 0xff.toByte, 0xfe.toByte, 65, 0)
    val one = "TIT2".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, utf16Payload.length.toByte, 0, 0) ++
      utf16Payload
    val tag16 = "ID3".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 0, 0, one.length.toByte) ++ one
    assert(AudioHeader.id3TextFrames(tag16) === Seq.empty)
    // hostility: truncation and garbage
    val t = synthesizeId3v2(frames)
    (0 until t.length by 3).foreach { n =>
      AudioHeader.id3TextFrames(t.take(n)) // never throws
    }
    assert(AudioHeader.id3TextFrames("no tag here".getBytes) === Seq.empty)
    assert(AudioHeader.id3TextFrames(Array.empty[Byte]) === Seq.empty)
  }
}
