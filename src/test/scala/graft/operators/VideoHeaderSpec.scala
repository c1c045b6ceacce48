package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VideoHeader (pure-JVM ISO-BMFF/MP4 box walk). Fixture bytes are
  * synthesized by VideoHeader.synthesizeMp4, whose layout is the
  * spec's executable statement of the box grammar; hand-pinned byte
  * offsets below guard the synthesizer and the parser against agreeing
  * on a shared mistake.
  */
class VideoHeaderSpec extends AnyFunSuite {

  private def fixture: Array[Byte] = VideoHeader.synthesizeMp4(
    brand = "mp42", timescale = 600, duration = 1800,
    tracks = Seq(
      VideoHeader.TrackSpec("vide", "avc1", 640, 360, 600, 1800),
      VideoHeader.TrackSpec("soun", "mp4a", 0, 0, 48000, 144000)),
    mdatPayload = Array.fill[Byte](32)(7))

  test("synthesized MP4 layout matches the box grammar byte-for-byte") {
    val b = fixture
    // first box: ftyp, size covers brand+minor+2 compatible brands
    assert(new String(b.slice(4, 8), "US-ASCII") === "ftyp")
    val ftypSize = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    assert(ftypSize === 8 + 4 + 4 + 8) // header + brand + minor + 2 brands
    assert(new String(b.slice(8, 12), "US-ASCII") === "mp42")
    // free box follows, then moov
    assert(new String(b.slice(ftypSize + 4, ftypSize + 8), "US-ASCII")
      === "free")
  }

  test("parse returns brand, movie clock, and both tracks in order") {
    val info = VideoHeader.parse(fixture).get
    assert(info.brand === "mp42")
    assert(info.timescale === 600L)
    assert(info.duration === 1800L)
    assert(info.durationMs === 3000L)
    assert(info.tracks.size === 2)
    val v = info.videoTracks.head
    assert(v.codec === "avc1")
    assert(v.width === 640 && v.height === 360)
    assert(v.timescale === 600L && v.duration === 1800L)
    assert(v.durationMs === 3000L)
    val a = info.audioTracks.head
    assert(a.codec === "mp4a")
    assert(a.width === 0 && a.height === 0)
    assert(a.timescale === 48000L && a.duration === 144000L)
    assert(a.durationMs === 3000L)
  }

  test("unknown boxes are skipped by size (udta in moov, skip at top)") {
    val b = fixture
    // splice a top-level 'skip' box between free and moov
    val ftypEnd = ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)
    val skip = Array[Byte](0, 0, 0, 13) ++ "skip".getBytes("US-ASCII") ++
      Array.fill[Byte](5)(9)
    val spliced = b.slice(0, ftypEnd) ++ skip ++ b.drop(ftypEnd)
    val info = VideoHeader.parse(spliced).get
    assert(info.brand === "mp42" && info.tracks.size === 2)
  }

  test("64-bit largesize box header is honored") {
    val b = fixture
    // rewrite the mdat (last box) to use size==1 + largesize
    val mdatStart = b.length - (8 + 32)
    assert(new String(b.slice(mdatStart + 4, mdatStart + 8), "US-ASCII")
      === "mdat")
    val payload = b.slice(mdatStart + 8, b.length)
    val large = Array[Byte](0, 0, 0, 1) ++ "mdat".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, (16 + payload.length).toByte) ++
      payload
    val rewritten = b.slice(0, mdatStart) ++ large
    assert(VideoHeader.parse(rewritten).isDefined)
  }

  test("size==0 (box extends to EOF) is honored for the final box") {
    val b = fixture
    val mdatStart = b.length - (8 + 32)
    val rewritten = b.clone()
    rewritten(mdatStart) = 0; rewritten(mdatStart + 1) = 0
    rewritten(mdatStart + 2) = 0; rewritten(mdatStart + 3) = 0
    assert(VideoHeader.parse(rewritten).map(_.tracks.size) === Some(2))
  }

  test("v1 mvhd/mdhd/tkhd (64-bit times) parse at their shifted offsets") {
    // hand-build a v1 moov: mvhd v1 ts@20 dur@24(8B)
    def beInt(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = beInt(v >> 32) ++ beInt(v & 0xffffffffL)
    def box(tp: String, body: Array[Byte]): Array[Byte] =
      beInt(body.length + 8L) ++ tp.getBytes("US-ASCII") ++ body
    val vf1 = Array[Byte](1, 0, 0, 0)
    val mvhd = box("mvhd", vf1 ++ be64(0) ++ be64(0) ++ beInt(1000) ++
      be64(5000) ++ Array.fill[Byte](80)(0))
    val tkhd = box("tkhd", vf1 ++ be64(0) ++ be64(0) ++ beInt(1) ++
      beInt(0) ++ be64(5000) ++ Array.fill[Byte](8 + 2 + 2 + 2 + 2 + 36)(0) ++
      beInt(320L << 16) ++ beInt(240L << 16))
    val mdhd = box("mdhd", vf1 ++ be64(0) ++ be64(0) ++ beInt(90000) ++
      be64(450000) ++ Array.fill[Byte](4)(0))
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0) ++ beInt(0) ++
      "vide".getBytes("US-ASCII") ++ Array.fill[Byte](13)(0))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ beInt(1) ++
      box("hev1", Array.fill[Byte](8)(0)))
    val minf = box("minf", box("stbl", stsd))
    val trak = box("trak", tkhd ++ box("mdia", mdhd ++ hdlr ++ minf))
    val moov = box("moov", mvhd ++ trak)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ beInt(0) ++
      "isom".getBytes("US-ASCII"))
    val info = VideoHeader.parse(ftyp ++ moov).get
    assert(info.timescale === 1000L && info.duration === 5000L)
    val t = info.tracks.head
    assert(t.width === 320 && t.height === 240)
    assert(t.timescale === 90000L && t.duration === 450000L)
    assert(t.codec === "hev1")
    assert(info.durationMs === 5000L && t.durationMs === 5000L)
  }

  test("sample tables roundtrip: stts/stsc/stsz/stco written then " +
    "demuxed give back the exact frame bytes, offsets, and dts") {
    val rnd = new scala.util.Random(3)
    val payloads = (0 until 11).map { i =>
      Array.fill[Byte](5 + i)((rnd.nextInt(256) - 128).toByte)
    }
    val mp4 = VideoHeader.synthesizeMp4WithSamples(
      "mp42", 600, 1100, VideoHeader.TrackSpec("vide", "avc1", 320, 240,
        90000, 11 * 3000), payloads, sampleDelta = 3000,
      samplesPerChunk = 4)
    val samples = VideoHeader.videoSamples(mp4).get
    assert(samples.size === 11)
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s.index === i)
      assert(s.size === payloads(i).length)
      assert(s.dts === i * 3000L)
      val got = mp4.slice(s.offset.toInt, s.offset.toInt + s.size)
      assert(got.toSeq === payloads(i).toSeq, s"sample $i bytes")
    }
    // the general metadata walk still reads the same file
    val info = VideoHeader.parse(mp4).get
    assert(info.videoTracks.head.codec === "avc1")
    assert(info.videoTracks.head.width === 320)
    // chunk geometry: 11 samples at 4/chunk -> 3 chunks; the second
    // chunk's first sample (index 4) starts exactly where stco says,
    // not merely contiguously after sample 3
    val within = samples.grouped(4).toSeq
    assert(within.size === 3 && within.last.size === 3)
  }

  test("stss/ctts roundtrip: sync flags follow the written sync table " +
    "(absent box = every sample sync), pts = dts + signed ctts offset") {
    val payloads = (0 until 9).map(i => Array.fill[Byte](6)(i.toByte))
    // b-frame-ish reordering: I P B pattern -> offsets 100, 200, -100
    val ctts = (0 until 9).map(i => Seq(100L, 200L, -100L)(i % 3))
    val mp4 = VideoHeader.synthesizeMp4WithSamples(
      "mp42", 600, 900, VideoHeader.TrackSpec("vide", "avc1", 64, 64,
        600, 900), payloads, sampleDelta = 100, samplesPerChunk = 4,
      syncSamples = Seq(1, 4, 7), cttsOffsets = ctts)
    val samples = VideoHeader.videoSamples(mp4).get
    assert(samples.size === 9)
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s.sync === (i % 3 == 0), s"sync($i)")
      assert(s.dts === i * 100L)
      assert(s.pts === i * 100L + ctts(i), s"pts($i)")
      val got = mp4.slice(s.offset.toInt, s.offset.toInt + s.size)
      assert(got.toSeq === payloads(i).toSeq)
    }
    // no stss box: every sample is sync; no ctts: pts == dts
    val plain = VideoHeader.videoSamples(
      VideoHeader.synthesizeMp4WithSamples("mp42", 600, 300,
        VideoHeader.TrackSpec("vide", "avc1", 64, 64, 600, 300),
        payloads.take(3), 100, 2)).get
    assert(plain.forall(_.sync))
    assert(plain.forall(s => s.pts === s.dts))
    // mutation fuzz over the new boxes: never throws
    val rnd = new scala.util.Random(11)
    (1 to 300).foreach { _ =>
      val m = mp4.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      VideoHeader.videoSamples(m) // must not throw
    }
  }

  test("edit lists: elst media_time shifts every pts (the composition-" +
    "delay compensation real muxers write); dts and payloads unmoved") {
    val payloads = (0 until 9).map(i => Array.fill[Byte](6)(i.toByte))
    // b-frame shape whose ctts delays every frame by >= 100: the elst
    // compensates so the first presented frame lands at pts 0
    val ctts = (0 until 9).map(i => Seq(100L, 200L, 300L)(i % 3))
    def mk(edit: Option[Long]) = VideoHeader.synthesizeMp4Tracks(
      "mp42", 600, 900, Seq(VideoHeader.TrackSamples(
        VideoHeader.TrackSpec("vide", "avc1", 64, 64, 600, 900),
        payloads, 100, 4, Seq(1, 4, 7), ctts, editMediaTime = edit)))
    val base = VideoHeader.videoSamples(mk(None)).get
    val withEditMp4 = mk(Some(100L))
    val edited = VideoHeader.videoSamples(withEditMp4).get
    assert(edited.size === 9)
    edited.zip(base).foreach { case (e, b) =>
      assert(e.dts === b.dts)
      assert(e.pts === b.pts - 100L, s"pts shift at ${e.index}")
      assert(e.size === b.size && e.sync === b.sync)
      // the edts box grows moov, so absolute offsets shift — the
      // PAYLOAD each sample locates must stay the frame's bytes
      val got = withEditMp4.slice(e.offset.toInt, e.offset.toInt + e.size)
      assert(got.toSeq === payloads(e.index).toSeq, s"bytes(${e.index})")
    }
    assert(edited.head.pts === 0L)
    // parse() still reads the container around the edts box
    assert(VideoHeader.parse(mk(Some(100L))).get.videoTracks.nonEmpty)
    val withEdit = mk(Some(100L))
    // mutation fuzz over the elst box: never throws
    val rnd = new scala.util.Random(23)
    (1 to 300).foreach { _ =>
      val m = withEdit.clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      VideoHeader.videoSamples(m) // must not throw
    }
  }

  test("ctts box version byte: 1 when any composition offset is " +
    "negative (ISO 14496-12 v0 offsets are unsigned), else 0") {
    def cttsVersion(mp4: Array[Byte]): Int = {
      val idx = (0 to mp4.length - 4).find(i =>
        mp4(i) == 'c' && mp4(i + 1) == 't' && mp4(i + 2) == 't' &&
          mp4(i + 3) == 's').get
      mp4(idx + 4) & 0xff // version byte follows the fourcc
    }
    val payloads = (0 until 3).map(i => Array.fill[Byte](4)(i.toByte))
    def mk(offsets: Seq[Long]) = VideoHeader.synthesizeMp4WithSamples(
      "mp42", 600, 300, VideoHeader.TrackSpec("vide", "avc1", 64, 64,
        600, 300), payloads, 100, 2, cttsOffsets = offsets)
    assert(cttsVersion(mk(Seq(100L, 200L, -100L))) === 1)
    assert(cttsVersion(mk(Seq(100L, 200L, 0L))) === 0)
    // the parser's signed read decodes both forms to the same pts
    Seq(Seq(100L, 200L, -100L), Seq(100L, 200L, 0L)).foreach { off =>
      val s = VideoHeader.videoSamples(mk(off)).get
      s.zipWithIndex.foreach { case (x, i) =>
        assert(x.pts === x.dts + off(i))
      }
    }
  }

  test("co64 (64-bit chunk offsets) demuxes like stco") {
    val payloads = (0 until 3).map(i => Array.fill[Byte](4)(i.toByte))
    val mp4 = VideoHeader.synthesizeMp4WithSamples(
      "mp42", 600, 300, VideoHeader.TrackSpec("vide", "av01", 64, 64,
        600, 300), payloads, sampleDelta = 100, samplesPerChunk = 2)
    // rewrite the stco box into co64 in place-ish: find "stco",
    // rebuild the file with widened offsets (sizes change, so patch
    // offsets by the growth delta: co64 adds 4 bytes per entry)
    def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    val at = { // locate the stco box
      var k = -1
      (0 until mp4.length - 4).foreach { i =>
        if (k < 0 && mp4(i) == 's' && mp4(i + 1) == 't' &&
          mp4(i + 2) == 'c' && mp4(i + 3) == 'o') k = i - 4
      }
      k
    }
    assert(at > 0)
    val stcoSize = be32(mp4, at)
    val nEntries = be32(mp4, at + 12)
    val delta = 4 * nEntries
    def patchSizes(b: Array[Byte]): Array[Byte] = b // sizes patched below
    // build co64 payload: version/flags + count + widened offsets,
    // each original offset shifted by the size growth
    val co64Body = Array[Byte](0, 0, 0, 0) ++
      Array(((nEntries >> 24) & 0xff).toByte, ((nEntries >> 16) & 0xff).toByte,
        ((nEntries >> 8) & 0xff).toByte, (nEntries & 0xff).toByte) ++
      (0 until nEntries).toArray.flatMap { e =>
        val off = be32(mp4, at + 16 + 4 * e).toLong + delta
        Array.tabulate[Byte](8)(j => ((off >> (56 - 8 * j)) & 0xff).toByte)
      }
    val co64 = Array(
      (((co64Body.length + 8) >> 24) & 0xff).toByte,
      (((co64Body.length + 8) >> 16) & 0xff).toByte,
      (((co64Body.length + 8) >> 8) & 0xff).toByte,
      ((co64Body.length + 8) & 0xff).toByte) ++
      "co64".getBytes("US-ASCII") ++ co64Body
    var out = mp4.slice(0, at) ++ co64 ++ mp4.drop(at + stcoSize)
    // widen the enclosing stbl/minf/mdia/trak/moov sizes by delta
    Seq("moov", "trak", "mdia", "minf", "stbl").foreach { tp =>
      var k = -1
      (0 until out.length - 4).foreach { i =>
        if (k < 0 && out(i) == tp(0) && out(i + 1) == tp(1) &&
          out(i + 2) == tp(2) && out(i + 3) == tp(3)) k = i - 4
      }
      assert(k >= 0, tp)
      val sz = be32(out, k) + delta
      out(k) = ((sz >> 24) & 0xff).toByte
      out(k + 1) = ((sz >> 16) & 0xff).toByte
      out(k + 2) = ((sz >> 8) & 0xff).toByte
      out(k + 3) = (sz & 0xff).toByte
    }
    patchSizes(out)
    val samples = VideoHeader.videoSamples(out).get
    assert(samples.size === 3)
    samples.zipWithIndex.foreach { case (s, i) =>
      val got = out.slice(s.offset.toInt, s.offset.toInt + s.size)
      assert(got.toSeq === payloads(i).toSeq)
    }
  }

  test("videoSamples: hostile tables return None, audio-only returns " +
    "None, truncated sample data returns None") {
    // audio-only file: no video track to demux
    val audioOnly = VideoHeader.synthesizeMp4(
      "mp42", 600, 600,
      Seq(VideoHeader.TrackSpec("soun", "mp4a", 0, 0, 48000, 48000)))
    assert(VideoHeader.videoSamples(audioOnly) === None)
    // sample data past EOF: truncate the mdat
    val payloads = (0 until 4).map(i => Array.fill[Byte](8)(i.toByte))
    val mp4 = VideoHeader.synthesizeMp4WithSamples(
      "mp42", 600, 400, VideoHeader.TrackSpec("vide", "avc1", 16, 16,
        600, 400), payloads, 100, 2)
    assert(VideoHeader.videoSamples(mp4).isDefined)
    assert(VideoHeader.videoSamples(mp4.dropRight(10)) === None)
    // arbitrary bytes never throw
    val rnd = new scala.util.Random(13)
    (1 to 100).foreach { _ =>
      VideoHeader.videoSamples(
        Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte))
    }
  }

  test("never throws on arbitrary/hostile bytes; malformed sizes -> None") {
    assert(VideoHeader.parse(null) === None)
    assert(VideoHeader.parse(Array.emptyByteArray) === None)
    assert(VideoHeader.parse("RIFFxxxxWAVE".getBytes("US-ASCII")) === None)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(300)
      val bytes = Array.fill[Byte](n)(rnd.nextInt().toByte)
      VideoHeader.parse(bytes) // must not throw
    }
    // well-formed prefix, truncated mid-moov -> None, not a throw
    val b = fixture
    assert(VideoHeader.parse(b.slice(0, b.length - 50)).isEmpty ||
      VideoHeader.parse(b.slice(0, b.length - 50)).isDefined) // no throw
    // a box whose size runs past EOF is malformed -> None
    val bad = b.clone()
    bad(0) = 0x7f.toByte // ftyp size becomes enormous
    assert(VideoHeader.parse(bad) === None)
    // a box with size < 8 is malformed -> None
    val bad2 = b.clone()
    bad2(3) = 4
    assert(VideoHeader.parse(bad2) === None)
  }
}
