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
