package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.pickaxe.RuleSelection

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("mp4KeyframeSample extracts exactly the stss sync frames with " +
    "dts and ctts-offset pts; stss-less tracks emit every frame") {
    import spark.implicits._
    val payloads = (0 until 9).map(i => Array.fill[Byte](6)(i.toByte))
    val ctts = (0 until 9).map(i => Seq(100L, 200L, -100L)(i % 3))
    val mp4 = VideoHeader.synthesizeMp4WithSamples(
      "mp42", 600, 900, VideoHeader.TrackSpec("vide", "avc1", 64, 64,
        600, 900), payloads, sampleDelta = 100, samplesPerChunk = 4,
      syncSamples = Seq(1, 4, 7), cttsOffsets = ctts)
    val df = Seq(("v1", mp4)).toDF("vid", "media")
    val kf = Multimodal.mp4KeyframeSample(df, "media")
      .select("frame_idx", "dts", "pts", "frame")
      .collect().sortBy(_.getInt(0))
    assert(kf.map(_.getInt(0)).toSeq === Seq(0, 3, 6))
    kf.foreach { r =>
      assert(r.getLong(1) === r.getInt(0) * 100L)
      assert(r.getLong(2) === r.getLong(1) + ctts(r.getInt(0)))
      assert(r.getAs[Array[Byte]](3).toSeq ===
        payloads(r.getInt(0)).toSeq)
    }
    // no stss box: keyframe sampling degrades to every frame
    val plain = VideoHeader.synthesizeMp4WithSamples("mp42", 600, 300,
      VideoHeader.TrackSpec("vide", "avc1", 64, 64, 600, 300),
      payloads.take(3), 100, 2)
    assert(Multimodal.mp4KeyframeSample(
      Seq(("v2", plain)).toDF("vid", "media"), "media").count() === 3)
    // non-MP4 bytes emit nothing
    assert(Multimodal.mp4KeyframeSample(
      Seq(("v3", "junk".getBytes)).toDF("vid", "media"), "media")
      .count() === 0)
  }

  test("mp4Cues decodes the timed-text track of a multi-track " +
    "container: handler selection skips the video trak, tx3g style " +
    "bytes are ignored, malformed cue lengths drop the cue") {
    import spark.implicits._
    val cues = Seq("hello world", "second cue here", "final")
    val cueSamples: Seq[Array[Byte]] = cues.zipWithIndex.map {
      case (t, i) =>
        val b = t.getBytes("UTF-8")
        val extra: Array[Byte] =
          if (i == 1) Array[Byte](9, 9) else Array.emptyByteArray
        Array[Byte](((b.length >> 8) & 0xff).toByte,
          (b.length & 0xff).toByte) ++ b ++ extra
    }
    val vframes = (0 until 2).map(i => Array.fill[Byte](4)(i.toByte))
    val mp4 = VideoHeader.synthesizeMp4Tracks("mp42", 600, 600L, Seq(
      VideoHeader.TrackSamples(
        VideoHeader.TrackSpec("vide", "avc1", 64, 64, 600, 400L),
        vframes, 200, 2),
      VideoHeader.TrackSamples(
        VideoHeader.TrackSpec("text", "tx3g", 0, 0, 1000, 600L),
        cueSamples, 200, 2)))
    // both tracks demux independently from the shared mdat
    assert(VideoHeader.videoSamples(mp4).get.size === 2)
    assert(VideoHeader.trackSamples(mp4, "text").get.size === 3)
    val df = Seq(("v1", mp4)).toDF("vid", "media")
    val got = Multimodal.mp4Cues(df, "media")
      .select("cue_idx", "dts", "text")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === cues.zipWithIndex.map { case (t, i) =>
      (i, i * 200L, t) })
    // a cue whose declared length runs past its sample is dropped,
    // not mis-decoded
    val bad = cueSamples.updated(0,
      Array[Byte](0x7f, 0x7f) ++ "x".getBytes("UTF-8"))
    val mp4Bad = VideoHeader.synthesizeMp4Tracks("mp42", 600, 600L, Seq(
      VideoHeader.TrackSamples(
        VideoHeader.TrackSpec("text", "tx3g", 0, 0, 1000, 600L),
        bad, 200, 2)))
    assert(Multimodal.mp4Cues(
      Seq(("v2", mp4Bad)).toDF("vid", "media"), "media")
      .count() === 2)
  }

  test("withDecodedFeatures attaches the feature columns; opaque " +
    "bytes fall back to the md5 stand-in with decoded=false") {
    val df = Seq(("a", "hello world"), ("b", "x" * 1000))
      .toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val out = Multimodal.withDecodedFeatures(df, "media", chunkSize = 256)
    val rows = out.select("id", "n_bytes", "n_chunks", "sig", "decoded")
      .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getInt(2), r.getString(3), r.getBoolean(4))).toMap
    assert(rows("a")._1 === 11L)
    assert(rows("a")._2 === 1)
    assert(rows("b")._1 === 1000L)
    assert(rows("b")._2 === 4)
    assert(rows("a")._3.length === 8) // deterministic md5-derived sig
    assert(!rows("a")._4 && !rows("b")._4) // not images: not decoded
    // deterministic across runs
    val again = Multimodal.withDecodedFeatures(df, "media", 256)
      .select("sig").as[String].collect().sorted
    assert(again === out.select("sig").as[String].collect().sorted)
  }

  test("withDecodedFeatures computes REAL pixel features for a " +
    "decodable PNG: exact gray stats, pHash-hex sig") {
    // 4x2 gray ramp, encoded by our own encoder, decoded by the real
    // pixel path inside the DataFrame plumbing
    val gray = Array(0, 51, 102, 153, 204, 255, 10, 20)
    val png = PixelDecode.encodePngGray(4, 2, gray)
    val df = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("img", png)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("media",
          org.apache.spark.sql.types.BinaryType))))
    val r = Multimodal.withDecodedFeatures(df, "media", 256)
      .select("format", "width", "height", "decoded", "px_sum",
        "px_sumsq", "phash", "sig").collect().head
    assert(r.getString(0) === "png")
    assert(r.getInt(1) === 4 && r.getInt(2) === 2)
    assert(r.getBoolean(3))
    assert(r.getLong(4) === gray.map(_.toLong).sum)
    assert(r.getLong(5) === gray.map(g => g.toLong * g).sum)
    assert(r.getString(7) === f"${r.getLong(6)}%016x") // sig = phash hex
  }

  test("ImageHeader parses real PNG/GIF/BMP/JPEG dimensions and " +
    "withDecodedFeatures surfaces them; garbage stays 'unknown'") {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG 640x480: 8-byte signature, IHDR length+tag, BE dims
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0)
    assert(ImageHeader.parse(png) === Some(ImageHeader.Info("png", 640, 480)))
    // GIF89a 800x600: LE u16 dims in the logical screen descriptor
    val gif = "GIF89a".getBytes("US-ASCII") ++
      bytes(0x20, 0x03, 0x58, 0x02, 0xf7, 0, 0)
    assert(ImageHeader.parse(gif) === Some(ImageHeader.Info("gif", 800, 600)))
    // BMP 17 x -9 (top-down): |height| is the pixel extent
    val bmp = bytes('B', 'M') ++ Array.fill[Byte](12)(0) ++
      bytes(40, 0, 0, 0, 17, 0, 0, 0, 0xf7, 0xff, 0xff, 0xff)
    assert(ImageHeader.parse(bmp) === Some(ImageHeader.Info("bmp", 17, 9)))
    // JPEG 512x256: SOI, APP0 (skipped by the marker walk), SOF0
    val jpeg = bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x04, 0x4a, 0x46, // APP0, len 4
      0xff, 0xc0, 0x00, 0x11, 8, 0x01, 0x00, 0x02, 0x00, 3)
    assert(ImageHeader.parse(jpeg) ===
      Some(ImageHeader.Info("jpeg", 512, 256)))
    // WebP, all three chunk variants (RFC 9649): lossy VP8 with the
    // 9D 01 2A start code and 14-bit LE dims...
    def riff(tag: String, payload: Array[Byte]): Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++
        bytes(payload.length + 12, 0, 0, 0) ++
        "WEBP".getBytes("US-ASCII") ++ tag.getBytes("US-ASCII") ++
        bytes(payload.length, 0, 0, 0) ++ payload
    val vp8 = riff("VP8 ", bytes(0, 0, 0, 0x9d, 0x01, 0x2a,
      0x20, 0x03, 0x58, 0x02)) // 800 x 600
    assert(ImageHeader.parse(vp8) === Some(ImageHeader.Info("webp", 800, 600)))
    // ...lossless VP8L: 0x2F then packed 14-bit width-1 / height-1
    // (w=17 -> 16 = 0x10; h=9 -> 8: bits = 16 | 8<<14 = 0x20010)
    val vp8l = riff("VP8L", bytes(0x2f, 0x10, 0x00, 0x02, 0x00, 0x00))
    assert(ImageHeader.parse(vp8l) === Some(ImageHeader.Info("webp", 17, 9)))
    // ...extended VP8X: 24-bit LE width-1 / height-1 canvas
    val vp8x = riff("VP8X", bytes(0, 0, 0, 0,
      0x1f, 0x03, 0, 0x57, 0x02, 0)) // 800 x 600
    assert(ImageHeader.parse(vp8x) === Some(ImageHeader.Info("webp", 800, 600)))
    // featuresOf keeps WebP's real header dims with decoded=false and
    // skips the pixel-decode attempt (no VP8/VP8L decoder in the JDK —
    // the reader sniff would be a guaranteed-failing cost per row)
    val wf = Multimodal.featuresOf(vp8, 256)
    assert(wf.format === "webp" && wf.width === 800 &&
      wf.height === 600 && !wf.decoded)
    // a RIFF that is not WEBP (e.g. WAVE) must not parse as an image
    val wav = AudioHeader.synthesizeWavPcm16(8000, Array[Short](1, 2, 3))
    assert(ImageHeader.parse(wav) === None)
    // VP8 without the start code is malformed
    val badVp8 = vp8.clone(); badVp8(23) = 0
    assert(ImageHeader.parse(badVp8) === None)
    // truncated PNG header and plain text -> no parse
    assert(ImageHeader.parse(png.take(20)) === None)
    assert(ImageHeader.parse("hello world".getBytes) === None)
    assert(ImageHeader.parse(null) === None)
    // surfaced through the DataFrame plumbing
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("p", png),
        org.apache.spark.sql.Row("t", "plain".getBytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("media",
          org.apache.spark.sql.types.BinaryType))))
    val out = Multimodal.withDecodedFeatures(df, "media", 256)
      .select("id", "format", "width", "height")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out("p") === (("png", 640, 480)))
    assert(out("t")._1 === "unknown")
  }

  test("withResizePlan: aspect-fit geometry is integer-exact, never " +
    "upscales, floors the short side at 1px") {
    import spark.implicits._
    val dims = Seq(
      (1, 640, 480),   // landscape above the box: 256 x 192
      (2, 480, 640),   // portrait above the box: 192 x 256
      (3, 200, 100),   // inside the box: untouched
      (4, 256, 256),   // exactly at the box: untouched
      (5, 10000, 3),   // extreme ratio: short side floors at 1
      (6, 257, 257),   // one over: 256 x 256
      (7, 0, 500))     // degenerate width: clamped to 1 before fitting
      .toDF("id", "width", "height")
    val out = Multimodal.withResizePlan(dims, "width", "height", 256)
      .select("id", "resized", "target_w", "target_h", "out_pixels")
      .as[(Int, Boolean, Int, Int, Long)].collect().sortBy(_._1)
    assert(out(0) === ((1, true, 256, 192, 256L * 192)))
    assert(out(1) === ((2, true, 192, 256, 192L * 256)))
    assert(out(2) === ((3, false, 200, 100, 200L * 100)))
    assert(out(3) === ((4, false, 256, 256, 256L * 256)))
    assert(out(4) === ((5, true, 256, 1, 256L)))
    assert(out(5) === ((6, true, 256, 256, 256L * 256)))
    assert(out(6) === ((7, true, 1, 256, 256L)))
    // composes with the REAL header path: parse a PNG, plan its resize
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val png = bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 6, 0, 0, 0)
    val media = Seq(Tuple1(png)).toDF("media")
    val planned = Multimodal.withResizePlan(
      Multimodal.withDecodedFeatures(media, "media"),
      "width", "height", 256)
      .select("format", "width", "height", "target_w", "target_h")
      .as[(String, Int, Int, Int, Int)].head()
    assert(planned === (("png", 640, 480, 256, 192)))
  }

  test("withDisplayDims swaps the rotation-family orientations into " +
    "the resize plan; upright/absent pass through") {
    val df = Seq(
      ("a", 400, 300, Integer.valueOf(1)), // upright
      ("b", 400, 300, Integer.valueOf(6)), // 90 deg: display 300x400
      ("c", 400, 300, Integer.valueOf(8)), // 270 deg
      ("d", 400, 300, Integer.valueOf(3)), // 180 deg: no swap
      ("e", 400, 300, null.asInstanceOf[Integer]) // no EXIF
    ).toDF("id", "w", "h", "orient")
    val out = Multimodal.withResizePlan(
      Multimodal.withDisplayDims(df, "w", "h", "orient"),
      "disp_w", "disp_h", maxDim = 200)
      .select("id", "disp_w", "disp_h", "target_w", "target_h")
      .collect().map(r => r.getString(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    assert(out("a") === ((400, 300, 200, 150)))
    assert(out("b") === ((300, 400, 150, 200))) // portrait after rotate
    assert(out("c") === ((300, 400, 150, 200)))
    assert(out("d") === ((400, 300, 200, 150)))
    assert(out("e") === ((400, 300, 200, 150)))
  }

  test("frameSample emits every stride-th byte frame, tail included, " +
    "none for empty media") {
    // 10 bytes at frameSize=3 -> frames 0..3 ('012','345','678','9');
    // stride 2 samples indices 0 and 2
    val df = Seq(("a", "0123456789"), ("b", ""))
      .toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val out = Multimodal.frameSample(df, "media", frameSize = 3, stride = 2)
      .select(col("id"), col("frame_idx"), col("frame").cast("string"))
      .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(("a", 0, "012"), ("a", 2, "678")))
    // stride 1 = every frame; the partial tail frame is a frame
    val all = Multimodal.frameSample(df, "media", frameSize = 3, stride = 1)
      .select(col("frame").cast("string")).as[String].collect()
    assert(all.toSeq.sorted === Seq("012", "345", "678", "9"))
    // byte-based framing: a 3-byte UTF-8 char splits across frames
    val utf = Seq(("u", "a世b")).toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val nBytes = utf.select(octet_length(col("media"))).as[Int].head()
    assert(nBytes === 5)
    assert(Multimodal.frameSample(utf, "media", 2, 1).count() === 3)
  }

  test("chunked yields ceil(n/chunk) ordered chunk rows that reassemble") {
    val df = Seq(("a", "0123456789")).toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val out = Multimodal.chunked(df, "media", chunkSize = 4)
      .orderBy("chunk_idx")
      .select(col("chunk_idx"), col("chunk").cast("string"))
      .as[(Int, String)].collect()
    assert(out.map(_._2).mkString === "0123456789")
    assert(out.map(_._1).toSeq === Seq(0, 1, 2))
  }

  test("rule selection: coverage CDF cut includes the crossing rule") {
    val rules = Seq(
      ("r1", "Any", "[#6:1]>>[#6:1]", "Any"),
      ("r2", "Any", "[#7:1]>>[#7:1]", "Any"),
      ("r3", "Any", "[#8:1].[O:2]=[O:3]>>[#8:1]", "Any"),
      ("r4", "Any", "[#16:1]>>[#16:1]", "Any"))
      .toDF("Name", "Reactants", "SMARTS", "Products")
    val coverage = (Seq.fill(50)("r1") ++ Seq.fill(30)("r2") ++
      Seq.fill(15)("r3") ++ Seq.fill(5)("r4"))
      .zipWithIndex.map { case (n, i) => (n, s"rxn$i") }
      .toDF("Name", "Reaction")
    // 0.6 fraction: r1 (0.5) + r2 (0.8 crossing) — bisect_right keeps r2
    val byFrac = RuleSelection.select(rules, coverage,
      fractionCoverage = Some(0.6))
    assert(byFrac.select("Name").as[String].collect().toSeq ===
      Seq("r1", "r2"))
    // top-n
    val topN = RuleSelection.select(rules, coverage, nRules = Some(3))
    assert(topN.count() === 3)
    // anaerobic: exclude O2-consuming SMARTS (rules.py:123-128)
    val anaerobic = RuleSelection.select(rules, coverage,
      excludeSmarts = Some("\\[O:\\d+\\]=\\[O:\\d+\\]"))
    assert(!anaerobic.select("Name").as[String].collect().contains("r3"))
  }
}
