package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the temporal video fingerprint ([[Multimodal.videoShingles]]):
  * the per-frame dHash fold and base-M shingle combine against an
  * INDEPENDENT recomputation from the pixel definition, the
  * time-shift covariance + brightness invariance the banded dedup
  * verify relies on, run-breaking on undecodable frames, and the
  * DataFrame transform's column contract.
  */
class VideoShinglesSpec extends SparkSuite {
  import spark.implicits._

  private val M = Multimodal.ShingleMod

  private def gray(seed: Int): Array[Int] =
    Array.tabulate(72)(i => (seed * 31 + i * 7 + (i * i) % 13) % 256)

  private def mp4Of(frames: Seq[Array[Int]]): Array[Byte] =
    VideoHeader.synthesizeMp4WithSamples("mp42", 600,
      frames.length * 100L,
      VideoHeader.TrackSpec("vide", "avc1", 9, 8, 600,
        frames.length * 100L),
      frames.map(g => PixelDecode.encodePngGray(9, 8, g)),
      100, samplesPerChunk = 3)

  /** dHash from the published definition (9x8 native geometry: no
    * resample), recomputed here independently of PixelDecode.
    */
  private def refFk(g: Array[Int]): Long = {
    var bits = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (g(r * 9 + c) > g(r * 9 + c + 1)) bits |= 1L << (r * 8 + c)
    ((bits & 0xffffffffL) * 31 + (bits >>> 32)) % M
  }

  test("videoShingleRows folds per-frame dHash and combines 3-frame " +
    "shingles base-M — exact against an independent replay") {
    val frames = (0 until 5).map(gray)
    val out = Multimodal.videoShingleRows(mp4Of(frames), k = 3)
    val fks = frames.map(refFk)
    assert(out.map(_.t) === Seq(0, 1, 2))
    assert(out.map(_.fk) === fks.take(3))
    assert(out.map(_.sid) ===
      (0 until 3).map(i => (fks(i) * M + fks(i + 1)) * M + fks(i + 2)))
  }

  test("shingle ids are time-shift covariant and brightness " +
    "invariant: a delayed, re-graded copy shares every full-content " +
    "sid at a constant offset") {
    // pixels fold to [0, 200) so the +25 re-grade never clips
    val content = (0 until 6).map(gray)
    val a = Multimodal.videoShingleRows(
      mp4Of(content.map(_.map(_ % 200))), k = 3)
    val b = Multimodal.videoShingleRows(
      mp4Of(Seq.fill(2)(Array.fill(72)(25)) ++
        content.map(_.map(_ % 200 + 25))), k = 3)
    val bByT = b.map(s => s.t -> s.sid).toMap
    // content shingle at t in A reappears at t + 2 in B, same sid
    for (s <- a) assert(bByT(s.t + 2) === s.sid,
      s"shingle at t=${s.t} not shift-covariant/brightness-invariant")
    // B has exactly the 2 extra lead-in-straddling shingles
    assert(b.length === a.length + 2)
  }

  test("an undecodable frame breaks shingle runs — never bridged") {
    val frames = (0 until 6).map(gray).map(g =>
      PixelDecode.encodePngGray(9, 8, g))
    val broken = frames.updated(2,
      "not an image at all, just bytes!".getBytes("US-ASCII"))
    val mp4 = VideoHeader.synthesizeMp4WithSamples("mp42", 600, 600L,
      VideoHeader.TrackSpec("vide", "avc1", 9, 8, 600, 600L),
      broken, 100, samplesPerChunk = 3)
    val out = Multimodal.videoShingleRows(mp4, k = 3)
    // decoded frames 0,1,3,4,5 -> only 3,4,5 form a consecutive run
    assert(out.map(_.t) === Seq(3))
    // non-MP4 bytes emit nothing
    assert(Multimodal.videoShingleRows("junk".getBytes, 3).isEmpty)
  }

  test("videoShingles DataFrame transform keeps id columns, drops " +
    "the media column, and matches the kernel rows") {
    val frames = (0 until 4).map(gray)
    val df = Seq(("c1", 7), ("c2", 8)).toDF("clip", "tag")
      .withColumn("media", typedLit(mp4Of(frames)))
    val out = Multimodal.videoShingles(df, "media")
    assert(out.columns.toSeq === Seq("clip", "tag", "t", "fk", "sid"))
    val rows = out.collect()
    val expect = Multimodal.videoShingleRows(mp4Of(frames), 3)
    assert(rows.length === 2 * expect.length)
    for (clip <- Seq("c1", "c2")) {
      val got = rows.filter(_.getString(0) == clip)
        .map(r => (r.getInt(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
      assert(got.toSeq === expect.map(s => (s.t, s.fk, s.sid)))
    }
  }
}
