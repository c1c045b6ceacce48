package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM video container parsing: the ISO base-media file format
  * (ISO/IEC 14496-12 — MP4/MOV/M4A) box walk, no codec libraries.
  * This makes the multimodal video metadata columns REAL for the
  * container a training-data pipeline meets most (MP4): major brand,
  * movie duration, per-track handler ('vide'/'soun'), codec fourcc,
  * pixel dimensions, and track timescale/duration — everything a
  * distributed pipeline needs to gate, budget, and frame-sample video
  * BEFORE any decode. The video twin of [[ImageHeader]]'s TIFF IFD
  * walk; the frame bytes themselves stay opaque (no codecs in this
  * container, builder brief).
  *
  * Box grammar from the public spec: box = size(4 BE) type(4ASCII)
  * [largesize(8 BE) when size==1; size==0 = box extends to EOF],
  * containers moov/trak/mdia/minf/stbl nest plain concatenated boxes,
  * full boxes carry version(1)+flags(3). Leaf layouts: ftyp §4.3,
  * mvhd §8.2.2, tkhd §8.3.2 (width/height 16.16 fixed-point),
  * mdhd §8.4.2, hdlr §8.4.3, stsd §8.5.2 (sample-entry fourcc).
  *
  * Every multi-byte read is explicitly bounds-checked so malformed
  * boxes return None deliberately — never via exception control flow.
  *
  * Reference analog: the reference has no media path at all; this is
  * part of the pipeline surface the survey adds beyond it (SURVEY.md
  * §2 multimodal extensions).
  */
object VideoHeader {

  /** One parsed track: handler fourcc ('vide'/'soun'/...), first
    * sample-entry codec fourcc, tkhd display dims (16.16 truncated to
    * integer pixels; 0 for audio), and the mdhd media clock.
    */
  final case class Track(
      handler: String,
      codec: String,
      width: Int,
      height: Int,
      timescale: Long,
      duration: Long) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
  }

  /** Parsed movie header: ftyp major brand, mvhd movie clock, and the
    * track list in file order.
    */
  final case class Info(
      brand: String,
      timescale: Long,
      duration: Long,
      tracks: Seq[Track]) {
    def durationMs: Long =
      if (timescale <= 0) 0L else duration * 1000L / timescale
    def videoTracks: Seq[Track] = tracks.filter(_.handler == "vide")
    def audioTracks: Seq[Track] = tracks.filter(_.handler == "soun")
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String = {
    // printable-ASCII box types only; anything else is not a box walk
    // we trust (e.g. random bytes that happened to parse as a size)
    val cs = new Array[Char](4)
    var k = 0
    while (k < 4) {
      val c = u8(b, i + k)
      if (c < 0x20 || c > 0x7e) return null
      cs(k) = c.toChar
      k += 1
    }
    new String(cs)
  }

  /** Walk the concatenated boxes in b[start, end), invoking f with
    * (type, payloadStart, payloadEnd) per box. Returns false when the
    * walk hits a malformed size (truncated header, payload past end,
    * non-ASCII type) — the caller treats that as an unparseable file.
    */
  private def walk(
      b: Array[Byte], start: Int, end: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var off = start
    while (off < end) {
      if (off + 8 > end) return false
      val sz32 = be32(b, off)
      val tp = fourcc(b, off + 4)
      if (tp == null) return false
      var payload = off + 8L
      var boxEnd = 0L
      if (sz32 == 1L) {
        if (off + 16 > end) return false
        val sz64 = be64(b, off + 8)
        if (sz64 < 16) return false
        payload = off + 16L
        boxEnd = off + sz64
      } else if (sz32 == 0L) {
        boxEnd = end.toLong // extends to end of enclosing scope
      } else {
        if (sz32 < 8) return false
        boxEnd = off + sz32
      }
      if (boxEnd > end || payload > boxEnd) return false
      if (!f(tp, payload.toInt, boxEnd.toInt)) return false
      off = boxEnd.toInt
    }
    true
  }

  /** Parse an ISO-BMFF file's metadata, or None when the signature
    * doesn't match (first box must be ftyp, per the brand grammar) or
    * any box size is malformed/truncated. Never throws on arbitrary
    * bytes; skips unknown boxes (free/mdat/udta/...) by size, as a
    * real demuxer does.
    */
  def parse(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 16) return None
    if (fourcc(bytes, 4) != "ftyp") return None
    var brand: String = null
    var mvTs = -1L
    var mvDur = -1L
    val tracks = ArrayBuffer.empty[Track]
    val ok = walk(bytes, 0, bytes.length) { (tp, p0, p1) =>
      tp match {
        case "ftyp" =>
          if (p1 - p0 < 8) false
          else { brand = fourcc(bytes, p0); brand != null }
        case "moov" =>
          walk(bytes, p0, p1) { (mtp, m0, m1) =>
            mtp match {
              case "mvhd" =>
                // full box: v0 ts@12 dur@16(4B); v1 ts@20 dur@24(8B)
                if (m1 - m0 < 20) false
                else if (u8(bytes, m0) == 1) {
                  if (m1 - m0 < 32) false
                  else { mvTs = be32(bytes, m0 + 20); mvDur = be64(bytes, m0 + 24); true }
                } else {
                  mvTs = be32(bytes, m0 + 12); mvDur = be32(bytes, m0 + 16); true
                }
              case "trak" =>
                parseTrak(bytes, m0, m1) match {
                  case Some(t) => tracks += t; true
                  case None => false
                }
              case _ => true // udta, meta, iods, ... skipped by size
            }
          }
        case _ => true // mdat, free, skip, wide, ... skipped by size
      }
    }
    if (!ok || brand == null || mvTs < 0) None
    else Some(Info(brand, mvTs, mvDur, tracks.toSeq))
  }

  private def parseTrak(b: Array[Byte], start: Int, end: Int): Option[Track] = {
    var w = 0
    var h = 0
    var handler = ""
    var codec = ""
    var ts = 0L
    var dur = 0L
    val ok = walk(b, start, end) { (tp, p0, p1) =>
      tp match {
        case "tkhd" =>
          // v0: width@76 height@80 (16.16); v1 (+12 for 64-bit
          // times/duration): width@88 height@92
          val wOff = if (p1 - p0 >= 1 && u8(b, p0) == 1) 88 else 76
          if (p1 - p0 < wOff + 8) false
          else {
            w = (be32(b, p0 + wOff) >> 16).toInt
            h = (be32(b, p0 + wOff + 4) >> 16).toInt
            true
          }
        case "mdia" =>
          walk(b, p0, p1) { (mtp, m0, m1) =>
            mtp match {
              case "mdhd" =>
                if (m1 - m0 < 20) false
                else if (u8(b, m0) == 1) {
                  if (m1 - m0 < 32) false
                  else { ts = be32(b, m0 + 20); dur = be64(b, m0 + 24); true }
                } else { ts = be32(b, m0 + 12); dur = be32(b, m0 + 16); true }
              case "hdlr" =>
                // vf(4) pre_defined(4) handler_type(4)
                if (m1 - m0 < 12) false
                else {
                  val hd = fourcc(b, m0 + 8)
                  if (hd == null) false else { handler = hd; true }
                }
              case "minf" =>
                walk(b, m0, m1) { (stp, s0, s1) =>
                  if (stp != "stbl") true
                  else walk(b, s0, s1) { (ltp, l0, l1) =>
                    if (ltp != "stsd") true
                    else {
                      // vf(4) entry_count(4) entry{size(4) fourcc(4)}
                      if (l1 - l0 < 16) false
                      else {
                        val cc = fourcc(b, l0 + 12)
                        if (cc == null) false else { codec = cc; true }
                      }
                    }
                  }
                }
              case _ => true
            }
          }
        case _ => true
      }
    }
    if (!ok || handler.isEmpty) None
    else Some(Track(handler, codec, w, h, ts, dur))
  }

  // ---------------------------------------------------------------
  // Sample tables: the demuxer half — where each video frame's bytes
  // LIVE in the file. stts (ISO 14496-12 §8.6.1.2) gives decode
  // timestamps, stsz (§8.7.3) sample sizes, stsc (§8.7.4) the
  // sample->chunk runs, stco/co64 (§8.7.5) absolute chunk offsets;
  // a frame's payload is mdat bytes [offset, offset+size).
  // ---------------------------------------------------------------

  /** One demuxed video sample: absolute file offset, byte size, and
    * decode timestamp in the track's timescale.
    */
  /** One located sample: byte extent, decode time, presentation time
    * (`pts = dts + ctts offset`; equals dts when no ctts box — no
    * b-frame reordering), and the sync flag (stss membership; a track
    * without an stss box has EVERY sample sync, per §8.6.2).
    */
  final case class Sample(
      index: Int, offset: Long, size: Int, dts: Long,
      pts: Long = 0L, sync: Boolean = true)

  /** Demux the FIRST video track's sample table: walk moov/trak until
    * a 'vide' handler, then resolve stsc runs against stco chunk
    * offsets and stsz sizes, accumulating intra-chunk offsets and
    * stts decode times. None when any table is missing/malformed or
    * a sample falls outside the file. Caps at 1M samples (hostile
    * tables must not allocate unbounded).
    */
  def videoSamples(bytes: Array[Byte]): Option[Seq[Sample]] =
    trackSamples(bytes, "vide")

  /** Demux the FIRST track with the given handler fourcc ('vide',
    * 'text', 'sbtl', 'soun', ...) — the general form of
    * [[videoSamples]]; same table resolution, same hostile-input
    * contract (malformed tables on a MATCHING track fail the whole
    * parse; non-matching tracks are skipped).
    */
  def trackSamples(
      bytes: Array[Byte], handler: String): Option[Seq[Sample]] = {
    if (bytes == null || bytes.length < 16) return None
    if (fourcc(bytes, 4) != "ftyp") return None
    var result: Option[Seq[Sample]] = None
    val ok = walk(bytes, 0, bytes.length) { (tp, p0, p1) =>
      if (tp != "moov") true
      else walk(bytes, p0, p1) { (mtp, m0, m1) =>
        if (mtp != "trak" || result.isDefined) true
        else {
          demuxTrak(bytes, m0, m1, handler) match {
            case Right(samples) => result = Some(samples); true
            case Left(isWanted) => !isWanted // malformed wanted track: fail
          }
        }
      }
    }
    if (!ok) None else result
  }

  /** Right(samples) for a well-formed track with the wanted handler;
    * Left(isWanted) when the track has a different handler (skip) or
    * its tables are malformed (fail if it was the wanted one).
    */
  private def demuxTrak(
      b: Array[Byte], start: Int, end: Int,
      wantHandler: String): Either[Boolean, Seq[Sample]] = {
    var handler = ""
    var stts: Array[(Long, Long)] = null // (count, delta)
    var sizes: Array[Int] = null
    var uniformSize = -1L
    var nSamples = -1L
    var stsc: Array[(Long, Long)] = null // (first_chunk, per_chunk)
    var chunkOffsets: Array[Long] = null
    var stss: Array[Long] = null // 1-based sync sample numbers
    var ctts: Array[(Long, Long)] = null // (count, signed offset)
    var editOffset = 0L // initial elst media_time (presentation shift)
    var bad = false
    def u32(i: Int): Long = be32(b, i)
    walk(b, start, end) { (tp, p0, p1) =>
      if (tp == "edts") walk(b, p0, p1) { (etp, e0, e1) =>
        if (etp != "elst") true
        else if (e1 - e0 < 8) { bad = true; false }
        else {
          // edit list (§8.6.6): the FIRST non-empty entry's media_time
          // is the initial presentation offset (the dominant real-world
          // use — composition-delay compensation); empty edits
          // (media_time -1, a movie-timescale delay) and further
          // segments are metadata this walk does not re-time
          val version = u8(b, e0)
          val n = u32(e0 + 4)
          val entrySz = if (version == 1) 20 else 12
          if (version > 1 || n < 0 || n > 4096 ||
            e0 + 8 + n * entrySz > e1) { bad = true; false }
          else {
            var k = 0
            var found = false
            while (k < n && !found) {
              val at = e0 + 8 + k * entrySz
              val mediaTime =
                if (version == 1) be64(b, at + 8)
                else u32(at + 4).toInt.toLong // signed 32
              if (mediaTime >= 0) { editOffset = mediaTime; found = true }
              k += 1
            }
            true
          }
        }
      }
      else if (tp == "mdia") walk(b, p0, p1) { (mtp, m0, m1) =>
        mtp match {
          case "hdlr" =>
            if (m1 - m0 >= 12) {
              val hd = fourcc(b, m0 + 8)
              if (hd != null) handler = hd
            }
            true
          case "minf" => walk(b, m0, m1) { (stp, s0, s1) =>
            if (stp != "stbl") true
            else walk(b, s0, s1) { (ltp, l0, l1) =>
              ltp match {
                case "stts" =>
                  if (l1 - l0 < 8) { bad = true; false }
                  else {
                    val n = u32(l0 + 4)
                    if (n < 0 || n > 65536 || l0 + 8 + n * 8 > l1) {
                      bad = true; false
                    } else {
                      stts = Array.tabulate(n.toInt)(k =>
                        (u32(l0 + 8 + k * 8), u32(l0 + 12 + k * 8)))
                      true
                    }
                  }
                case "stsz" =>
                  if (l1 - l0 < 12) { bad = true; false }
                  else {
                    uniformSize = u32(l0 + 4)
                    nSamples = u32(l0 + 8)
                    if (nSamples < 0 || nSamples > 1000000) {
                      bad = true; false
                    } else if (uniformSize == 0) {
                      if (l0 + 12 + nSamples * 4 > l1) { bad = true; false }
                      else {
                        sizes = Array.tabulate(nSamples.toInt)(k =>
                          u32(l0 + 12 + k * 4).toInt)
                        true
                      }
                    } else true
                  }
                case "stsc" =>
                  if (l1 - l0 < 8) { bad = true; false }
                  else {
                    val n = u32(l0 + 4)
                    if (n < 0 || n > 65536 || l0 + 8 + n * 12 > l1) {
                      bad = true; false
                    } else {
                      stsc = Array.tabulate(n.toInt)(k =>
                        (u32(l0 + 8 + k * 12), u32(l0 + 12 + k * 12)))
                      true
                    }
                  }
                case "stco" =>
                  if (l1 - l0 < 8) { bad = true; false }
                  else {
                    val n = u32(l0 + 4)
                    if (n < 0 || n > 1000000 || l0 + 8 + n * 4 > l1) {
                      bad = true; false
                    } else {
                      chunkOffsets =
                        Array.tabulate(n.toInt)(k => u32(l0 + 8 + k * 4))
                      true
                    }
                  }
                case "co64" =>
                  if (l1 - l0 < 8) { bad = true; false }
                  else {
                    val n = u32(l0 + 4)
                    if (n < 0 || n > 1000000 || l0 + 8 + n * 8 > l1) {
                      bad = true; false
                    } else {
                      chunkOffsets =
                        Array.tabulate(n.toInt)(k => be64(b, l0 + 8 + k * 8))
                      true
                    }
                  }
                case "stss" =>
                  if (l1 - l0 < 8) { bad = true; false }
                  else {
                    val n = u32(l0 + 4)
                    if (n < 0 || n > 1000000 || l0 + 8 + n * 4 > l1) {
                      bad = true; false
                    } else {
                      stss = Array.tabulate(n.toInt)(k =>
                        u32(l0 + 8 + k * 4))
                      true
                    }
                  }
                case "ctts" =>
                  if (l1 - l0 < 8) { bad = true; false }
                  else {
                    val n = u32(l0 + 4)
                    if (n < 0 || n > 65536 || l0 + 8 + n * 8 > l1) {
                      bad = true; false
                    } else {
                      // offset read as SIGNED 32 (the version-1 form;
                      // version-0 values are non-negative, where the
                      // signed read is the identity)
                      ctts = Array.tabulate(n.toInt)(k =>
                        (u32(l0 + 8 + k * 8),
                          u32(l0 + 12 + k * 8).toInt.toLong))
                      true
                    }
                  }
                case _ => true
              }
            }
          }
          case _ => true
        }
      }
      else true
    }
    if (handler != wantHandler) return Left(false)
    if (bad || stts == null || stsc == null || chunkOffsets == null ||
      nSamples < 0 || stsc.isEmpty) return Left(true)
    // resolve stsc runs: run i applies from first_chunk(i) to
    // first_chunk(i+1)-1 (1-based); walk chunks until samples exhaust
    val out = new ArrayBuffer[Sample](nSamples.toInt)
    val syncSet =
      if (stss == null) null else stss.toSet
    var dts = 0L
    var sttsIdx = 0
    var sttsLeft = if (stts.isEmpty) 0L else stts(0)._1
    var cttsIdx = 0
    var cttsLeft = if (ctts == null || ctts.isEmpty) 0L else ctts(0)._1
    var sample = 0
    var chunk = 0
    while (sample < nSamples && chunk < chunkOffsets.length) {
      val runIdx = {
        var r = 0
        while (r + 1 < stsc.length && stsc(r + 1)._1 <= chunk + 1) r += 1
        r
      }
      val perChunk = stsc(runIdx)._2
      var off = chunkOffsets(chunk)
      var k = 0L
      while (k < perChunk && sample < nSamples) {
        val sz = if (uniformSize != 0) uniformSize.toInt else sizes(sample)
        if (sz < 0 || off < 0 || off + sz > b.length) return Left(true)
        val ctsOff =
          if (ctts == null || ctts.isEmpty) 0L
          else {
            while (cttsLeft == 0 && cttsIdx + 1 < ctts.length) {
              cttsIdx += 1; cttsLeft = ctts(cttsIdx)._1
            }
            if (cttsLeft > 0) { cttsLeft -= 1; ctts(cttsIdx)._2 } else 0L
          }
        out += Sample(sample, off, sz, dts, dts + ctsOff - editOffset,
          syncSet == null || syncSet(sample + 1L))
        // advance the stts clock
        while (sttsLeft == 0 && sttsIdx + 1 < stts.length) {
          sttsIdx += 1; sttsLeft = stts(sttsIdx)._1
        }
        if (sttsLeft > 0) { dts += stts(sttsIdx)._2; sttsLeft -= 1 }
        off += sz
        sample += 1
        k += 1
      }
      chunk += 1
    }
    if (sample < nSamples) Left(true) // chunks exhausted early
    else Right(out.toSeq)
  }

  // ---------------------------------------------------------------
  // Fixture builder: a minimal spec-correct MP4 — test fixture + the
  // docs-level executable spec of the layout this parser reads (the
  // synthesizeWavPcm16 precedent, AudioHeader.scala:154).
  // ---------------------------------------------------------------

  /** Track spec for [[synthesizeMp4]]. Width/height are pixels (the
    * builder stores them 16.16); audio tracks conventionally pass 0.
    */
  final case class TrackSpec(
      handler: String, codec: String, width: Int, height: Int,
      timescale: Long, duration: Long)

  private def beInt(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beShort(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(tp: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    beInt(body.length + 8L) ++ ascii(tp) ++ body
  }
  private def fullBox(tp: String, payload: Array[Byte]*): Array[Byte] =
    box(tp, (Array[Byte](0, 0, 0, 0) +: payload): _*) // version 0, flags 0
  private def fullBoxV(tp: String, version: Int,
      payload: Array[Byte]*): Array[Byte] =
    box(tp, (Array[Byte](version.toByte, 0, 0, 0) +: payload): _*)

  /** The 3x3 unity transform matrix tkhd/mvhd carry (16.16/2.30). */
  private val unityMatrix: Array[Byte] =
    beInt(0x00010000L) ++ beInt(0) ++ beInt(0) ++
      beInt(0) ++ beInt(0x00010000L) ++ beInt(0) ++
      beInt(0) ++ beInt(0) ++ beInt(0x40000000L)

  /** Build a minimal valid MP4: ftyp + free + moov(mvhd + trak*) +
    * mdat(payload). Every box is spec-layout-complete (full tkhd
    * matrix, sample-entry reserved fields), so third-party demuxers
    * would accept the geometry too.
    */
  def synthesizeMp4(
      brand: String,
      timescale: Long,
      duration: Long,
      tracks: Seq[TrackSpec],
      mdatPayload: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(brand.length == 4, s"brand must be a fourcc: $brand")
    val ftyp = box("ftyp", ascii(brand), beInt(0), ascii(brand), ascii("isom"))
    val mvhd = fullBox("mvhd",
      beInt(0), beInt(0), // creation/modification time
      beInt(timescale), beInt(duration),
      beInt(0x00010000L), beShort(0x0100), beShort(0), // rate, volume, reserved
      beInt(0), beInt(0), // reserved
      unityMatrix,
      Array.fill(24)(0.toByte), // pre_defined
      beInt(tracks.length + 1L)) // next_track_ID
    val trakBoxes = tracks.zipWithIndex.map { case (t, i) =>
      require(t.handler.length == 4 && t.codec.length == 4,
        s"handler/codec must be fourccs: ${t.handler}/${t.codec}")
      val tkhd = fullBox("tkhd",
        beInt(0), beInt(0), beInt(i + 1L), beInt(0), // times, id, reserved
        beInt(duration), beInt(0), beInt(0), // duration (movie scale), reserved
        beShort(0), beShort(0), // layer, alternate_group
        beShort(if (t.handler == "soun") 0x0100 else 0), beShort(0), // volume
        unityMatrix,
        beInt(t.width.toLong << 16), beInt(t.height.toLong << 16))
      val mdhd = fullBox("mdhd",
        beInt(0), beInt(0), beInt(t.timescale), beInt(t.duration),
        beShort(0x55c4), beShort(0)) // language 'und', pre_defined
      val hdlr = fullBox("hdlr",
        beInt(0), ascii(t.handler), beInt(0), beInt(0), beInt(0),
        Array[Byte](0)) // name: empty NUL-terminated
      // SampleEntry: 6 reserved bytes + data_reference_index(2)
      val sampleEntry = box(t.codec, Array.fill(6)(0.toByte), beShort(1))
      val stsd = fullBox("stsd", beInt(1), sampleEntry)
      val minf = box("minf", box("stbl", stsd))
      box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    }
    val moov = box("moov", (mvhd +: trakBoxes): _*)
    val free = box("free", Array.fill(4)(0.toByte))
    ftyp ++ free ++ moov ++ box("mdat", mdatPayload)
  }

  /** Build an MP4 whose video track carries REAL sample tables: stts
    * (one run of `sampleDelta`), stsc (`samplesPerChunk` per chunk,
    * last chunk partial), stsz (per-sample sizes), stco (ABSOLUTE
    * file offsets into the trailing mdat — written in a second pass
    * once the moov size is known; stco entries are fixed-width, so
    * patching offsets never moves the boxes). The mdat payload is the
    * chunk-ordered concatenation of `samples`, so
    * [[videoSamples]]/frame extraction read back the exact bytes.
    */
  def synthesizeMp4WithSamples(
      brand: String,
      timescale: Long,
      duration: Long,
      video: TrackSpec,
      samples: Seq[Array[Byte]],
      sampleDelta: Long,
      samplesPerChunk: Int,
      syncSamples: Seq[Int] = Nil, // 1-based; empty = no stss box
      cttsOffsets: Seq[Long] = Nil): Array[Byte] = // per sample
    synthesizeMp4Tracks(brand, timescale, duration, Seq(TrackSamples(
      video, samples, sampleDelta, samplesPerChunk, syncSamples,
      cttsOffsets)))

  /** One track's spec + sample data for [[synthesizeMp4Tracks]].
    * `editMediaTime` emits an edts/elst box (one version-0 entry at
    * rate 1.0) whose media_time shifts every sample's presentation
    * time — the composition-delay compensation real muxers write.
    */
  final case class TrackSamples(
      spec: TrackSpec, samples: Seq[Array[Byte]], sampleDelta: Long,
      samplesPerChunk: Int, syncSamples: Seq[Int] = Nil,
      cttsOffsets: Seq[Long] = Nil, editMediaTime: Option[Long] = None)

  /** Build an MP4 with MULTIPLE tracks carrying real sample tables —
    * the realistic shape of in-the-wild media (video + captions +
    * audio in one container). Each track gets its own trak box and
    * chunk run in the shared mdat (track-major layout; stco offsets
    * are absolute, so the order is the writer's choice); the two-pass
    * stco patch spans all tracks. Single-track calls produce the same
    * bytes as the historical [[synthesizeMp4WithSamples]].
    */
  def synthesizeMp4Tracks(
      brand: String,
      timescale: Long,
      duration: Long,
      tracks: Seq[TrackSamples]): Array[Byte] = {
    require(tracks.nonEmpty, "at least one track")
    tracks.foreach { t =>
      require(t.samplesPerChunk > 0, s"samplesPerChunk: ${t.samplesPerChunk}")
      require(t.cttsOffsets.isEmpty ||
        t.cttsOffsets.length == t.samples.length,
        "cttsOffsets must be empty or one per sample")
    }
    def nChunks(t: TrackSamples): Int =
      if (t.samples.isEmpty) 0
      else (t.samples.length + t.samplesPerChunk - 1) / t.samplesPerChunk
    def buildTrak(
        t: TrackSamples, trackId: Int,
        chunkOffsets: Seq[Long]): Array[Byte] = {
      val n = t.samples.length
      val tkhd = fullBox("tkhd",
        beInt(0), beInt(0), beInt(trackId.toLong), beInt(0),
        beInt(duration), beInt(0), beInt(0),
        beShort(0), beShort(0), beShort(0), beShort(0),
        unityMatrix,
        beInt(t.spec.width.toLong << 16),
        beInt(t.spec.height.toLong << 16))
      val mdhd = fullBox("mdhd",
        beInt(0), beInt(0), beInt(t.spec.timescale),
        beInt(t.spec.duration), beShort(0x55c4), beShort(0))
      val hdlr = fullBox("hdlr",
        beInt(0), ascii(t.spec.handler), beInt(0), beInt(0), beInt(0),
        Array[Byte](0))
      val sampleEntry =
        box(t.spec.codec, Array.fill(6)(0.toByte), beShort(1))
      val stsd = fullBox("stsd", beInt(1), sampleEntry)
      val stts = fullBox("stts", beInt(1), beInt(n.toLong),
        beInt(t.sampleDelta))
      val stsc = fullBox("stsc", beInt(1),
        beInt(1), beInt(t.samplesPerChunk.toLong), beInt(1))
      val stsz = fullBox("stsz", beInt(0), beInt(n.toLong),
        t.samples.toArray.flatMap(s => beInt(s.length.toLong)))
      val stco = fullBox("stco", beInt(nChunks(t).toLong),
        chunkOffsets.toArray.flatMap(beInt))
      val extras = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      if (t.syncSamples.nonEmpty)
        extras += fullBox("stss", beInt(t.syncSamples.length.toLong),
          t.syncSamples.toArray.flatMap(s => beInt(s.toLong)))
      if (t.cttsOffsets.nonEmpty) {
        // run-length compress consecutive equal offsets (spec shape)
        val runs = new scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        t.cttsOffsets.foreach { o =>
          if (runs.nonEmpty && runs.last._2 == o)
            runs(runs.length - 1) = (runs.last._1 + 1, o)
          else runs += ((1L, o))
        }
        // ISO 14496-12 §8.6.1.3: version-0 ctts offsets are UNSIGNED;
        // negative composition offsets require the version-1 box.
        val cttsVersion = if (t.cttsOffsets.exists(_ < 0)) 1 else 0
        extras += fullBoxV("ctts", cttsVersion, beInt(runs.length.toLong),
          runs.toArray.flatMap { case (c, o) =>
            beInt(c) ++ beInt(o & 0xffffffffL) })
      }
      val stbl = box("stbl",
        (Seq(stsd, stts, stsc, stsz, stco) ++ extras): _*)
      val mdia = box("mdia", mdhd, hdlr, box("minf", stbl))
      t.editMediaTime match {
        case Some(mt) =>
          require(mt >= 0 && mt < (1L << 31), s"editMediaTime: $mt")
          // one version-0 entry: whole-duration segment, media_time,
          // rate 1.0 — the composition-delay shape
          val elst = fullBox("elst", beInt(1),
            beInt(duration), beInt(mt), beShort(1), beShort(0))
          box("trak", tkhd, box("edts", elst), mdia)
        case None => box("trak", tkhd, mdia)
      }
    }
    def buildMoov(offsets: Seq[Seq[Long]]): Array[Byte] = {
      val mvhd = fullBox("mvhd",
        beInt(0), beInt(0), beInt(timescale), beInt(duration),
        beInt(0x00010000L), beShort(0x0100), beShort(0),
        beInt(0), beInt(0), unityMatrix,
        Array.fill(24)(0.toByte), beInt(tracks.length + 1L))
      val traks = tracks.zip(offsets).zipWithIndex.map {
        case ((t, off), i) => buildTrak(t, i + 1, off)
      }
      box("moov", (mvhd +: traks): _*)
    }
    val ftyp = box("ftyp", ascii(brand), beInt(0), ascii(brand), ascii("isom"))
    val free = box("free", Array.fill(4)(0.toByte))
    // pass 1: placeholder offsets fix the moov size; pass 2 patches
    val moovSize =
      buildMoov(tracks.map(t => Seq.fill(nChunks(t))(0L))).length
    var cursor = ftyp.length + free.length + moovSize + 8L
    val chunkStarts = tracks.map { t =>
      val starts = t.samples.grouped(t.samplesPerChunk)
        .scanLeft(cursor)((off, chunk) => off + chunk.map(_.length).sum)
        .take(nChunks(t)).toSeq
      cursor += t.samples.map(_.length.toLong).sum
      starts
    }
    val moov = buildMoov(chunkStarts)
    require(moov.length == moovSize, "stco patch moved the moov size")
    ftyp ++ free ++ moov ++
      box("mdat", tracks.toArray.flatMap(_.samples.toArray.flatten))
  }
}
