package graft.operators

/** Pure-JVM Ogg container walk (RFC 3533) with Opus (RFC 7845
  * OpusHead) and Vorbis (Vorbis I identification header) codec
  * detection — the Ogg leg of the audio-container matrix
  * (RIFF/WAVE + MP3 frame walk + FLAC metadata in [[AudioHeader]],
  * ISO-BMFF in [[VideoHeader]]). Metadata-level: page structure,
  * per-page CRC-32 VERIFICATION (the Ogg polynomial 0x04C11DB7,
  * unreflected, zero init/xorout — a corrupt page fails the parse,
  * never ships wrong durations), codec id fields, and the terminal
  * granule position that carries the stream duration. No DSP decode
  * claimed (Opus/Vorbis payloads are compressed bitstreams — the
  * same honest boundary as MP3/AAC).
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object OggHeader {

  /** Parsed stream facts. `durationMs` derives from the terminal
    * granule: Opus granules tick at 48 kHz minus the pre-skip
    * (RFC 7845 §4.2); Vorbis granules are samples at the id header's
    * rate.
    */
  final case class OggInfo(
      codec: String, // "opus" | "vorbis"
      channels: Int,
      sampleRate: Int, // Opus: input sample rate field; Vorbis: rate
      preSkip: Int, // Opus only; 0 for Vorbis
      lastGranule: Long,
      durationMs: Long,
      nPages: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int =
    (u8(b, i + 1) << 8) | u8(b, i)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i + 3).toLong << 24) | (u8(b, i + 2) << 16) |
      (u8(b, i + 1) << 8) | u8(b, i)
  private def le64(b: Array[Byte], i: Int): Long =
    le32(b, i + 4) << 32 | le32(b, i)

  /** Ogg CRC-32: poly 0x04C11DB7, no reflection, init 0, xorout 0 —
    * computed over the page with its CRC field zeroed (RFC 3533 §6).
    */
  private[operators] def crcOgg(
      b: Array[Byte], from: Int, until: Int, crcFieldAt: Int): Long = {
    var crc = 0L
    var i = from
    while (i < until) {
      val byte =
        if (i >= crcFieldAt && i < crcFieldAt + 4) 0 else u8(b, i)
      crc ^= byte.toLong << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0)
          ((crc << 1) ^ 0x04c11db7L) & 0xffffffffL
        else (crc << 1) & 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Parse an Ogg stream: page walk with CRC verification, codec id
    * from the FIRST beginning-of-stream page (Opus or Vorbis — other
    * codecs return None honestly), terminal granule from that
    * stream's last page. Truncated/desynced/corrupt pages, an
    * unknown codec, or a missing end-of-stream flag return None.
    * Never throws.
    */
  def parse(bytes: Array[Byte]): Option[OggInfo] = {
    if (bytes == null || bytes.length < 28) return None
    var pos = 0
    var info: Option[(String, Int, Int, Int)] = None // codec, ch, rate, preskip
    var serial = 0L
    var lastGranule = -1L
    var nPages = 0
    var sawEos = false
    while (pos < bytes.length) {
      if (pos + 27 > bytes.length) return None
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
          bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S')) return None
      if (u8(bytes, pos + 4) != 0) return None // version
      val headerType = u8(bytes, pos + 5)
      val granule = le64(bytes, pos + 6)
      val pageSerial = le32(bytes, pos + 14)
      val nSegs = u8(bytes, pos + 26)
      if (pos + 27 + nSegs > bytes.length) return None
      var payloadLen = 0
      var s = 0
      while (s < nSegs) { payloadLen += u8(bytes, pos + 27 + s); s += 1 }
      val pageEnd = pos + 27 + nSegs + payloadLen
      if (pageEnd > bytes.length) return None
      val crcGot = le32(bytes, pos + 22)
      if (crcOgg(bytes, pos, pageEnd, pos + 22) != crcGot) return None
      val payloadAt = pos + 27 + nSegs
      if ((headerType & 0x02) != 0 && info.isEmpty) { // first BOS page
        serial = pageSerial
        if (payloadLen >= 19 &&
            new String(bytes, payloadAt, 8, "US-ASCII") == "OpusHead") {
          val ch = u8(bytes, payloadAt + 9)
          val preSkip = le16(bytes, payloadAt + 10)
          val rate = le32(bytes, payloadAt + 12).toInt
          if (ch < 1) return None
          info = Some(("opus", ch, rate, preSkip))
        } else if (payloadLen >= 30 && u8(bytes, payloadAt) == 1 &&
            new String(bytes, payloadAt + 1, 6, "US-ASCII") == "vorbis") {
          val ch = u8(bytes, payloadAt + 11)
          val rate = le32(bytes, payloadAt + 12).toInt
          if (ch < 1 || rate < 1) return None
          info = Some(("vorbis", ch, rate, 0))
        } else return None // unknown codec: honest None
      }
      if (info.isDefined && pageSerial == serial) {
        nPages += 1
        if (granule >= 0) lastGranule = math.max(lastGranule, granule)
        if ((headerType & 0x04) != 0) sawEos = true
      }
      pos = pageEnd
    }
    info.collect {
      case (codec, ch, rate, preSkip) if sawEos =>
        val g = math.max(lastGranule, 0L)
        val dur = codec match {
          case "opus" => math.max(g - preSkip, 0L) * 1000 / 48000
          case _ => if (rate > 0) g * 1000 / rate else 0L
        }
        OggInfo(codec, ch, rate, preSkip, g, dur, nPages)
    }
  }

  // ------------------------------------------------------------------
  // fixture synthesizers (real parseable pages with real CRCs)
  // ------------------------------------------------------------------

  private def page(
      headerType: Int, granule: Long, serial: Long, seq: Int,
      payload: Array[Byte]): Array[Byte] = {
    val segs = new scala.collection.mutable.ArrayBuffer[Int]()
    var rest = payload.length
    while (rest >= 255) { segs += 255; rest -= 255 }
    segs += rest // final segment < 255 (also handles empty payload)
    val out = new Array[Byte](27 + segs.length + payload.length)
    "OggS".getBytes("US-ASCII").copyToArray(out)
    out(4) = 0
    out(5) = headerType.toByte
    var i = 0
    while (i < 8) { out(6 + i) = ((granule >> (8 * i)) & 0xff).toByte; i += 1 }
    i = 0
    while (i < 4) {
      out(14 + i) = ((serial >> (8 * i)) & 0xff).toByte
      out(18 + i) = ((seq >> (8 * i)) & 0xff).toByte
      i += 1
    }
    out(26) = segs.length.toByte
    segs.zipWithIndex.foreach { case (v, j) => out(27 + j) = v.toByte }
    payload.copyToArray(out, 27 + segs.length)
    val crc = crcOgg(out, 0, out.length, 22)
    i = 0
    while (i < 4) { out(22 + i) = ((crc >> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** Build an Ogg Opus stream: BOS OpusHead page, an OpusTags page,
    * then one audio page per entry of `pageGranules` (deterministic
    * filler payloads), last page flagged end-of-stream.
    */
  def synthesizeOggOpus(
      channels: Int, preSkip: Int, inputRate: Int,
      pageGranules: Seq[Long], payloadLen: Int = 120): Array[Byte] = {
    require(channels >= 1 && channels <= 255, s"channels: $channels")
    require(pageGranules.nonEmpty, "at least one audio page")
    val serial = 0x6f707573L
    val head = "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1,
      channels.toByte, (preSkip & 0xff).toByte,
      ((preSkip >> 8) & 0xff).toByte,
      (inputRate & 0xff).toByte, ((inputRate >> 8) & 0xff).toByte,
      ((inputRate >> 16) & 0xff).toByte,
      ((inputRate >> 24) & 0xff).toByte, 0, 0, 0)
    val tags = "OpusTags".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "graft".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= page(0x02, 0L, serial, 0, head)
    out ++= page(0x00, 0L, serial, 1, tags)
    pageGranules.zipWithIndex.foreach { case (g, i) =>
      val last = i == pageGranules.length - 1
      val payload = Array.tabulate[Byte](payloadLen)(j =>
        ((g + i * 31 + j) % 251).toByte)
      out ++= page(if (last) 0x04 else 0x00, g, serial, 2 + i, payload)
    }
    out.toArray
  }

  /** Build an Ogg Vorbis stream: BOS identification-header page, then
    * audio pages as in [[synthesizeOggOpus]].
    */
  def synthesizeOggVorbis(
      channels: Int, sampleRate: Int,
      pageGranules: Seq[Long], payloadLen: Int = 120): Array[Byte] = {
    require(channels >= 1 && channels <= 255, s"channels: $channels")
    require(sampleRate >= 1, s"rate: $sampleRate")
    require(pageGranules.nonEmpty, "at least one audio page")
    val serial = 0x766f7262L
    val head = Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, channels.toByte,
        (sampleRate & 0xff).toByte, ((sampleRate >> 8) & 0xff).toByte,
        ((sampleRate >> 16) & 0xff).toByte,
        ((sampleRate >> 24) & 0xff).toByte) ++
      Array.fill[Byte](12)(0) ++ Array[Byte](0x66.toByte, 1)
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= page(0x02, 0L, serial, 0, head)
    pageGranules.zipWithIndex.foreach { case (g, i) =>
      val last = i == pageGranules.length - 1
      val payload = Array.tabulate[Byte](payloadLen)(j =>
        ((g + i * 17 + j) % 251).toByte)
      out ++= page(if (last) 0x04 else 0x00, g, serial, 1 + i, payload)
    }
    out.toArray
  }
}
