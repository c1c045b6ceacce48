package graft.operators

/** Pure-JVM Ogg container walk (RFC 3533) with Opus (RFC 7845
  * OpusHead), Vorbis (Vorbis I identification header), and FLAC
  * (the FLAC-to-Ogg mapping's 0x7F"FLAC" BOS packet) codec
  * detection — the Ogg leg of the audio-container matrix
  * (RIFF/WAVE + MP3 frame walk + FLAC metadata in [[AudioHeader]],
  * ISO-BMFF in [[VideoHeader]]). Page structure and codec ids are
  * metadata-level with per-page CRC-32 VERIFICATION (the Ogg
  * polynomial 0x04C11DB7, unreflected, zero init/xorout — a corrupt
  * page fails the parse, never ships wrong durations); Opus/Vorbis
  * payloads stay undecoded honestly (compressed bitstreams, the
  * same boundary as MP3/AAC), but FLAC-in-Ogg payloads REASSEMBLE
  * ([[oggFlacStream]]: lacing-value packet reconstruction across
  * page boundaries) into a plain FLAC stream [[FlacDecode]] decodes
  * bit-exactly — .oga blobs ride the same decode gates as .flac.
  *
  * Reference analog: none — the reference has no media path; this is
  * pipeline surface the survey adds beyond it (SURVEY.md multimodal).
  */
object OggHeader {

  /** Parsed stream facts. `durationMs` derives from the terminal
    * granule: Opus granules tick at 48 kHz minus the pre-skip
    * (RFC 7845 §4.2); Vorbis and FLAC granules are samples at the id
    * header's rate.
    */
  final case class OggInfo(
      codec: String, // "opus" | "vorbis" | "flac"
      channels: Int,
      sampleRate: Int, // Opus: input sample rate field; Vorbis/FLAC: rate
      preSkip: Int, // Opus only; 0 for Vorbis/FLAC
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
        } else if (payloadLen >= 51 && u8(bytes, payloadAt) == 0x7f &&
            new String(bytes, payloadAt + 1, 4, "US-ASCII") == "FLAC" &&
            u8(bytes, payloadAt + 5) == 1) {
          // FLAC-to-Ogg mapping BOS packet: 0x7F "FLAC" major minor
          // nHeaders(BE16) then a verbatim "fLaC" + STREAMINFO block;
          // rate/channels read from the embedded STREAMINFO fields
          val si = payloadAt + 9
          if (new String(bytes, si, 4, "US-ASCII") != "fLaC") return None
          val b = si + 8 // past the metadata block header
          val rate = u8(bytes, b + 10) << 12 | u8(bytes, b + 11) << 4 |
            (u8(bytes, b + 12) >>> 4)
          val ch = ((u8(bytes, b + 12) >>> 1) & 7) + 1
          if (rate < 1) return None
          info = Some(("flac", ch, rate, 0))
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
  // packet reassembly + the FLAC-to-Ogg mapping
  // ------------------------------------------------------------------

  /** Reassemble the logical packets of the FIRST beginning-of-stream
    * serial: lacing values concatenate (255 = segment continues, <255
    * ends the packet), and a packet spans pages when a page's final
    * lacing is 255 (the next same-serial page carries the
    * continuation flag). Pages are CRC-verified like [[parse]];
    * truncated pages, desync, or a dangling unterminated packet
    * return None. Never throws.
    */
  private[operators] def streamPackets(
      bytes: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (bytes == null || bytes.length < 28) return None
    var pos = 0
    var serial = 0L
    var haveSerial = false
    val packets = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var cur = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length) {
      if (pos + 27 > bytes.length) return None
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
          bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S')) return None
      if (u8(bytes, pos + 4) != 0) return None
      val headerType = u8(bytes, pos + 5)
      val pageSerial = le32(bytes, pos + 14)
      val nSegs = u8(bytes, pos + 26)
      if (pos + 27 + nSegs > bytes.length) return None
      var payloadLen = 0
      var s = 0
      while (s < nSegs) { payloadLen += u8(bytes, pos + 27 + s); s += 1 }
      val pageEnd = pos + 27 + nSegs + payloadLen
      if (pageEnd > bytes.length) return None
      if (crcOgg(bytes, pos, pageEnd, pos + 22) != le32(bytes, pos + 22))
        return None
      if ((headerType & 0x02) != 0 && !haveSerial) {
        serial = pageSerial
        haveSerial = true
      }
      if (haveSerial && pageSerial == serial) {
        // a page starting mid-packet must say so, and vice versa
        if (((headerType & 0x01) != 0) != (cur.size > 0)) return None
        var off = pos + 27 + nSegs
        s = 0
        while (s < nSegs) {
          val l = u8(bytes, pos + 27 + s)
          cur.write(bytes, off, l)
          off += l
          if (l < 255) {
            packets += cur.toByteArray
            cur = new java.io.ByteArrayOutputStream()
          }
          s += 1
        }
      }
      pos = pageEnd
    }
    if (!haveSerial || cur.size > 0) None else Some(packets.toSeq)
  }

  /** Rebuild the plain FLAC stream embedded in an Ogg-FLAC container
    * (the public FLAC-to-Ogg mapping): packet 0 is 0x7F "FLAC" major
    * minor nHeaders(BE16) + a verbatim "fLaC" STREAMINFO block; the
    * following header packets are one metadata block each; every
    * later packet is FLAC frame data. Metadata-block last-flags are
    * REWRITTEN (all clear, final set) so the rebuilt stream is valid
    * regardless of how the muxer left them, and an nHeaders of 0
    * (legal: "unknown") falls back to the mapping's own disambiguator
    * — audio packets start with the 0xFF frame sync, which no valid
    * metadata block header can (type 127 is forbidden). The result
    * feeds [[FlacDecode.decode]] unchanged; None for anything that is
    * not well-formed Ogg-FLAC. Never throws.
    */
  def oggFlacStream(bytes: Array[Byte]): Option[Array[Byte]] = {
    val packets = streamPackets(bytes).getOrElse(return None)
    if (packets.isEmpty) return None
    val p0 = packets.head
    if (p0.length < 51 || (p0(0) & 0xff) != 0x7f ||
        new String(p0, 1, 4, "US-ASCII") != "FLAC" ||
        (p0(5) & 0xff) != 1) return None
    val nHeaders = ((p0(7) & 0xff) << 8) | (p0(8) & 0xff)
    if (new String(p0, 9, 4, "US-ASCII") != "fLaC") return None
    if ((p0(13) & 0x7f) != 0) return None // first block is STREAMINFO
    val blocks = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    blocks += java.util.Arrays.copyOfRange(p0, 13, p0.length)
    val rest = packets.tail
    val nHdr =
      if (nHeaders > 0) nHeaders
      else rest.indexWhere(p => p.nonEmpty && (p(0) & 0xff) == 0xff) match {
        case -1 => rest.length
        case i => i
      }
    if (rest.length < nHdr) return None
    rest.take(nHdr).foreach { p =>
      if (p.length < 4) return None
      blocks += p
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    blocks.zipWithIndex.foreach { case (b, i) =>
      val h = b.clone()
      h(0) = (if (i == blocks.length - 1) (h(0) | 0x80)
        else (h(0) & 0x7f)).toByte
      out.write(h)
    }
    rest.drop(nHdr).foreach(out.write)
    Some(out.toByteArray)
  }

  /** Wrap a plain FLAC stream as Ogg-FLAC — fixture + executable
    * spec of [[oggFlacStream]]: the mapping's BOS packet (0x7F"FLAC"
    * 1.0, nHeaders, verbatim "fLaC" + STREAMINFO), any further
    * metadata blocks as one packet each, a VORBIS_COMMENT header
    * packet (the mapping makes one mandatory), then the frame bytes
    * split into `audioChunk`-byte packets packed `segsPerPage`
    * lacing segments to a page — small values force packets to SPAN
    * page boundaries, so the continuation-flag path is
    * fixture-exercised, not dead code. Terminal granule = the
    * STREAMINFO sample count (the mapping's rule).
    */
  def synthesizeOggFlac(
      flac: Array[Byte], audioChunk: Int = 1000,
      segsPerPage: Int = 16): Array[Byte] = {
    require(flac.length > 42 &&
      new String(flac, 0, 4, "US-ASCII") == "fLaC", "not a FLAC stream")
    require(audioChunk >= 1 && segsPerPage >= 1, "chunk/segs")
    // walk the metadata blocks
    var off = 4
    var last = false
    val blocks = new scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    while (!last) {
      last = (flac(off) & 0x80) != 0
      val len = ((flac(off + 1) & 0xff) << 16) |
        ((flac(off + 2) & 0xff) << 8) | (flac(off + 3) & 0xff)
      blocks += java.util.Arrays.copyOfRange(flac, off, off + 4 + len)
      off += 4 + len
    }
    require((blocks.head(0) & 0x7f) == 0, "first block not STREAMINFO")
    val si = blocks.head
    val totalSamples = ((si(4 + 13) & 0xfL) << 32) |
      ((si(4 + 14) & 0xffL) << 24) | ((si(4 + 15) & 0xffL) << 16) |
      ((si(4 + 16) & 0xffL) << 8) | (si(4 + 17) & 0xffL)
    val frames = java.util.Arrays.copyOfRange(flac, off, flac.length)
    // packets
    val vorbisComment = {
      val vendor = "graft".getBytes("US-ASCII")
      val body = Array[Byte](vendor.length.toByte, 0, 0, 0) ++ vendor ++
        Array[Byte](0, 0, 0, 0)
      Array((0x80 | 4).toByte, // VORBIS_COMMENT, last-metadata flag
        ((body.length >> 16) & 0xff).toByte,
        ((body.length >> 8) & 0xff).toByte,
        (body.length & 0xff).toByte) ++ body
    }
    val nHeaders = blocks.length // tail blocks + the vorbis comment
    val p0 = Array(0x7f.toByte) ++ "FLAC".getBytes("US-ASCII") ++
      Array[Byte](1, 0, ((nHeaders >> 8) & 0xff).toByte,
        (nHeaders & 0xff).toByte) ++
      "fLaC".getBytes("US-ASCII") ++ {
        val h = si.clone(); h(0) = (h(0) & 0x7f).toByte; h
      }
    val headerPackets = Seq(p0) ++
      blocks.tail.map { b =>
        val h = b.clone(); h(0) = (h(0) & 0x7f).toByte; h
      } ++ Seq(vorbisComment)
    val audioPackets = frames.grouped(audioChunk).toSeq
    // granule of the page a packet COMPLETES on: headers 0, audio
    // pages the terminal sample count (exact per-page granules need
    // frame decode; the terminal value is what duration reads)
    packPages(headerPackets.map(_ -> 0L) ++
      audioPackets.map(_ -> totalSamples), 0x666c6143L, segsPerPage)
  }

  /** Pack (packet, granule) pairs into pages, `segsPerPage` lacing
    * values per page: packets lace as 255-runs + a terminator < 255,
    * spanning pages (continuation flag) when the segments run out
    * mid-packet. Page granule = granule of the last packet COMPLETED
    * on the page, or -1 when none completes. First page carries BOS,
    * last carries EOS.
    */
  private def packPages(
      packets: Seq[(Array[Byte], Long)], serial: Long,
      segsPerPage: Int): Array[Byte] = {
    // lace every packet into (segments, packetIdx) then group pages
    final case class Seg(len: Int, packetIdx: Int, last: Boolean)
    val segs = packets.zipWithIndex.flatMap { case ((p, _), pi) =>
      val full = p.length / 255
      val remTail = p.length % 255
      (0 until full).map(_ => Seg(255, pi, last = false)) :+
        Seg(remTail, pi, last = true)
    }
    val pages = segs.grouped(segsPerPage).toSeq
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    var consumed = Array.fill(packets.length)(0)
    var midPacket = false
    var seqNo = 0
    pages.zipWithIndex.foreach { case (pageSegs, pgIdx) =>
      val payload = new java.io.ByteArrayOutputStream()
      var granule = -1L
      pageSegs.foreach { sg =>
        payload.write(packets(sg.packetIdx)._1,
          consumed(sg.packetIdx), sg.len)
        consumed(sg.packetIdx) += sg.len
        if (sg.last) granule = packets(sg.packetIdx)._2
      }
      var headerType = 0
      if (midPacket) headerType |= 0x01
      if (pgIdx == 0) headerType |= 0x02
      if (pgIdx == pages.length - 1) headerType |= 0x04
      out ++= rawPage(headerType, granule, serial, seqNo,
        pageSegs.map(_.len), payload.toByteArray)
      midPacket = !pageSegs.last.last
      seqNo += 1
    }
    out.toArray
  }

  /** Emit one page with EXPLICIT lacing values (unlike [[page]],
    * which always laces a whole packet) — real CRC, given segments.
    */
  private def rawPage(
      headerType: Int, granule: Long, serial: Long, seq: Int,
      lacing: Seq[Int], payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](27 + lacing.length + payload.length)
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
    out(26) = lacing.length.toByte
    lacing.zipWithIndex.foreach { case (v, j) => out(27 + j) = v.toByte }
    payload.copyToArray(out, 27 + lacing.length)
    val crc = crcOgg(out, 0, out.length, 22)
    i = 0
    while (i < 4) { out(22 + i) = ((crc >> (8 * i)) & 0xff).toByte; i += 1 }
    out
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
