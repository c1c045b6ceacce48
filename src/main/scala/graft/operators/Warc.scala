package graft.operators

/** WARC (ISO 28500 — the Common Crawl / web-archive container)
  * record parsing, pure JVM: the web-scale text SOURCE a 100 TB
  * corpus build actually starts from. A WARC file is a sequence of
  * records — a `WARC/1.x` version line, CRLF-separated named headers
  * until a blank line, `Content-Length` octets of payload, then a
  * blank-line separator — usually stored gzip-compressed with ONE
  * GZIP MEMBER PER RECORD (so archives are seekable); the reader
  * inflates concatenated members transparently. Response records
  * carry an HTTP message as payload; [[httpBody]] splits status line
  * / headers / entity body, the bridge into the documents table.
  *
  * Hostile-input contract: [[records]] parses records up to the
  * first malformation and returns what it saw (the forgiving-stream
  * semantics real WARC tooling uses — one truncated tail must not
  * void a 1 GB archive), bounded by [[MaxRecords]]/[[MaxBytes]];
  * never throws.
  *
  * Reference analog: none — the reference has no corpus path; this
  * is the LLM-training-data surface the survey adds beyond it.
  */
object Warc {

  /** Caps mirroring the other decoders' bomb guards. */
  val MaxRecords = 100000
  val MaxBytes: Long = 1L << 28 // 256 MB inflated per blob

  /** One parsed record: the WARC headers that matter downstream +
    * the raw payload octets.
    */
  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      contentType: String,
      body: Array[Byte])

  /** An HTTP response payload split: status code, the entity body
    * (after the header/body blank line) decoded per the declared
    * charset (see [[httpBody]]), and the HTTP Content-Type header
    * value ("" when absent).
    */
  final case class HttpPayload(
      status: Int, contentType: String, body: String)

  /** Resolve a declared charset name to a JVM Charset; None for
    * unknown/unsupported names (caller falls back to UTF-8). The
    * whatwg rule that matters at crawl scale: a bare "iso-8859-1" /
    * "latin1" / "us-ascii" label almost always marks windows-1252
    * bytes in the wild (the 0x80-0x9f range carries curly quotes and
    * the euro sign there), so those aliases map to windows-1252.
    */
  private[operators] def charsetFor(
      name: String): Option[java.nio.charset.Charset] = {
    val n = name.trim.toLowerCase.stripPrefix("\"").stripSuffix("\"")
      .stripPrefix("'").stripSuffix("'")
    if (n.isEmpty) None
    else if (n == "utf-8" || n == "utf8")
      Some(java.nio.charset.StandardCharsets.UTF_8)
    else if (n == "iso-8859-1" || n == "latin1" || n == "latin-1" ||
      n == "us-ascii" || n == "ascii" || n == "windows-1252" ||
      n == "cp1252" || n == "x-cp1252")
      Some(java.nio.charset.Charset.forName("windows-1252"))
    else
      try Some(java.nio.charset.Charset.forName(n))
      catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pull `charset=...` out of a Content-Type value ("" if absent). */
  private[operators] def charsetParam(contentType: String): String = {
    val lower = contentType.toLowerCase
    val ci = lower.indexOf("charset=")
    if (ci < 0) return ""
    val start = ci + 8
    var end = start
    while (end < contentType.length && contentType.charAt(end) != ';' &&
      !contentType.charAt(end).isWhitespace) end += 1
    contentType.substring(start, end)
  }

  /** Bounded `<meta charset=...>` / `<meta http-equiv="content-type"
    * content="...charset=...">` sniff over the first `limit` body
    * octets (ASCII-compatible scan, the way browsers pre-scan);
    * "" when nothing is declared.
    */
  private[operators] def sniffMetaCharset(
      payload: Array[Byte], from: Int, limit: Int = 1024): String = {
    val end = math.min(payload.length, from + limit)
    if (end <= from) return ""
    val head = new String(payload, from, end - from,
      java.nio.charset.StandardCharsets.ISO_8859_1).toLowerCase
    var i = head.indexOf("<meta")
    while (i >= 0) {
      val gt = head.indexOf('>', i)
      val tag = head.substring(i, if (gt < 0) head.length else gt)
      val ci = tag.indexOf("charset=")
      if (ci >= 0) {
        var s = ci + 8
        // skip quote if the attribute itself is quoted
        if (s < tag.length && (tag.charAt(s) == '"' || tag.charAt(s) == '\''))
          s += 1
        var e = s
        while (e < tag.length && !"\"' ;/".contains(tag.charAt(e))) e += 1
        if (e > s) return tag.substring(s, e)
      }
      i = head.indexOf("<meta", i + 5)
    }
    ""
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Inflate a (possibly multi-member) gzip stream, bounded by
    * [[MaxBytes]]; None on corruption. JDK GZIPInputStream reads
    * concatenated members natively — the per-record-member layout
    * Common Crawl uses needs no special casing.
    */
  private[operators] def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](65536)
      var n = in.read(buf)
      while (n >= 0 && out.size <= MaxBytes) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      if (out.size > MaxBytes) None else Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parse the records of a WARC blob (plain or gzipped). Records
    * after the first malformation are dropped, parsed ones returned.
    */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    if (bytes == null || bytes.length < 8) return Seq.empty
    val b =
      if (isGzip(bytes)) gunzip(bytes).getOrElse(return Seq.empty)
      else bytes
    val out = new scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var off = 0
    var ok = true
    while (ok && off < b.length && out.length < MaxRecords) {
      // skip inter-record blank lines
      while (off + 1 < b.length && b(off) == '\r' && b(off + 1) == '\n')
        off += 2
      if (off >= b.length) ok = false
      else parseRecord(b, off) match {
        case Some((rec, next)) =>
          out += rec
          off = next
        case None => ok = false
      }
    }
    out.toSeq
  }

  /** One record at `off`: version line, headers, body. Returns the
    * record and the offset past its payload.
    */
  private def parseRecord(
      b: Array[Byte], off: Int): Option[(WarcRecord, Int)] = {
    var i = off
    def line(): Option[String] = {
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n'))
        i += 1
      if (i + 1 >= b.length) None
      else {
        val s = new String(b, start, i - start,
          java.nio.charset.StandardCharsets.ISO_8859_1)
        i += 2
        Some(s)
      }
    }
    val version = line().getOrElse(return None)
    if (!version.startsWith("WARC/")) return None
    var warcType = ""
    var uri = ""
    var ctype = ""
    var length = -1L
    var l = line().getOrElse(return None)
    while (l.nonEmpty) {
      val colon = l.indexOf(':')
      if (colon > 0) {
        val name = l.substring(0, colon).trim.toLowerCase
        val value = l.substring(colon + 1).trim
        name match {
          case "warc-type" => warcType = value
          case "warc-target-uri" => uri = value
          case "content-type" => ctype = value
          case "content-length" =>
            length = try value.toLong catch { case _: Exception => -1L }
          case _ => ()
        }
      } else return None // a non-empty, non-header line is malformed
      l = line().getOrElse(return None)
    }
    if (length < 0 || length > MaxBytes ||
      i + length > b.length) return None
    val body = java.util.Arrays.copyOfRange(b, i, (i + length).toInt)
    Some((WarcRecord(warcType, uri, ctype, body), (i + length).toInt))
  }

  /** Split an HTTP message payload: `HTTP/1.x NNN ...` status line,
    * headers to the blank line, entity body decoded CHARSET-AWARE:
    * `charset=` in the Content-Type header wins, else a bounded
    * `<meta charset>` sniff over the first 1 KiB of the body, else
    * UTF-8. A real crawl is 10-20% legacy-encoded — decoding those
    * pages as UTF-8 would mojibake them into the corpus and poison
    * dedup/quality downstream. None when the payload is not an HTTP
    * message.
    */
  def httpBody(payload: Array[Byte]): Option[HttpPayload] = {
    if (payload == null || payload.length < 12) return None
    val s = new String(payload,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    if (!s.startsWith("HTTP/")) return None
    val headEnd = s.indexOf("\r\n\r\n")
    if (headEnd < 0) return None
    val head = s.substring(0, headEnd)
    val lines = head.split("\r\n")
    val statusParts = lines(0).split(" ")
    if (statusParts.length < 2) return None
    val status = try statusParts(1).toInt
      catch { case _: Exception => return None }
    val ctype = lines.drop(1).collectFirst {
      case h if h.toLowerCase.startsWith("content-type:") =>
        h.substring(h.indexOf(':') + 1).trim
    }.getOrElse("")
    // decode the ENTITY BODY from the original octets (the latin1
    // round-trip above was only for header scanning): header charset
    // -> meta sniff -> UTF-8
    val declared = charsetParam(ctype) match {
      case "" => sniffMetaCharset(payload, headEnd + 4)
      case c => c
    }
    val cs = charsetFor(declared)
      .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    val body = new String(payload, headEnd + 4,
      payload.length - headEnd - 4, cs)
    Some(HttpPayload(status, ctype, body))
  }

  /** Explode a binary WARC column into one row per RESPONSE record
    * with an HTTP payload: `uri`, `http_status`, `content_type` (the
    * HTTP one), `text` (the entity body) — the Common-Crawl ->
    * documents-table bridge, a stateless per-row projection (batch
    * and streaming frames plan identically).
    */
  def warcDocuments(
      df: org.apache.spark.sql.DataFrame,
      binaryCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val extract = udf { bytes: Array[Byte] =>
      records(bytes).filter(_.warcType == "response").flatMap { r =>
        httpBody(r.body).map(h =>
          (r.targetUri, h.status, h.contentType, h.body))
      }
    }
    df.withColumn("__wr", explode(extract(col(binaryCol))))
      .withColumn("uri", col("__wr._1"))
      .withColumn("http_status", col("__wr._2"))
      .withColumn("content_type", col("__wr._3"))
      .withColumn("text", col("__wr._4"))
      .drop("__wr")
  }

  /** Explode a binary WET column (Common Crawl's pre-extracted-text
    * sibling of WARC — the file real text pipelines overwhelmingly
    * read) into one row per CONVERSION record: `uri`, `text`. WET
    * payloads are plain UTF-8 text with no HTTP envelope, so the
    * bridge is the record walk alone. Same stateless per-row shape
    * as [[warcDocuments]].
    */
  def wetDocuments(
      df: org.apache.spark.sql.DataFrame,
      binaryCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val extract = udf { bytes: Array[Byte] =>
      records(bytes).filter(_.warcType == "conversion").map { r =>
        (r.targetUri, new String(r.body,
          java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    df.withColumn("__wr", explode(extract(col(binaryCol))))
      .withColumn("uri", col("__wr._1"))
      .withColumn("text", col("__wr._2"))
      .drop("__wr")
  }

  // ------------------------------------------------------------------
  // fixture synthesizers (real parseable WARC bytes)
  // ------------------------------------------------------------------

  /** Serialize records as a plain WARC stream (CRLF grammar, exact
    * Content-Length) — fixture + executable spec of [[records]].
    */
  def synthesizeWarc(recs: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val head = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append(s"WARC-Type: ${r.warcType}\r\n")
      if (r.targetUri.nonEmpty)
        head.append(s"WARC-Target-URI: ${r.targetUri}\r\n")
      if (r.contentType.nonEmpty)
        head.append(s"Content-Type: ${r.contentType}\r\n")
      head.append(s"Content-Length: ${r.body.length}\r\n\r\n")
      out.write(head.toString.getBytes("ISO-8859-1"))
      out.write(r.body)
      out.write("\r\n\r\n".getBytes("ISO-8859-1"))
    }
    out.toByteArray
  }

  /** Build an HTTP response payload with an exact entity body,
    * encoded in `charset` (UTF-8 by default; pass e.g.
    * "windows-1252" to fixture a legacy-encoded page — note the
    * Content-Type value itself must carry `; charset=...` for the
    * header path, or the body a meta tag, for [[httpBody]] to pick
    * it up).
    */
  def synthesizeHttp(
      status: Int, contentType: String, body: String,
      charset: String = "UTF-8"): Array[Byte] = {
    val octets = body.getBytes(charset)
    (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${octets.length}\r\n\r\n")
      .getBytes("ISO-8859-1") ++ octets
  }

  /** Gzip with ONE MEMBER PER GROUP of `perMember` records — the
    * Common Crawl member-per-record layout (perMember = 1) and
    * coarser groupings, so the concatenated-member inflate path is
    * fixture-exercised.
    */
  def synthesizeWarcGz(
      recs: Seq[WarcRecord], perMember: Int = 1): Array[Byte] = {
    require(perMember >= 1, s"perMember: $perMember")
    val out = new java.io.ByteArrayOutputStream()
    recs.grouped(perMember).foreach { group =>
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(synthesizeWarc(group))
      gz.finish()
    }
    out.toByteArray
  }
}
