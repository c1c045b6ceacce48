package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, explode, expr, split, udf}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** Common Crawl's CDXJ index surface — the third leg of the crawl
  * format family next to [[Warc]] (records) and WET (extracted
  * text): an index line per capture, `<urlkey> <timestamp> <json>`,
  * where urlkey is the SURT (Sort-friendly URI Reordering
  * Transform) canonical form that makes one host's captures sort
  * adjacently. Pipelines read the index to FIND records (offset +
  * length + filename point into the WARC) before fetching anything;
  * a 100 TB corpus build prunes by urlkey ranges exactly because of
  * this sort order.
  *
  * Reference analog: none — crawl-front-end surface beyond the
  * reference (SURVEY.md north-star: web-corpus ingestion).
  */
object Cdx {

  /** SURT canonical form of a URL — the index key: lowercase, scheme
    * and fragment dropped, a leading `www.` label dropped, default
    * ports (:80/:443) dropped (others kept on the host), host labels
    * reversed with commas, `)` then the path (`/` when empty), query
    * parameters SORTED so parameter order never splits a capture
    * group. Null/garbage in -> "" (never throws).
    */
  def surt(url: String): String = {
    if (url == null) return ""
    val u = url.trim.toLowerCase(java.util.Locale.ROOT)
    val noScheme = {
      val i = u.indexOf("://")
      if (i >= 0) u.substring(i + 3) else u
    }
    if (noScheme.isEmpty) return ""
    val hostEnd = {
      val s = noScheme.indexOf('/')
      val q = noScheme.indexOf('?')
      val cands = Seq(s, q).filter(_ >= 0)
      if (cands.isEmpty) noScheme.length else cands.min
    }
    var hostPort = noScheme.substring(0, hostEnd)
    val rest = noScheme.substring(hostEnd)
    val (host0, port) = {
      val c = hostPort.lastIndexOf(':')
      if (c > 0 && hostPort.drop(c + 1).forall(_.isDigit))
        (hostPort.substring(0, c), hostPort.substring(c + 1))
      else (hostPort, "")
    }
    val host = if (host0.startsWith("www.")) host0.drop(4) else host0
    if (host.isEmpty) return ""
    val rev = host.split('.').reverse.mkString(",")
    val portPart =
      if (port.isEmpty || port == "80" || port == "443") ""
      else ":" + port
    val (path0, query0) = {
      val noFrag = {
        val h = rest.indexOf('#')
        if (h >= 0) rest.substring(0, h) else rest
      }
      val q = noFrag.indexOf('?')
      if (q >= 0) (noFrag.substring(0, q), noFrag.substring(q + 1))
      else (noFrag, "")
    }
    val path = if (path0.isEmpty) "/" else path0
    val query =
      if (query0.isEmpty) ""
      else "?" + query0.split('&').filter(_.nonEmpty)
        .sorted.mkString("&")
    rev + portPart + ")" + path + query
  }

  /** [[surt]] as a column (a scala UDF — the per-row work is string
    * slicing, negligible next to the scan).
    */
  def surtCol(c: Column): Column = {
    val u = udf((s: String) => surt(s))
    u(c)
  }

  private val FieldsSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("mime", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("length", LongType),
    StructField("offset", LongType),
    StructField("filename", StringType)))

  /** Parse CDXJ text (one `urlkey timestamp {json}` capture per
    * line) into typed rows: (urlkey, ts, url, mime, status, digest,
    * length, offset, filename). Forgiving: lines that do not split
    * into three parts, carry a non-14-digit timestamp, or whose
    * JSON does not parse are DROPPED (a real index shard ships with
    * damage; the walk keeps what parses). Line explode + regexp
    * split + from_json — whole-stage codegen, no UDF.
    */
  def cdxjRecords(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__line", explode(split(col(textCol), "\n")))
      .withColumn("__m", expr(
        "regexp_extract_all(__line, '^(\\\\S+) (\\\\d{14}) (\\\\{.*\\\\})$', 0)"))
      .where(expr("size(__m) = 1"))
      .withColumn("urlkey", expr(
        "regexp_extract(__line, '^(\\\\S+) (\\\\d{14}) (\\\\{.*\\\\})$', 1)"))
      .withColumn("ts", expr(
        "regexp_extract(__line, '^(\\\\S+) (\\\\d{14}) (\\\\{.*\\\\})$', 2)"))
      .withColumn("__json", expr(
        "regexp_extract(__line, '^(\\\\S+) (\\\\d{14}) (\\\\{.*\\\\})$', 3)"))
      .withColumn("__f", org.apache.spark.sql.functions
        .from_json(col("__json"), FieldsSchema))
      .where(col("__f").isNotNull && col("__f.url").isNotNull)
      .select((df.columns.filter(_ != textCol).map(col).toSeq ++
        Seq(col("urlkey"), col("ts"), col("__f.url").as("url"),
          col("__f.mime").as("mime"),
          expr("cast(__f.status as int)").as("status"),
          col("__f.digest").as("digest"),
          col("__f.length").as("length"),
          col("__f.offset").as("offset"),
          col("__f.filename").as("filename"))): _*)

  /** Render capture columns as CDXJ lines — the index WRITER side
    * (urlkey from [[surtCol]], fields as a compact JSON object).
    * Pure column algebra so an index build over a 100 TB crawl is
    * one codegen'd projection.
    */
  def cdxjLine(url: Column, ts: Column, mime: Column,
      status: Column, digest: Column, length: Column,
      offset: Column, filename: Column): Column = {
    import org.apache.spark.sql.functions.{concat, lit, to_json, struct}
    concat(surtCol(url), lit(" "), ts, lit(" "),
      to_json(struct(url.as("url"), mime.as("mime"),
        status.cast("string").as("status"), digest.as("digest"),
        length.as("length"), offset.as("offset"),
        filename.as("filename"))))
  }
}
