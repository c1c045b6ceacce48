package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Cdx: SURT canonicalization pins, the CDXJ parse (typed fields,
  * forgiving damage handling), and the writer/parser roundtrip.
  */
class CdxSpec extends SparkSuite {
  import spark.implicits._

  test("surt: reversal, www/scheme/fragment/default-port dropping, " +
    "query sort, lowercase; garbage -> empty, never a throw") {
    assert(Cdx.surt("https://www.Example.COM/Path?b=2&a=1#frag") ===
      "com,example)/path?a=1&b=2")
    assert(Cdx.surt("http://ex.com") === "com,ex)/")
    assert(Cdx.surt("http://ex.com:80/x") === "com,ex)/x")
    assert(Cdx.surt("https://ex.com:443/x") === "com,ex)/x")
    assert(Cdx.surt("http://ex.com:8080/x") === "com,ex:8080)/x")
    assert(Cdx.surt("sub.deep.ex.org/p") === "org,ex,deep,sub)/p")
    assert(Cdx.surt("http://ex.com/?") === "com,ex)/")
    assert(Cdx.surt(null) === "")
    assert(Cdx.surt("") === "")
    assert(Cdx.surt("http://") === "")
  }

  test("cdxjRecords: typed fields out; damaged lines (bad ts, bad " +
    "json, missing parts) drop while their neighbors survive") {
    val good = """com,ex)/a 20260101120000 {"url":"https://ex.com/a","mime":"text/html","status":"200","digest":"sha1:AAA","length":120,"offset":4096,"filename":"shard-00.warc.gz"}"""
    val text = Seq(
      good,
      "com,ex)/b 2026 {\"url\":\"https://ex.com/b\"}", // short ts
      "com,ex)/c 20260101120000 not-json", // bad json
      "just-garbage",
      """com,ex)/d 20260101130000 {"url":"https://ex.com/d","status":"404","offset":9,"length":3,"filename":"s.warc.gz"}"""
    ).mkString("\n")
    val out = Cdx.cdxjRecords(Seq((7L, text)).toDF("id", "text"),
      "text").orderBy("urlkey")
    val rows = out.collect()
    assert(rows.length === 2)
    assert(out.columns.toSeq === Seq("id", "urlkey", "ts", "url",
      "mime", "status", "digest", "length", "offset", "filename"))
    val r0 = rows(0)
    assert(r0.getLong(0) === 7L)
    assert(r0.getString(1) === "com,ex)/a")
    assert(r0.getString(2) === "20260101120000")
    assert(r0.getString(3) === "https://ex.com/a")
    assert(r0.getInt(5) === 200)
    assert(r0.getLong(7) === 120L) // length
    assert(r0.getLong(8) === 4096L) // offset
    assert(rows(1).getString(1) === "com,ex)/d")
    assert(rows(1).getString(4) === null) // absent mime stays null
  }

  test("writer/parser roundtrip: cdxjLine output parses back to the " +
    "same typed fields, urlkey from surt") {
    val caps = Seq(
      ("https://www.Ex.com/A?z=1&a=2", "20260202020202", "text/html",
        200, "sha1:XYZ", 512L, 1024L, "w-01.warc.gz"),
      ("http://b.org/q", "20260303030303", "text/plain",
        404, "sha1:QQQ", 64L, 99L, "w-02.warc.gz"))
      .toDF("url", "ts", "mime", "status", "digest", "length",
        "offset", "filename")
    val lines = caps.select(Cdx.cdxjLine(col("url"), col("ts"),
      col("mime"), col("status"), col("digest"), col("length"),
      col("offset"), col("filename")).as("text"))
    val back = Cdx.cdxjRecords(lines, "text").orderBy("ts")
      .collect()
    assert(back.length === 2)
    assert(back(0).getString(0) === "com,ex)/a?a=2&z=1")
    assert(back(0).getString(2) === "https://www.Ex.com/A?z=1&a=2")
    assert(back(0).getInt(4) === 200)
    assert(back(0).getLong(6) === 512L)
    assert(back(1).getString(0) === "org,b)/q")
    assert(back(1).getLong(7) === 99L)
    assert(back(1).getString(8) === "w-02.warc.gz")
  }
}
