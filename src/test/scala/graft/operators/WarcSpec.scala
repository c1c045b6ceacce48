package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Warc: ISO 28500 record parsing (plain + gzip-member layouts), the
  * HTTP payload split, forgiving-tail semantics, hostility.
  */
class WarcSpec extends AnyFunSuite {

  private def resp(doc: Int, k: Int): Warc.WarcRecord =
    Warc.WarcRecord("response", s"https://ex.com/$doc/$k",
      "application/http;msgtype=response",
      Warc.synthesizeHttp(200 + (k % 3) * 100, "text/html",
        s"page $doc:$k" + (if (k % 2 == 1) " é" else "")))

  private def fixture(doc: Int, n: Int): Seq[Warc.WarcRecord] =
    Warc.WarcRecord("warcinfo", "", "application/warc-fields",
      "software: graft\r\n".getBytes("ISO-8859-1")) +:
      (0 until n).map(k => resp(doc, k))

  test("plain and gzip layouts roundtrip: member-per-record, coarser " +
    "members, and single-member all parse to the same records") {
    val recs = fixture(7, 5)
    val plain = Warc.synthesizeWarc(recs)
    for (blob <- Seq(plain, Warc.synthesizeWarcGz(recs, 1),
        Warc.synthesizeWarcGz(recs, 3), Warc.synthesizeWarcGz(recs, 99))) {
      val got = Warc.records(blob)
      assert(got.length === 6)
      assert(got.head.warcType === "warcinfo")
      got.tail.zipWithIndex.foreach { case (r, k) =>
        assert(r.warcType === "response")
        assert(r.targetUri === s"https://ex.com/7/$k")
        assert(r.body.toSeq === recs(k + 1).body.toSeq)
      }
    }
  }

  test("httpBody splits status/content-type/UTF-8 entity body; " +
    "warcDocuments is pinned by the record arithmetic") {
    val h = Warc.httpBody(Warc.synthesizeHttp(404, "text/plain",
      "café body")).get
    assert(h.status === 404)
    assert(h.contentType === "text/plain")
    assert(h.body === "café body")
    assert(Warc.httpBody("not http".getBytes) === None)
    assert(Warc.httpBody(Array.empty[Byte]) === None)
    // the records -> documents bridge keeps only HTTP responses
    val recs = fixture(3, 4)
    val all = Warc.records(Warc.synthesizeWarcGz(recs, 1))
    val docs = all.filter(_.warcType == "response")
      .flatMap(r => Warc.httpBody(r.body).map(p => (r.targetUri, p)))
    assert(docs.length === 4)
    assert(docs.map(_._2.status) === Seq(200, 300, 400, 200))
    assert(docs(1)._2.body === "page 3:1 é")
  }

  test("charset-aware entity-body decode: header charset wins, meta " +
    "sniff falls back, UTF-8 default; legacy aliases map to " +
    "windows-1252") {
    // header path: latin-1 label, windows-1252 bytes (é = 0xE9,
    // € = 0x80 — the 0x80-0x9f range only windows-1252 carries)
    val h1 = Warc.httpBody(Warc.synthesizeHttp(200,
      "text/html; charset=iso-8859-1", "café €9", "windows-1252")).get
    assert(h1.body === "café €9")
    // meta-sniff path: no header charset, <meta charset=...> in body
    val metaHtml = "<html><head><meta charset=\"windows-1252\">" +
      "</head><body>café</body></html>"
    val h2 = Warc.httpBody(Warc.synthesizeHttp(200, "text/html",
      metaHtml, "windows-1252")).get
    assert(h2.body === metaHtml)
    // meta http-equiv variant
    val eqHtml = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=iso-8859-1\"></head>" +
      "<body>naïve</body></html>"
    assert(Warc.httpBody(Warc.synthesizeHttp(200, "text/html",
      eqHtml, "ISO-8859-1")).get.body === eqHtml)
    // default stays UTF-8
    assert(Warc.httpBody(Warc.synthesizeHttp(200, "text/html",
      "café")).get.body === "café")
    // an unknown charset label falls back to UTF-8, never throws
    assert(Warc.httpBody(Warc.synthesizeHttp(200,
      "text/html; charset=no-such-cs", "plain")).get.body === "plain")
    // a UTF-8-decoded windows-1252 page WOULD mojibake — the pin
    // that makes the charset path load-bearing
    val raw = Warc.synthesizeHttp(200, "text/html; charset=utf-8",
      "café", "windows-1252")
    assert(Warc.httpBody(raw).get.body !== "café")
    assert(Warc.charsetParam("text/html; charset=UTF-8") === "UTF-8")
    assert(Warc.charsetParam("text/html") === "")
  }

  test("wetDocuments: conversion records (WET — plain-text payload, " +
    "no HTTP envelope) flow to text rows; responses are ignored") {
    val recs = Seq(
      Warc.WarcRecord("warcinfo", "", "application/warc-fields",
        "software: graft\r\n".getBytes("ISO-8859-1")),
      Warc.WarcRecord("conversion", "https://ex.com/a", "text/plain",
        "extracted text é".getBytes("UTF-8")),
      resp(1, 0),
      Warc.WarcRecord("conversion", "https://ex.com/b", "text/plain",
        "second page".getBytes("UTF-8")))
    val conv = Warc.records(Warc.synthesizeWarcGz(recs, 1))
      .filter(_.warcType == "conversion")
    assert(conv.map(_.targetUri) ===
      Seq("https://ex.com/a", "https://ex.com/b"))
    assert(new String(conv.head.body, "UTF-8") === "extracted text é")
  }

  test("forgiving tail: records before the first malformation are " +
    "kept; truncation, garbage, corrupt gzip -> what parsed; fuzz " +
    "never throws") {
    val recs = fixture(9, 4)
    val plain = Warc.synthesizeWarc(recs)
    // a garbage tail after two whole records keeps exactly those two
    val cut = Warc.synthesizeWarc(recs.take(2)) ++
      "CORRUPT TAIL no version line".getBytes("ISO-8859-1")
    assert(Warc.records(cut).map(_.warcType) ===
      Seq("warcinfo", "response"))
    // truncation mid-record keeps the whole records before it
    (0 until plain.length by 37).foreach { n =>
      val got = Warc.records(plain.take(n))
      assert(got.length <= 6)
      got.foreach(r => assert(r.warcType.nonEmpty))
    }
    assert(Warc.records("garbage".getBytes) === Seq.empty)
    assert(Warc.records(Array.empty[Byte]) === Seq.empty)
    assert(Warc.records(null) === Seq.empty)
    // corrupt gzip: empty, never a throw
    val gz = Warc.synthesizeWarcGz(recs, 1)
    val dmg = gz.clone()
    dmg(gz.length / 2) = (dmg(gz.length / 2) ^ 0x55).toByte
    Warc.records(dmg) // any prefix of members may parse; no throw
    val rnd = new scala.util.Random(19)
    (1 to 200).foreach { _ =>
      val m = (if (rnd.nextBoolean()) plain else gz).clone()
      m(rnd.nextInt(m.length)) = rnd.nextInt().toByte
      Warc.records(m) // never throws
    }
  }
}
