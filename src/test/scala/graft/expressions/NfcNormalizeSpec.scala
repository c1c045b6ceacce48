package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** graft_nfc: composition semantics, ASCII fast path, idempotence,
  * null safety, and the full normalizeProjection chain on unicode
  * fixtures (the real corpus is ASCII — these edges live here).
  * Fixtures are built from \u escapes so the decomposed/composed
  * distinction is visible in the source.
  */
class NfcNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val composed = "é"       // é, single code point
  private val decomposed = "é"    // e + COMBINING ACUTE ACCENT

  private def nfc(s: String): String =
    Seq(Tuple1(s)).toDF("t").selectExpr("graft_nfc(t)").as[String].head()

  test("composes decomposed sequences and is idempotent") {
    assert(nfc(decomposed) === composed)
    assert(nfc(composed) === composed)
    assert(nfc(nfc("caf" + decomposed + " å")) ===
      "caf" + composed + " å")
    // Hangul: conjoining jamo compose into the syllable block
    assert(nfc("가") === "가")
  }

  test("ASCII passes through unchanged (fast path)") {
    assert(nfc("plain ascii 123 !@#") === "plain ascii 123 !@#")
    assert(nfc("") === "")
  }

  test("null in, null out") {
    val out = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .selectExpr("graft_nfc(t)").collect()
    assert(out.head.isNullAt(0))
  }

  test("normalizeProjection chain: NFC, ctrl strip, collapse, trim") {
    import graft.operators.TextOps
    val rows = Seq(
      // \t \x01 sp a b sp sp sp e ́ \x02 \t sp → "ab é"
      // nfc_changed=1; ctrl \x01+\x02 = 2; ws 10→6 collapsed = 4
      "\t\u0001 ab   " + decomposed + "\u0002\t ",
      "clean text", // nothing to do
      // sp e ́ \x07 \x7f sp sp → "é": ctrl=2, ws 4→3 = 1
      " " + decomposed + "\u0007\u007f  ").toDF("t")
      .select(TextOps.normalizeProjection(col("t")).as("np"))
      .select("np.nfc_changed", "np.ctrl_removed", "np.ws_collapsed",
        "np.normalized")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rows(0) === ((1L, 2L, 4L, "ab " + composed)))
    assert(rows(1) === ((0L, 0L, 0L, "clean text")))
    assert(rows(2) === ((1L, 2L, 1L, composed)))
  }
}
