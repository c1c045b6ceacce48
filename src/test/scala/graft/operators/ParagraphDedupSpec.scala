package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** dedupParagraphs: the CCNet-style paragraph-hash dedup — key
  * normalization, corpus-wide keep-first, ordered reassembly, and
  * the all-paragraphs-dropped edge.
  */
class ParagraphDedupSpec extends SparkSuite {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]): Map[Long, String] =
    TextOps.dedupParagraphs(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("paragraphKey: case, digits, punctuation, and space runs " +
    "collapse; letter sequence is the identity") {
    val got = Seq("Hello,  WORLD! 42", "hello world", "h-e l. lo")
      .toDF("p").select(TextOps.paragraphKey(col("p")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("hello world", "hello world", "he l lo"))
  }

  test("corpus-wide keep-first by (doc, position): later copies drop " +
    "from their documents, kept paragraphs keep document order") {
    val out = run(Seq(
      1L -> "alpha one\nShared Line\nbeta one",
      2L -> "shared line!\nalpha two",  // normalized dup of doc 1's
      3L -> "gamma three\nSHARED LINE 9"))
    assert(out(1L) === "alpha one\nShared Line\nbeta one")
    assert(out(2L) === "alpha two")
    assert(out(3L) === "gamma three")
  }

  test("within-document repeats collapse too (first position wins); " +
    "a document of nothing but repeats comes back empty") {
    val out = run(Seq(
      5L -> "same para\nsame para\nother",
      6L -> "Same Para.\nsame  para"))
    assert(out(5L) === "same para\nother")
    assert(out(6L) === "")
  }

  test("ties break by doc id then position: the smallest (doc, idx) " +
    "occurrence is the survivor regardless of input row order") {
    val out = run(Seq(
      9L -> "x marks\nkeeper",
      4L -> "filler\nkeeper",
      7L -> "keeper\ntail"))
    assert(out(4L) === "filler\nkeeper")
    assert(out(7L) === "tail")
    assert(out(9L) === "x marks")
  }
}
