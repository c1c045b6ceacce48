package graft.queries

import java.nio.file.Files

import graft.SparkSuite

/** Hand-computed fixture for q_text_perplexity: the DuckDB oracle
  * proves cross-engine agreement, but both engines could agree on the
  * wrong formula — this pins the add-one bigram model itself.
  *
  * Corpus: d1 = "a b a b", d2 = "a b c".
  * Counts: C(a b)=3, C(b a)=1, C(b c)=1; C(a)=3, C(b)=3, C(c)=1; V=3.
  * P(w2|w1) = (C(w1 w2)+1) / (C(w1)+V):
  *   P(b|a) = 4/6, P(a|b) = 2/6, P(c|b) = 2/6.
  * Integer-scaled per-bigram scores round(-ln(p)*1e4):
  *   -ln(4/6) -> 4055, -ln(2/6) -> 10986.
  * d1 (a b, b a, a b): ss = 4055+10986+4055 = 19096, n_big = 3.
  * d2 (a b, b c):      ss = 4055+10986       = 15041, n_big = 2.
  */
class PerplexitySpec extends SparkSuite {
  import spark.implicits._

  test("add-one bigram self-perplexity matches hand computation") {
    val dir = Files.createTempDirectory("ppl_fixture").toString
    Seq(
      (1L, "a b a b", "en", "srcA", 7L),
      (2L, "a b c", "en", "srcA", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("q_text_perplexity")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_big"), r.getAs[Double]("nll"))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 3L)
    assert(got(2L)._1 === 2L)
    assert(math.abs(got(1L)._2 - 19096.0 / 30000.0) < 1e-12)
    assert(math.abs(got(2L)._2 - 15041.0 / 20000.0) < 1e-12)
  }
}
