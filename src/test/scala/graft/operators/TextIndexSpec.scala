package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private val terms = Seq("spark", "hash", "window")

  test("pruned build scores exactly like the full build") {
    val full = TextIndex.score(TextIndex.build(docs), terms)
      .as[(Long, Long, Long, Long)].collect().toSet
    val pruned = TextIndex.score(
      TextIndex.build(docs, onlyTerms = Some(terms)), terms)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(full.nonEmpty)
    assert(full === pruned)
  }

  test("save/load round-trips the search results; bucketed postings " +
    "keep term aggregations exchange-free") {
    val idx = TextIndex.build(docs)
    val dir = java.nio.file.Files.createTempDirectory("tidx").toString
    TextIndex.save(spark, idx, dir, "tidx1", buckets = 4)
    val loaded = TextIndex.load(spark, dir, "tidx1")
    val mem = TextIndex.search(idx, terms, 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val disk = TextIndex.search(loaded, terms, 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(mem.nonEmpty)
    assert(mem === disk)
    // bucketed layout: a term-keyed aggregation over the catalog table
    // plans ZERO hash-partitioning exchanges (bucket pruning + bucketed
    // scan replace the shuffle)
    val agg = spark.table("tidx1_postings")
      .groupBy("term").agg(sum("tf"))
    assert(agg.count() > 0)
    val nExchanges = "Exchange hashpartitioning".r
      .findAllIn(agg.queryExecution.executedPlan.toString).length
    assert(nExchanges === 0,
      "term aggregation over bucketed postings should not shuffle:\n" +
        agg.queryExecution.executedPlan.toString)
    spark.sql("DROP TABLE IF EXISTS tidx1_postings")
  }

  test("appendSaved + load searches exactly like a full rebuild over " +
    "the union; fails loudly without the catalog entry") {
    val old = docs.where(col("doc_id") < 250)
    val fresh = docs.where(col("doc_id") >= 250)
    val dir = java.nio.file.Files.createTempDirectory("tidxApp").toString
    TextIndex.save(spark, TextIndex.build(old), dir, "tidx2", buckets = 4)
    TextIndex.appendSaved(spark, dir, "tidx2", fresh)
    val appended = TextIndex.search(
      TextIndex.load(spark, dir, "tidx2"), terms, 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    val rebuilt = TextIndex.search(TextIndex.build(docs), terms, 10)
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(appended.nonEmpty)
    // df/avgdl recompute makes append score-identical to a rebuild
    assert(appended === rebuilt)
    spark.sql("DROP TABLE tidx2_postings")
    val e = intercept[IllegalArgumentException] {
      TextIndex.appendSaved(spark, dir, "tidx2", fresh)
    }
    assert(e.getMessage.contains("catalog entry"))
  }

  test("search ranks by exact integer score, ties to the smaller doc_id") {
    val d = Seq((1L, "spark spark window"), (2L, "spark spark window"),
      (3L, "hash"), (4L, "nothing here"))
      .toDF("doc_id", "text")
    val got = TextIndex.search(TextIndex.build(d), terms, 10)
      .select("rnk", "doc_id").as[(Int, Long)].collect().toSeq
    // doc 3 ranks first (its rare term carries the highest idf and it
    // is the shortest doc); docs 1 and 2 tie exactly (identical
    // content) -> id order; doc 4 matches nothing and is absent
    assert(got.map(_._2) === Seq(3L, 1L, 2L))
    assert(got.map(_._1) === Seq(1, 2, 3))
  }
}
