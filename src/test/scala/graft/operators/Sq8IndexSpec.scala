package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Persistent IVF-SQ8 index: save/load probe parity, geometry-frozen
  * append (grid + centroids), out-of-grid clamping, and the
  * exchange-free bucketed probe layout.
  */
class Sq8IndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vectors = {
    val rows = (0 until 100).map { i =>
      val g = i % 4
      val base = Array.fill(8)(0.05f * ((i * 7 + 3) % 5))
      base(g) = 1.0f + 0.01f * (i % 10)
      (i.toLong, base.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("save/load probe parity; self-query lands in its own group; " +
    "coded side joins exchange-free") {
    val idx = VectorIndex.buildSq8Index(vectors, kCentroids = 4)
    val dir = java.nio.file.Files.createTempDirectory("sq8").toString
    VectorIndex.saveSq8(spark, idx, "sq8a", dir, buckets = 4)
    val loaded = VectorIndex.loadSq8(spark, "sq8a", dir)
    val queries = vectors.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val mem = VectorIndex.querySq8(idx, queries)
      .as[(Long, Long, Long, Long)].collect().toSet
    val disk = VectorIndex.querySq8(loaded, queries)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mem.nonEmpty)
    assert(mem === disk)
    // the query itself is indexed -> best sqdist 0; the winner shares
    // the query's direction group (some fixture vectors COINCIDE —
    // e.g. 10 and 50 — so the tie-break may pick a smaller id, not
    // necessarily the query's own)
    mem.foreach { case (qid, _, best, bestId) =>
      assert(best === 0L && bestId % 4 === qid % 4)
    }
    // bucketed coded side: a non-broadcast join on cell shuffles only
    // the other side
    val other = idx.centroids.select(col("c_id").as("cell"), col("cnq"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("sq8a_coded").join(other, Seq("cell"))
      assert(joined.count() > 0)
      val nExchanges = "Exchange hashpartitioning".r
        .findAllIn(joined.queryExecution.executedPlan.toString).length
      assert(nExchanges === 1)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("append codes against the frozen grid; saved append equals " +
    "in-memory; out-of-grid arrivals clamp to the byte range") {
    val old = vectors.where(col("vec_id") < 80)
    val freshIn = vectors.where(col("vec_id") >= 80)
    // one arrival far outside the build grid in every dimension
    val outlier = Seq((999L, Seq.fill(8)(50.0f))).toDF(
      "vec_id", "embedding")
    val fresh = freshIn.unionByName(outlier)
    val idx = VectorIndex.buildSq8Index(old, kCentroids = 4)
    val dir = java.nio.file.Files.createTempDirectory("sq8b").toString
    VectorIndex.saveSq8(spark, idx, "sq8b", dir, buckets = 4)
    VectorIndex.appendSavedSq8(spark, "sq8b", dir, fresh)
    val loaded = VectorIndex.loadSq8(spark, "sq8b", dir)
    assert(loaded.coded.count() === 101L)
    val queries = vectors.where(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val mem = VectorIndex.querySq8(
        VectorIndex.appendSq8(idx, fresh), queries)
      .as[(Long, Long, Long, Long)].collect().toSet
    val disk = VectorIndex.querySq8(loaded, queries)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mem === disk)
    // the outlier's code is a valid byte array, all 255 (clamped high)
    val oc = loaded.coded.where(col("vec_id") === 999L)
      .select("code").as[Seq[Long]].head()
    assert(oc.forall(_ == 255L))
    // catalog gone -> loud failure, not a silent bucket-contract break
    spark.sql("DROP TABLE sq8b_coded")
    val err = intercept[IllegalArgumentException] {
      VectorIndex.appendSavedSq8(spark, "sq8b", dir, fresh)
    }
    assert(err.getMessage.contains("bucketed append needs the saving " +
      "catalog entry"))
  }
}
