package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Pins the residual IVF-PQ chain against its one sharp edge: the
  * md5-ordered codebook draw and the coarse centroid draw rank by the
  * SAME key, so without the zero-residual filter
  * (ProductQuantizer.residCbBase) the codebook is kCodes copies of the
  * zero vector (a sampled centroid is its own cosine-nearest centroid,
  * residual exactly zero), every vector codes identically, and ADC
  * carries no signal. This spec asserts the built index is
  * NON-degenerate on real data and that the zero-residual rows exist
  * (i.e. the hazard is live, not hypothetical).
  */
class ResidualPqSpec extends SparkSuite {

  private lazy val e = Tables.load(spark, sf, "embeddings")
    .withColumn("qe", VectorOps.quantize("embedding"))
    .withColumn("nq", VectorOps.normSq("qe"))
    .select("vec_id", "qe", "nq")

  test("sampled centroids have exactly-zero residuals (the hazard)") {
    val k = VectorOps.suggestedCentroids(e.count())
    val ivfpq = ProductQuantizer.buildIvfPqResidual(e, k)
    val resid = ProductQuantizer.residuals(
      e.select("vec_id", "qe"), ivfpq.cellOf, ivfpq.cent)
    val zeroIds = resid.where(VectorOps.normSq("qe") === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val centIds = ivfpq.cent.select("c_id").collect()
      .map(_.getLong(0)).toSet
    // every sampled centroid is its own nearest centroid -> residual 0
    assert(centIds.subsetOf(zeroIds),
      s"expected all $k centroids to have zero residuals; missing " +
        s"${centIds -- zeroIds}")
  }

  test("residual codebook and codes are non-degenerate") {
    val k = VectorOps.suggestedCentroids(e.count())
    val ivfpq = ProductQuantizer.buildIvfPqResidual(e, k)
    // no codebook entry is the zero vector
    val zeroEntries = ivfpq.cb.where(col("cnorm") === 0).count()
    assert(zeroEntries === 0L,
      s"$zeroEntries zero codebook entries — residCbBase filter lost")
    // the coded corpus spreads over many distinct code words: a
    // single-word encoding means ADC distances are constant per query
    // (the pre-fix degeneracy this spec exists to catch)
    val words = ivfpq.codes
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("j"), col("code"))))
        .as("w"))
      .select(countDistinct("w")).head().getLong(0)
    val n = e.count()
    assert(words > n / 2,
      s"only $words distinct code words over $n vectors — the " +
        "residual codebook is (near-)degenerate")
  }

  test("persistent residual index: flag survives save/load with probe " +
    "parity; appends code residuals against the existing geometry") {
    val raw = Tables.load(spark, sf, "embeddings")
    val k = VectorOps.suggestedCentroids(e.count())
    val idx = VectorIndex.buildIvfPqResidualIndex(e, k)
    assert(idx.residual)
    val dir = java.nio.file.Files.createTempDirectory("vpqr").toString
    VectorIndex.savePq(spark, idx, "vpqr", dir, buckets = 4)
    val loaded = VectorIndex.loadPq(spark, "vpqr", dir)
    // the flag rides with the codebook: a loaded residual index can
    // never be silently probed with the plain distance tables
    assert(loaded.residual)
    val queries = raw.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    import spark.implicits._
    val mem = VectorIndex.queryPq(idx, queries, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    val disk = VectorIndex.queryPq(loaded, queries, nprobe = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(mem.nonEmpty)
    assert(mem === disk)
    // append an exact duplicate under a fresh id: same cell, same
    // residual, hence byte-identical packed codes — proves the append
    // path routes through the residual encoding, not the plain one
    val fresh = raw.where(col("vec_id") === 7L)
      .select(lit(990007L).as("vec_id"), col("embedding"))
    val appended = VectorIndex.appendPq(idx, fresh)
    // the RETURNED index must still carry the residual flag — a
    // positional reconstruction once dropped it, silently routing
    // post-append probes through the plain distance tables
    assert(appended.residual)
    val distinctForms = appended.coded
      .where(col("vec_id").isin(7L, 990007L))
      .select("cell", "codes").distinct().count()
    assert(distinctForms === 1L,
      "appended duplicate must land in the same cell with identical " +
        "residual codes")
  }
}
