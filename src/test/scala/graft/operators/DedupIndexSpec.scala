package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Disk round-trip for the persistent near-dup index: the saved meta
  * pins the geometry, the probe matches a planted near-dup through the
  * saved buckets, and appends extend the bucket table under the frozen
  * geometry (the registry's q_dedup_index_probe gates the in-memory
  * math against DuckDB; this spec owns the persistence contract).
  */
class DedupIndexSpec extends SparkSuite {

  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank"
  private val corpus = Seq(
    (1L, base),
    (2L, base + " at dawn"), // near-dup of 1
    (3L, "completely different text about spark physical planning " +
      "and shuffle exchanges in distributed queries"),
    (4L, "tiny")) // < 3 tokens: no shingles, no membership rows
  private val batch = Seq(
    (10L, base + " at dusk"), // near-dup of 1 and 2
    (11L, "nothing like anything indexed here metrics dashboards " +
      "alerts and oncall rotations forever"))

  test("save pins the geometry and writes one row per (doc, band)") {
    val dir = Files.createTempDirectory("dedupidx").toString
    val n = DedupIndex.save(dir, corpus.toDF("doc_id", "text"),
      "text", "doc_id", DedupIndex.Geometry(w = 3, k = 16, bands = 4))
    // 3 corpus docs have >= 3 tokens, 4 bands each
    assert(n === 12L)
    val g = DedupIndex.loadGeometry(spark, dir)
    assert(g === DedupIndex.Geometry(3, 16, 4))
    assert(DedupIndex.buckets(spark, dir).count() === 12L)
  }

  test("probe matches planted near-dups through the saved buckets " +
    "and appends extend them under the frozen geometry") {
    val dir = Files.createTempDirectory("dedupidx").toString
    DedupIndex.save(dir, corpus.toDF("doc_id", "text"),
      "text", "doc_id", DedupIndex.Geometry(w = 3, k = 16, bands = 4))
    val hits = DedupIndex.probe(spark, dir,
        batch.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    // doc 10 shares nearly all shingles with 1 and 2 — at least one
    // of its 4 bands must collide with each; doc 11 matches nothing
    assert(hits.contains((10L, 1L)) && hits.contains((10L, 2L)),
      s"planted near-dup not found: $hits")
    assert(!hits.exists(_._1 == 11L), s"false probe hit: $hits")
    assert(!hits.exists(_._2 == 3L), s"false corpus hit: $hits")

    // append the batch; a doc near-dup of an APPENDED doc now matches
    val added = DedupIndex.appendSaved(spark, dir,
      batch.toDF("doc_id", "text"), "text", "doc_id")
    assert(added === 8L) // both batch docs have shingles, 4 bands each
    val hits2 = DedupIndex.probe(spark, dir,
        Seq((20L, base + " at dusk tonight")).toDF("doc_id", "text"),
        "text", "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(hits2.contains((20L, 10L)),
      s"append not visible to a later probe: $hits2")
    // probe never self-matches a doc id already in the index
    val self = DedupIndex.probe(spark, dir,
        batch.take(1).toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Long)].collect()
    assert(!self.exists(p => p._1 == 10L && p._2 == 10L),
      "self-pair leaked through the probe")
  }

  test("membership is deterministic and batch/corpus symmetric: the " +
    "probe equals the full self-join restricted to the split") {
    val g = DedupIndex.Geometry(w = 3, k = 16, bands = 4)
    val all = (corpus ++ batch).toDF("doc_id", "text")
    val m = DedupIndex.membership(all, "text", "doc_id", g)
      .localCheckpoint()
    val viaProbe = DedupIndex.probeBuckets(
        m.where(col("doc_id") < 10), batch.toDF("doc_id", "text"),
        "text", "doc_id", g)
      .as[(Long, Long)].collect().toSet
    val viaSelfJoin = m.as("x").join(m.as("y"),
        col("x.b") === col("y.b") && col("x.key") === col("y.key") &&
          col("x.doc_id") >= 10 && col("y.doc_id") < 10)
      .select(col("x.doc_id"), col("y.doc_id"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(viaProbe === viaSelfJoin)
  }
}
