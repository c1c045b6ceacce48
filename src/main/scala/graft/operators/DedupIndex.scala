package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent minhash-LSH membership index — the NEAR-dup twin of
  * [[VectorIndex]] (vectors) and [[TextIndex]] (BM25 postings), and the
  * banded complement of [[IncrementalDedup]]'s exact-hash Bloom path.
  *
  * The saved artifact is the corpus's band-bucket membership table
  * (`doc_id, b, key`) plus a 1-row meta table pinning the signature
  * geometry (shingle width `w`, signature length `k`, band count) —
  * the same geometry-pinning discipline as VectorIndex's frozen grid:
  * a probe or append NEVER recomputes or renegotiates the geometry, it
  * loads it, so two batches can't silently hash into incompatible
  * spaces (a mismatched shingle width would match nothing and report
  * "no duplicates" — the failure mode the meta table exists to stop).
  *
  * Scale shape: at 100 TB the membership table IS the dedup state.
  * Probing a new batch re-shingles ONLY the batch (one stateless
  * projection, no shuffle) and equi-joins its band keys against the
  * saved buckets — never re-reads corpus text, never an all-pairs
  * stage. Appends write new membership rows without touching existing
  * ones: band keys are content-derived, so the bucket space never
  * needs re-partitioning (the frozen-grid argument). Exact-Jaccard
  * verification of candidates stays with the caller, who owns the
  * corpus text.
  *
  * Reference anchor: the D1 compound-dedup discipline
  * (pickaxe.py:1497-1502 merges by content hash); this is its
  * similarity-space generalization for corpus curation.
  */
object DedupIndex {

  /** Signature geometry; `k % bands == 0` (r = k/bands rows per band). */
  final case class Geometry(w: Int, k: Int, bands: Int) {
    require(bands > 0 && k % bands == 0,
      s"k=$k must divide into bands=$bands")
    def r: Int = k / bands
  }

  /** One row per (doc, band): the LSH membership of `docs`. Stateless
    * projection + explode — works on batch and streaming inputs.
    */
  def membership(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      g: Geometry): DataFrame = {
    graft.expressions.Hash64.register(docs.sparkSession)
    val shSig = TextOps.shinglesAndSignature(w = g.w, k = g.k)
    docs
      .withColumn("__graft_r", shSig(col(textCol)))
      // docs shorter than w words have no shingles: no membership rows
      // (see TextOps.bandedDocs — md5('') would cross-match all of them)
      .where(expr("size(__graft_r._1) >= 1"))
      .select(col(idCol).cast("long").as("doc_id"),
        col("__graft_r._2").as("__graft_sig"))
      .select(col("doc_id"), col("__graft_sig"),
        explode(expr(s"sequence(0, ${g.bands - 1})")).as("b"))
      .withColumn("key", expr(TextOps.bandKey("__graft_sig", "b", g.r)))
      .select("doc_id", "b", "key")
  }

  /** Build and persist the index; returns the membership row count. */
  def save(
      path: String,
      docs: DataFrame,
      textCol: String,
      idCol: String,
      g: Geometry = Geometry(w = 3, k = 16, bands = 4)): Long = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = membership(docs, textCol, idCol, g)
    m.write.mode("overwrite").parquet(s"$path/buckets")
    Seq((g.w, g.k, g.bands)).toDF("w", "k", "bands")
      .write.mode("overwrite").parquet(s"$path/meta")
    spark.read.parquet(s"$path/buckets").count()
  }

  /** The pinned geometry of a saved index. */
  def loadGeometry(spark: SparkSession, path: String): Geometry = {
    val r = spark.read.parquet(s"$path/meta").head()
    Geometry(r.getAs[Int]("w"), r.getAs[Int]("k"), r.getAs[Int]("bands"))
  }

  /** The saved membership table. */
  def buckets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/buckets")

  /** Candidate near-dup pairs (new doc × corpus doc) against an
    * in-memory membership table: the batch is shingled with the SAME
    * geometry and equi-joined on (b, key). Self-pairs (re-probing a
    * doc already in the index) are dropped.
    */
  def probeBuckets(
      corpusBuckets: DataFrame,
      newDocs: DataFrame,
      textCol: String,
      idCol: String,
      g: Geometry): DataFrame = {
    val nm = membership(newDocs, textCol, idCol, g)
    nm.as("n")
      .join(corpusBuckets.as("c"),
        col("n.b") === col("c.b") && col("n.key") === col("c.key") &&
          col("n.doc_id") =!= col("c.doc_id"))
      .select(col("n.doc_id").as("new_id"),
        col("c.doc_id").as("corpus_id"))
      .distinct()
  }

  /** Disk-backed probe: the geometry comes from the SAVED meta table,
    * never from the caller.
    */
  def probe(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      textCol: String,
      idCol: String): DataFrame =
    probeBuckets(buckets(spark, path), newDocs, textCol, idCol,
      loadGeometry(spark, path))

  /** Append a batch's membership rows under the saved (frozen)
    * geometry; returns the number of rows added.
    */
  def appendSaved(
      spark: SparkSession,
      path: String,
      newDocs: DataFrame,
      textCol: String,
      idCol: String): Long = {
    val g = loadGeometry(spark, path)
    // count the (batch-sized) rows being appended — never scan the
    // existing index, whose size is the whole point of the artifact
    val m = membership(newDocs, textCol, idCol, g).localCheckpoint()
    m.write.mode("append").parquet(s"$path/buckets")
    m.count()
  }
}
