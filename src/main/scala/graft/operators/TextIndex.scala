package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted BM25 index — the text twin of [[VectorIndex]]:
  * build once, save the postings TERM-BUCKETED, and answer keyword
  * queries with plans whose corpus side is exchange-free.
  *
  * Layout at `path` for index `name`:
  *  - `{name}_postings`: (term, doc_id, tf) parquet, `bucketBy(term)` +
  *    `sortBy(term)` via the catalog (the [[VectorIndex]] save
  *    contract): a query's `term IN (...)` filter prunes row groups and
  *    any term-keyed join/aggregation reuses the bucketing — no shuffle
  *    of the postings at query time;
  *  - `{name}_doclens`: (doc_id, dl) parquet;
  *  - `{name}_df`: (term, df) parquet — document frequencies;
  *  - `{name}_stats`: one row (n, avgdl).
  *
  * Scoring is Okapi BM25 (k1=1.2, b=0.75) with the SAME float
  * discipline as the gated batch scorer (q_text_bm25 delegates here, so
  * the index and the ad-hoc path cannot drift): each per-term score is
  * scaled to an exact 1e-4 integer BEFORE the per-doc sum, making the
  * sum order-independent at any parallelism.
  *
  * Scale posture: build is two hash-partitioned aggregations (tf on
  * (doc, term), df on term); df and stats are vocabulary-sized /
  * 1-row side tables; query-time tf is pruned to the query's terms
  * BEFORE anything shuffles.
  */
final case class Bm25Index(
    postings: DataFrame, // term, doc_id, tf
    docLens: DataFrame, // doc_id, dl
    dfTable: DataFrame, // term, df
    stats: DataFrame) // 1 row: n, avgdl

object TextIndex {

  /** Tokenized (doc_id, dl) + exploded (doc_id, term) base. */
  private def tokenized(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__graft_t", TextOps.tokens(textCol))
      .where(expr("size(__graft_t) > 0"))
      .select(col(idCol).as("doc_id"),
        expr("cast(size(__graft_t) as bigint)").as("dl"),
        col("__graft_t"))

  /** Build the full inverted index in memory. Pass `onlyTerms` to
    * build a QUERY-PRUNED index instead (tf/df restricted to those
    * terms by a broadcast join BEFORE the shuffle): scores for those
    * terms are identical to the full index's — df, n, avgdl do not
    * depend on the pruning — which is how the ad-hoc BM25 scorer
    * shares this code without paying for a full vocabulary pass.
    */
  def build(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      onlyTerms: Option[Seq[String]] = None): Bm25Index = {
    val base = tokenized(docs, idCol, textCol)
    val docLens = base.select("doc_id", "dl")
    val stats = docLens.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    val tok = base.select(col("doc_id"),
      explode(col("__graft_t")).as("term"))
    val pruned = onlyTerms match {
      case Some(ts) =>
        val spark = docs.sparkSession
        import spark.implicits._
        tok.join(broadcast(ts.toDF("term")), Seq("term"))
      case None => tok
    }
    val tf = pruned.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    Bm25Index(tf.select("term", "doc_id", "tf"), docLens, dfT, stats)
  }

  /** Per-doc integer BM25 scores for `terms`: (doc_id, dl, n_terms,
    * s4) with s4 the exact 1e-4-scaled score sum — THE one scoring
    * definition (q_text_bm25 and the index search query both consume
    * it).
    */
  def score(idx: Bm25Index, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    val spark = idx.postings.sparkSession
    import spark.implicits._
    val qt = broadcast(terms.toDF("term"))
    idx.postings.join(qt, Seq("term"))
      .join(broadcast(idx.dfTable.join(qt, Seq("term"))), Seq("term"))
      .join(idx.docLens, Seq("doc_id"))
      .crossJoin(broadcast(idx.stats))
      .withColumn("s",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id", "dl")
      .agg(count(lit(1)).as("n_terms"),
        sum(round(col("s") * 10000).cast("long")).as("s4"))
      .select("doc_id", "dl", "n_terms", "s4")
  }

  /** Top-k search over the index: rank by exact (s4 desc, doc_id) —
    * TakeOrdered, then a k-row rank window.
    */
  def search(idx: Bm25Index, terms: Seq[String], k: Int): DataFrame = {
    val top = score(idx, terms)
      .orderBy(col("s4").desc, col("doc_id").asc).limit(k)
    top.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("s4").desc, col("doc_id").asc)))
      .select("rnk", "doc_id", "n_terms", "s4")
  }

  /** Persist: postings term-bucketed via the catalog (the
    * [[VectorIndex]] contract — `option("path", ...)` keeps the files
    * external to the warehouse dir); side tables as plain parquet.
    */
  def save(
      spark: SparkSession,
      idx: Bm25Index,
      path: String,
      name: String,
      buckets: Int = 8): Unit = {
    val tbl = s"${name}_postings"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    idx.postings.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "term").sortBy("term")
      .option("path", s"$path/$tbl")
      .saveAsTable(tbl)
    idx.docLens.write.mode("overwrite")
      .parquet(s"$path/${name}_doclens")
    idx.dfTable.write.mode("overwrite")
      .parquet(s"$path/${name}_df")
    idx.stats.write.mode("overwrite")
      .parquet(s"$path/${name}_stats")
  }

  /** Incremental append of new documents to a SAVED index: new
    * postings and doc lengths land in the existing layouts (the
    * bucketed postings append goes through the catalog, which
    * validates the bucket spec — same contract as
    * [[VectorIndex.appendSaved]], and the same loud failure when the
    * catalog entry is gone, because a bare parquet append would
    * silently break the bucket contract). df and stats are then
    * RECOMPUTED from the appended tables and overwritten — BM25's idf
    * and length norm are corpus-global, so an append legitimately
    * shifts every score (unlike the vector index, whose centroids
    * deliberately do NOT move on append); both are one cheap
    * aggregation each. An append+load therefore scores identically
    * to a full rebuild over the union — spec-pinned.
    */
  def appendSaved(
      spark: SparkSession,
      path: String,
      name: String,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val tbl = s"${name}_postings"
    require(
      try spark.catalog.tableExists(tbl)
      catch { case _: Exception => false },
      s"appendSaved: catalog table $tbl missing — a bucketed append " +
        "needs the saving catalog entry; rebuild (or re-save) the " +
        "index instead")
    val add = build(newDocs, idCol, textCol)
    add.postings.write.mode("append").format("parquet")
      .bucketBy(bucketsOf(spark, tbl), "term").sortBy("term")
      .option("path", s"$path/$tbl")
      .saveAsTable(tbl)
    add.docLens.write.mode("append")
      .parquet(s"$path/${name}_doclens")
    // corpus-global side tables: recompute from the appended state
    val postings = spark.table(tbl)
    postings.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/${name}_df")
    spark.read.parquet(s"$path/${name}_doclens")
      .agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
      .write.mode("overwrite").parquet(s"$path/${name}_stats")
  }

  /** Bucket count of a saved catalog table (authoritative for appends). */
  private def bucketsOf(spark: SparkSession, tbl: String): Int =
    spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
      .find(_.getString(0).trim == "Num Buckets")
      .map(_.getString(1).trim.toInt)
      .getOrElse(sys.error(s"$tbl has no bucket spec"))

  /** Load a saved index. Postings come from the catalog table when its
    * location matches `path` (bucketed scans — exchange-free term
    * aggregations); otherwise fall back to the raw parquet (correct,
    * but the bucket metadata is lost — same degradation contract as
    * [[VectorIndex.load]]).
    */
  def load(spark: SparkSession, path: String, name: String): Bm25Index = {
    val tbl = s"${name}_postings"
    val fromCatalog =
      try {
        val loc = spark.sql(s"DESCRIBE FORMATTED $tbl").collect()
          .find(_.getString(0).trim == "Location")
          .map(_.getString(1).trim)
        loc.exists(l => l.stripSuffix("/").endsWith(
          s"$path/$tbl".stripPrefix("file:").stripSuffix("/")))
      } catch { case _: Exception => false }
    val postings =
      if (fromCatalog) spark.table(tbl)
      else spark.read.parquet(s"$path/$tbl")
    Bm25Index(postings,
      spark.read.parquet(s"$path/${name}_doclens"),
      spark.read.parquet(s"$path/${name}_df"),
      spark.read.parquet(s"$path/${name}_stats"))
  }
}
