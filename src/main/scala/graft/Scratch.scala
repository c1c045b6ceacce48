package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Temporary profiling main (not committed). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.load(spark, sfDir, "documents")
      .withColumn("r", TextOps.shinglesAndSignature(3, 16)(col("text")))
      .selectExpr("size(r._1)").agg(sum("size(r._1)")).count()

    var t0 = System.nanoTime()
    def lap(label: String): Unit = {
      println(f"[scratch] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      t0 = System.nanoTime()
    }

    val shSig = TextOps.shinglesAndSignature(w = 3, k = 16)
    val base0 = Tables.load(spark, sfDir, "documents")
      .withColumn("r", shSig(col("text")))
      .where(expr("size(r._1) >= 1"))
      .select(col("doc_id"), col("r._1").as("sh"), col("r._2").as("sig"))
    base0.count()
    lap("base compute (no ckpt)")
    val base = base0.localCheckpoint()
    lap("base localCheckpoint")
    val bands0 = base.select(
        col("doc_id"), col("sig"),
        explode(expr("sequence(0, 3)")).as("b"))
      .withColumn("key", expr(TextOps.bandKey("sig", "b", r = 4)))
      .select("doc_id", "b", "key")
    val bands = bands0.localCheckpoint()
    lap("bands localCheckpoint")
    val buckets = bands.groupBy("b", "key")
      .agg(count(lit(1)).as("sz")).where(col("sz") > 1)
    buckets.count()
    lap("buckets agg")
    val pairs = bands.as("x")
      .join(bands.as("y"),
        col("x.key") === col("y.key") && col("x.b") === col("y.b") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    println("[scratch] n_pairs=" + pairs.count())
    lap("pairs self-join+distinct")
    val verified = pairs
      .join(base.select(col("doc_id").as("doc_a"),
        col("sh").as("sh_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"),
        col("sh").as("sh_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .selectExpr(
        "size(filter(zip_with(sig_a, sig_b, (p, q) -> p = q), v -> v)) " +
          "/ 16.0 as est_jac",
        "size(array_intersect(sh_a, sh_b)) / (size(sh_a) + size(sh_b) " +
          "- size(array_intersect(sh_a, sh_b))) as exact_jac")
    verified.agg(count(lit(1)), avg("est_jac"), avg("exact_jac")).collect()
    lap("verified join+agg")
    val fin = base.agg(count(lit(1)).as("n_docs"))
      .crossJoin(buckets.agg(
        coalesce(count(lit(1)), lit(0L)).as("n_buckets_multi")))
      .crossJoin(verified.agg(
        count(lit(1)).as("n_candidate_pairs"),
        coalesce(sum(when(col("exact_jac") >= 0.7, 1L).otherwise(0L)),
          lit(0L)).as("n_dup_pairs"),
        round(coalesce(avg("est_jac"), lit(-1.0)), 4).as("avg_est_jac"),
        round(coalesce(avg("exact_jac"), lit(-1.0)), 4)
          .as("avg_exact_jac")))
    fin.count()
    lap("final 3-agg crossJoin")
    spark.stop()
  }
}
