package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** Embedding similarity-search pack over the `embeddings` table:
  * brute-force cosine top-k (baseline), sign-LSH bucketed ANN (the scale
  * path), LSH-blocked cosine near-dup, and max-similarity-vs-target-set
  * (the reference's similarity filter A10, similarity.py:497-501).
  *
  * See VectorOps for the integer-quantization scheme that makes every
  * ranking and threshold bit-identical to the DuckDB oracle.
  */
object SimilarityQueries extends QueryPack {

  /** Embeddings with quantized vector + exact squared norm. */
  private def quantized(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .withColumn("qe", VectorOps.quantize("embedding"))
      .withColumn("nq", VectorOps.normSq("qe"))
      .select("vec_id", "label", "qe", "nq")

  /** DuckDB twins of the VectorOps expressions. */
  private val duckQuant =
    "list_transform(embedding, x -> round(x::DOUBLE * 1000000)::BIGINT)"
  private val duckNorm =
    "list_sum(list_transform(qe, x -> x * x))::BIGINT"
  private def duckDot(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))::BIGINT"
  private def duckCos(dot: String, na: String, nb: String) =
    s"$dot / (sqrt($na::DOUBLE) * sqrt($nb::DOUBLE))"
  private val duckSketch =
    "list_sum(list_transform(range(0, 8), p -> CASE WHEN " +
      "list_sum(list_transform(range(1, len(qe) + 1), j -> " +
      "((('0x' || substr(md5(p::VARCHAR || ':' || j::VARCHAR),1,15))::BIGINT " +
      "& 1) * 2 - 1) * qe[j])) > 0 THEN (1::BIGINT << p) ELSE 0 END))::BIGINT"

  private val duckBase =
    s"""base AS (SELECT vec_id, label, $duckQuant AS qe FROM embeddings),
        n AS (SELECT vec_id, label, qe, $duckNorm AS nq FROM base)"""

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_sim_topk_bruteforce", Seq("A10", "J11", "W4"),
      (s, dir) => {
        val e = quantized(s, dir)
        val q = e.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("qe").as("qqe"),
            col("nq").as("qnq"))
        val scored = e.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("query_id"))
          .withColumn("dot", VectorOps.dot("qqe", "qe"))
          .withColumn("cos", VectorOps.cosine("dot", "qnq", "nq"))
        val w = Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("vec_id").asc)
        scored.withColumn("rnk", row_number().over(w))
          .where(col("rnk") <= 3)
          .select(col("query_id"), col("rnk"),
            col("vec_id").as("neighbor_id"), col("dot"),
            round(col("cos"), 4).as("cos"))
          .orderBy("query_id", "rnk")
      },
      Some(s"""WITH $duckBase,
          q AS (SELECT vec_id AS query_id, qe AS qqe, nq AS qnq
                FROM n WHERE vec_id % 100 = 0),
          d AS (SELECT query_id, vec_id AS neighbor_id,
                  ${duckDot("qqe", "qe")} AS dot, nq, qnq
                FROM n, q WHERE vec_id != query_id),
          r AS (SELECT query_id, neighbor_id, dot,
                  round(${duckCos("dot", "qnq", "nq")}, 4) AS cos,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY dot DESC, neighbor_id) AS rnk
                FROM d)
        SELECT query_id, rnk, neighbor_id, dot, cos
        FROM r WHERE rnk <= 3 ORDER BY query_id, rnk"""),
      "Brute-force cosine top-k: broadcast query set x full scan, partial " +
        "top-k per query — the exact-ANN baseline."),

    GraftQuery(
      "q_sim_lsh_ann", Seq("A10", "J6", "D8"),
      (s, dir) => {
        val e = quantized(s, dir)
          .withColumn("bucket", VectorOps.signSketch("qe", bits = 8))
        val q = e.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("qe").as("qqe"),
            col("nq").as("qnq"), col("bucket"))
        val mates = e.join(q, Seq("bucket"))
          .where(col("vec_id") =!= col("query_id"))
          .withColumn("dot", VectorOps.dot("qqe", "qe"))
        val best = mates.groupBy("query_id")
          .agg(count(lit(1)).as("n_mates"),
            max(struct(col("dot").as("d"), (-col("vec_id")).as("ni")))
              .as("m"))
          .selectExpr("query_id", "n_mates", "m.d as best_dot",
            "-m.ni as best_neighbor")
        q.join(best, Seq("query_id"), "left")
          .select(col("query_id"), col("bucket"),
            coalesce(col("n_mates"), lit(0L)).as("n_mates"),
            coalesce(col("best_neighbor"), lit(-1L)).as("best_neighbor"),
            coalesce(col("best_dot"), lit(-1L)).as("best_dot"))
          .orderBy("query_id")
      },
      Some(s"""WITH $duckBase,
          sk AS (SELECT vec_id, label, qe, nq, $duckSketch AS bucket FROM n),
          q AS (SELECT vec_id AS query_id, qe AS qqe, nq AS qnq, bucket
                FROM sk WHERE vec_id % 100 = 0),
          mates AS (SELECT q.query_id, sk.vec_id AS neighbor,
                  ${duckDot("qqe", "qe")} AS dot
                FROM sk JOIN q ON sk.bucket = q.bucket
                WHERE sk.vec_id != q.query_id),
          best AS (SELECT query_id, count(*) AS n_mates, max(dot) AS best_dot
                FROM mates GROUP BY 1),
          bn AS (SELECT m.query_id, min(m.neighbor) AS best_neighbor
                FROM mates m JOIN best b ON m.query_id = b.query_id
                  AND m.dot = b.best_dot
                GROUP BY 1)
        SELECT q.query_id, q.bucket,
          coalesce(b.n_mates, 0) AS n_mates,
          coalesce(bn.best_neighbor, -1) AS best_neighbor,
          coalesce(b.best_dot, -1) AS best_dot
        FROM q LEFT JOIN best b ON b.query_id = q.query_id
               LEFT JOIN bn ON bn.query_id = q.query_id
        ORDER BY q.query_id"""),
      "Sign-LSH (8 pseudo-random ±1 hyperplanes) bucketed ANN: sketch in " +
        "one projection, candidates via bucket equi-join only — the " +
        "100 TB alternative to the brute-force cross join."),

    GraftQuery(
      "q_sim_neardup_cos", Seq("D1", "A10", "J11"),
      (s, dir) => {
        // materialize the sketch table before the self-join: without the
        // barrier, project collapse inlines the (interpreted-HOF) sketch
        // expression into the join and re-evaluates it per candidate
        // pair — measured 41s -> 1.1s at sf0.1 for the same result
        val e = quantized(s, dir)
          .withColumn("bucket", VectorOps.signSketch("qe", bits = 8))
          .localCheckpoint()
        val pairs = e.as("x").join(e.as("y"),
            col("x.bucket") === col("y.bucket") &&
              col("x.vec_id") < col("y.vec_id"))
          .withColumn("dot", VectorOps.dot("x.qe", "y.qe"))
          .withColumn("cos", VectorOps.cosine("dot", "x.nq", "y.nq"))
          .select(
            least(col("x.label"), col("y.label")).as("label_a"),
            greatest(col("x.label"), col("y.label")).as("label_b"),
            col("cos"))
        pairs.groupBy("label_a", "label_b")
          .agg(count(lit(1)).as("n_pairs"),
            count(when(col("cos") >= 0.9, 1)).as("n_neardup"),
            round(avg("cos"), 4).as("avg_cos"))
          .orderBy("label_a", "label_b")
      },
      Some(s"""WITH $duckBase,
          sk AS (SELECT vec_id, label, qe, nq, $duckSketch AS bucket FROM n),
          p AS (SELECT least(x.label, y.label) AS label_a,
                  greatest(x.label, y.label) AS label_b,
                  ${duckCos(duckDot("x.qe", "y.qe"), "x.nq", "y.nq")} AS cos
                FROM sk x JOIN sk y ON x.bucket = y.bucket
                  AND x.vec_id < y.vec_id)
        SELECT label_a, label_b, count(*) AS n_pairs,
          count(CASE WHEN cos >= 0.9 THEN 1 END) AS n_neardup,
          round(avg(cos), 4) AS avg_cos
        FROM p GROUP BY 1,2 ORDER BY 1,2"""),
      "Embedding-cosine near-dup with LSH-bucket blocking: only same-" +
        "bucket pairs are verified — no O(n^2) pairwise pass."),

    GraftQuery(
      "q_sim_ivf_ann", Seq("A10", "J6", "D9"),
      (s, dir) => {
        // IVF-style ANN: coarse quantizer = 8 deterministic centroid
        // vectors (every 250th vector); each vector is assigned to its
        // nearest centroid by exact integer dot-cosine ordering (argmax
        // tie-broken by centroid id), queries probe ONLY their own cell
        // (nprobe=1). All integer math — the oracle recomputes the same
        // cells. At scale: centroids broadcast, cells are a hash
        // partition -> the probe is one equi-join on cell id.
        val e = quantized(s, dir)
        val cent = e.where(col("vec_id") % 250 === 0)
          .select(col("vec_id").as("c_id"), col("qe").as("cqe"),
            col("nq").as("cnq"))
        val assigned = e.crossJoin(broadcast(cent))
          .withColumn("dot", VectorOps.dot("cqe", "qe"))
          .withColumn("cos", VectorOps.cosine("dot", "cnq", "nq"))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("vec_id")
              .orderBy(col("cos").desc, col("c_id").asc)))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("label"), col("qe"), col("nq"),
            col("c_id").as("cell"))
          .localCheckpoint()
        val queries = assigned.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("qe").as("qqe"),
            col("nq").as("qnq"), col("cell"))
        val probed = assigned.join(queries, Seq("cell"))
          .where(col("vec_id") =!= col("query_id"))
          .withColumn("dot", VectorOps.dot("qqe", "qe"))
        probed.groupBy("query_id")
          .agg(count(lit(1)).as("n_cell_mates"),
            max(struct(col("dot").as("d"), (-col("vec_id")).as("ni")))
              .as("m"))
          .selectExpr("query_id", "n_cell_mates", "m.d as best_dot",
            "-m.ni as best_neighbor")
          .orderBy("query_id")
      },
      Some(s"""WITH $duckBase,
          cent AS (SELECT vec_id AS c_id, qe AS cqe, nq AS cnq
                FROM n WHERE vec_id % 250 = 0),
          scored AS (SELECT n.vec_id, n.label, n.qe, n.nq, cent.c_id,
                  ${duckCos(duckDot("cqe", "qe"), "cnq", "nq")} AS cos
                FROM n, cent),
          assigned AS (SELECT vec_id, label, qe, nq, c_id AS cell
                FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY cos DESC, c_id) AS rn FROM scored)
                WHERE rn = 1),
          q AS (SELECT vec_id AS query_id, qe AS qqe, nq AS qnq, cell
                FROM assigned WHERE vec_id % 100 = 0),
          probed AS (SELECT q.query_id, a.vec_id AS neighbor,
                  ${duckDot("qqe", "qe")} AS dot
                FROM assigned a JOIN q ON a.cell = q.cell
                WHERE a.vec_id != q.query_id),
          best AS (SELECT query_id, count(*) AS n_cell_mates,
                  max(dot) AS best_dot FROM probed GROUP BY 1),
          bn AS (SELECT p.query_id, min(p.neighbor) AS best_neighbor
                FROM probed p JOIN best b ON p.query_id = b.query_id
                  AND p.dot = b.best_dot GROUP BY 1)
        SELECT b.query_id, b.n_cell_mates, b.best_dot, bn.best_neighbor
        FROM best b JOIN bn ON bn.query_id = b.query_id
        ORDER BY b.query_id"""),
      "IVF-style ANN: 8-centroid coarse quantizer (exact integer-cosine " +
        "assignment), nprobe=1 cell probe via one equi-join — the " +
        "centroid-partitioned alternative to sign-LSH at 100 TB."),

    GraftQuery(
      "q_sim_maxsim_target", Seq("A10", "W7", "W8"),
      (s, dir) => {
        val e = quantized(s, dir)
        val t = e.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("t_id"), col("qe").as("tqe"),
            col("nq").as("tnq"))
        e.crossJoin(broadcast(t))
          .withColumn("dot", VectorOps.dot("tqe", "qe"))
          .withColumn("cos", VectorOps.cosine("dot", "tnq", "nq"))
          .groupBy("vec_id", "label")
          .agg(max("cos").as("maxsim"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            round(avg("maxsim"), 4).as("avg_maxsim"),
            count(when(col("maxsim") >= 0.8, 1)).as("n_above"))
          .orderBy("label")
      },
      Some(s"""WITH $duckBase,
          t AS (SELECT vec_id AS t_id, qe AS tqe, nq AS tnq
                FROM n WHERE vec_id % 100 = 0),
          sc AS (SELECT n.vec_id, n.label,
                  max(${duckCos(duckDot("tqe", "qe"), "tnq", "nq")}) AS maxsim
                FROM n, t GROUP BY 1, 2)
        SELECT label, count(*) AS n_vecs,
          round(avg(maxsim), 4) AS avg_maxsim,
          count(CASE WHEN maxsim >= 0.8 THEN 1 END) AS n_above
        FROM sc GROUP BY 1 ORDER BY 1"""),
      "Max-similarity per item vs a broadcast target set — the " +
        "reference's similarity-cutoff filter (A10) over embeddings."),
  )
}
