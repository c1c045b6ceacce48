package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** Data-governance surface: privacy-risk audits (k-anonymity,
  * l-diversity, generalization ladder — `operators.Privacy`) and the
  * expect-or-drop quarantine split (`operators.Expectations`). These are
  * the release gates a training-data pipeline runs between "table built"
  * and "table published": quantify re-identification risk in structured
  * columns (the scrub pass q_text_scrub handles free text), and divert
  * rule-violating rows into an auditable reject store instead of the
  * published corpus.
  *
  * All metrics are integer-exact; every query is one or two hash
  * aggregates wide — no windows, no self-joins over the fact table.
  */
object GovernanceQueries extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Portable exact cents from the double money column (the idiom every
    * money-bearing oracle query in the repo uses).
    */
  private val centsOf: String => org.apache.spark.sql.Column =
    c => expr(s"cast(round($c * 100) as long)")

  override def queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_privacy_kanon", Seq("A8", "P6"),
      (s, dir) => {
        // k-anonymity audit (Sweeney 2002) over the customer table's
        // quasi-identifiers (nation, market segment): the equivalence-
        // class profile a release gate checks before publishing — the
        // smallest class size IS the dataset's k; classes under the
        // k=5 threshold are the re-identifiable remainder. One hash
        // groupBy + a 1-row reduce; map-side combined, scale-free
        // report size.
        Privacy.kAnonymity(
          t(s, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), 5L)
      },
      Some("""WITH cls AS (
            SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS sz
            FROM customer GROUP BY 1, 2)
        SELECT min(sz)::BIGINT AS k_anonymity,
          count(*)::BIGINT AS n_classes,
          sum(sz)::BIGINT AS n_rows,
          sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END)::BIGINT
            AS classes_at_risk,
          sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)::BIGINT
            AS rows_at_risk
        FROM cls"""),
      "k-anonymity release audit: QI equivalence classes in one " +
        "groupBy, min class size = the dataset's k, exact at-risk " +
        "class/row counts below the k=5 threshold."),

    GraftQuery(
      "q_privacy_ldiv", Seq("A8", "P6"),
      (s, dir) => {
        // l-diversity audit (Machanavajjhala 2007): a k-anonymous
        // class whose SENSITIVE attribute is homogeneous still leaks
        // it. Classes = (nation, $2000 balance bucket) — the bucket
        // uses the engine-portable floor-division identity so negative
        // balances land in floor buckets on both engines; sensitive =
        // market segment; threshold l=3.
        val c = t(s, dir, "customer")
          .withColumn("cents", centsOf("c_acctbal"))
          .withColumn("bal_bucket",
            Privacy.floorBucket(col("cents"), 200000L))
        Privacy.lDiversity(
          c, Seq("c_nationkey", "bal_bucket"), "c_mktsegment", 3L)
      },
      Some("""WITH c AS (
            SELECT c_nationkey, c_mktsegment,
              round(c_acctbal * 100)::BIGINT AS v FROM customer),
          cls AS (
            SELECT c_nationkey,
              (v - ((v % 200000 + 200000) % 200000)) // 200000 AS b,
              count(*)::BIGINT AS sz,
              count(DISTINCT c_mktsegment)::BIGINT AS ldiv
            FROM c GROUP BY 1, 2)
        SELECT min(ldiv)::BIGINT AS l_diversity,
          count(*)::BIGINT AS n_classes,
          sum(CASE WHEN ldiv < 3 THEN 1 ELSE 0 END)::BIGINT
            AS classes_below_l,
          sum(CASE WHEN ldiv < 3 THEN sz ELSE 0 END)::BIGINT
            AS rows_below_l
        FROM cls"""),
      "l-diversity audit: distinct-sensitive-value floor per QI class " +
        "(homogeneity-attack exposure), exact below-threshold counts, " +
        "negative-safe floor bucketing shared with the oracle."),

    GraftQuery(
      "q_privacy_generalize", Seq("A8", "P6", "W2"),
      (s, dir) => {
        // Generalization ladder: find the least-coarse balance
        // bucketing that makes (segment, balance-bucket) k=10
        // anonymous — WITHOUT one scan per candidate width. Every row
        // explodes into |ladder| = 5 level rows; ONE groupBy profiles
        // all levels' equivalence classes together; the ladder-sized
        // reduce marks each level and the 1-row argmin broadcast marks
        // the chosen (smallest satisfying) width. At 100 TB the naive
        // per-width loop is 5 full scans; this is one.
        val cust = t(s, dir, "customer")
          .withColumn("cents", centsOf("c_acctbal"))
        Privacy.generalizationLadder(
          cust, Seq("c_mktsegment"), col("cents"),
          Seq(10000L, 100000L, 250000L, 500000L, 1000000L), 10L)
      },
      Some("""WITH c AS (
            SELECT c_mktsegment,
              round(c_acctbal * 100)::BIGINT AS v FROM customer),
          w(width) AS (VALUES (10000), (100000), (250000), (500000),
            (1000000)),
          cls AS (
            SELECT width, c_mktsegment,
              (v - ((v % width + width) % width)) // width AS b,
              count(*)::BIGINT AS sz
            FROM c, w GROUP BY 1, 2, 3),
          lvl AS (
            SELECT width::BIGINT AS width,
              count(*)::BIGINT AS n_classes,
              min(sz)::BIGINT AS k_anonymity,
              sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END)::BIGINT
                AS classes_at_risk,
              sum(CASE WHEN sz < 10 THEN sz ELSE 0 END)::BIGINT
                AS rows_at_risk,
              min(sz) >= 10 AS satisfies
            FROM cls GROUP BY 1)
        SELECT width, n_classes, k_anonymity, classes_at_risk,
          rows_at_risk, satisfies,
          COALESCE(width = (SELECT min(width) FROM lvl WHERE satisfies),
            FALSE) AS chosen
        FROM lvl ORDER BY width"""),
      "One-pass generalization ladder: all 5 candidate widths audited " +
        "in a single shuffle via bounded explode, floor-division " +
        "bucketing, chosen = smallest width reaching k=10 by 1-row " +
        "broadcast argmin."),

    GraftQuery(
      "q_expectations_quarantine", Seq("A8", "J7", "P6"),
      (s, dir) => {
        // Expect-or-drop: the row-level half of q_expectations. Every
        // order is labeled with the rules it violates (row predicates
        // in codegen; uniqueness via the minority dup-key join; FK via
        // parent-key left join), then the reason string — labels in
        // declaration order — is aggregated with an order-independent
        // member fingerprint, pinning exactly WHICH rows quarantine,
        // not just how many. '__pass__' counts the publishable side.
        val o = t(s, dir, "orders")
          .withColumn("cents", centsOf("o_totalprice"))
        val labeled = Expectations.withViolations(o, Seq(
          Expectations.NotNull("o_custkey"),
          Expectations.Unique("o_orderkey"),
          Expectations.InRange("cents", 0L, 30000000L),
          Expectations.ForeignKey(
            "o_custkey", t(s, dir, "customer"), "c_custkey")))
        labeled
          .withColumn("reason",
            when(size(col("violations")) === 0, lit("__pass__"))
              .otherwise(array_join(col("violations"), ",")))
          .groupBy("reason")
          .agg(count(lit(1)).as("n"),
            sum(expr(graft.operators.TextOps.hash64(
              "cast(o_orderkey as string)") + " % 1000000007"))
              .as("members_fp"))
          .orderBy("reason")
      },
      Some("""WITH o AS (
            SELECT o_orderkey, o_custkey,
              round(o_totalprice * 100)::BIGINT AS cents FROM orders),
          dup AS (SELECT o_orderkey AS k FROM o GROUP BY 1
            HAVING count(*) > 1),
          lab AS (
            SELECT o.o_orderkey,
              concat_ws(',',
                CASE WHEN o_custkey IS NULL THEN 'not_null:o_custkey'
                  END,
                CASE WHEN dup.k IS NOT NULL THEN 'unique:o_orderkey'
                  END,
                CASE WHEN cents < 0 OR cents > 30000000
                  THEN 'in_range:cents' END,
                CASE WHEN o_custkey IS NOT NULL
                    AND c.c_custkey IS NULL
                  THEN 'foreign_key:o_custkey' END) AS reason
            FROM o LEFT JOIN dup ON o.o_orderkey = dup.k
              LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT CASE WHEN reason = '' THEN '__pass__' ELSE reason END
            AS reason,
          count(*)::BIGINT AS n,
          sum(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
            % 1000000007)::BIGINT AS members_fp
        FROM lab GROUP BY 1 ORDER BY 1"""),
      "Quarantine split: per-row violation labels (codegen'd " +
        "predicates + minority dup-key join + parent-key left join), " +
        "reason-grouped counts with an exact member fingerprint — " +
        "pins the row-level partition, not just totals."),

    GraftQuery(
      "q_drift_psi", Seq("A8", "W2", "J9"),
      (s, dir) => {
        // Distribution-drift monitoring (operators.Drift): PSI + KL +
        // grid-KS between a reference and a current slice over one
        // FROZEN 20-bin grid — each side collapses to ≤20 rows in one
        // map-side-combined aggregate; the only window runs over the
        // pre-aggregated bins; the KS argmax is cross-multiplied
        // integer arithmetic. Two comparisons flow through the gate:
        // 'time' (order prices before vs after 1998-07-01 — the
        // stationary synthetic feed HONESTLY reports no drift) and
        // 'feed' (order totals vs line-item prices — genuinely
        // different distributions, drifted = true), so both verdict
        // branches are oracle-pinned.
        val o = t(s, dir, "orders")
          .withColumn("v", centsOf("o_totalprice"))
        val li = t(s, dir, "lineitem")
          .withColumn("v", centsOf("l_extendedprice"))
        val time = Drift.binnedDrift(
            o.where(expr("o_orderdate < timestamp'1998-07-01'")),
            o.where(expr("o_orderdate >= timestamp'1998-07-01'")),
            "v", 0L, 60000000L, 20)
          .withColumn("cmp", lit("time"))
        val feed = Drift.binnedDrift(o, li, "v", 0L, 60000000L, 20)
          .withColumn("cmp", lit("feed"))
        time.unionByName(feed)
          .select("cmp", "n_ref", "n_cur", "psi", "kl", "ks", "drifted")
          .orderBy("cmp")
      },
      Some {
        def block(label: String, refSel: String, curSel: String) =
          s"""SELECT '$label' AS cmp, n_ref, n_cur, psi, kl, ks,
              psi >= 0.2 AS drifted FROM (
            WITH r AS (SELECT greatest(0, least(19, (v*20)//60000001))
                  AS bin, count(*)::BIGINT AS nr
                FROM ($refSel) GROUP BY 1),
              c AS (SELECT greatest(0, least(19, (v*20)//60000001))
                  AS bin, count(*)::BIGINT AS nc
                FROM ($curSel) GROUP BY 1),
              a AS (SELECT s.bin, COALESCE(nr, 0)::BIGINT AS nr,
                  COALESCE(nc, 0)::BIGINT AS nc
                FROM (SELECT range AS bin FROM range(0, 20)) s
                LEFT JOIN r ON s.bin = r.bin
                LEFT JOIN c ON s.bin = c.bin),
              t AS (SELECT sum(nr)::BIGINT AS n_ref,
                  sum(nc)::BIGINT AS n_cur FROM a),
              terms AS (SELECT a.bin, nr, nc, n_ref, n_cur,
                  (nr + 1.0) / (n_ref + 20.0) AS p,
                  (nc + 1.0) / (n_cur + 20.0) AS q,
                  sum(nr) OVER (ORDER BY a.bin) AS cum_r,
                  sum(nc) OVER (ORDER BY a.bin) AS cum_c
                FROM a, t)
            SELECT n_ref, n_cur,
              round(sum((q - p) * ln(q / p)), 4) AS psi,
              round(sum(q * ln(q / p)), 4) AS kl,
              round(max(abs(cum_c * n_ref - cum_r * n_cur))
                / (n_ref::DOUBLE * n_cur::DOUBLE), 4) AS ks
            FROM terms GROUP BY 1, 2)"""
        val oCents =
          "SELECT o_orderdate, round(o_totalprice * 100)::BIGINT AS v" +
            " FROM orders"
        block("feed", oCents,
          "SELECT round(l_extendedprice * 100)::BIGINT AS v" +
            " FROM lineitem") +
          "\nUNION ALL\n" +
          block("time",
            s"SELECT v FROM ($oCents)" +
              " WHERE o_orderdate < TIMESTAMP '1998-07-01'",
            s"SELECT v FROM ($oCents)" +
              " WHERE o_orderdate >= TIMESTAMP '1998-07-01'") +
          "\nORDER BY cmp"
      },
      "Drift audit over a frozen grid: Laplace-smoothed PSI/KL and an " +
        "integer-exact grid-KS, bin-sized state, both a no-drift and " +
        "a drifted verdict oracle-pinned.")
  )
}
