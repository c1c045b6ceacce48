package graft.queries

/** Manual profiling harness for the dedup-cluster path — not a test.
  * Run: sbt "Test/runMain graft.queries.ClusterProfileManual"
  */
object ClusterProfileManual {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import org.apache.spark.sql.functions._
    for (i <- 1 to 3) {
      println(s"--- pass $i ---")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      t("read+count text") { docs.select("doc_id", "text").count() }
      val shSig = graft.operators.TextOps.shinglesAndSignature(w = 3, k = 16)
      val base = docs.withColumn("r", shSig(col("text")))
        .where(expr("size(r._1) >= 1"))
        .select(col("doc_id"), col("r._2").as("sig"))
      t("signatures") { base.count() }
      val memb = base.select(col("doc_id"), col("sig"),
          explode(expr("sequence(0, 3)")).as("b"))
        .withColumn("gkey", concat_ws(":", col("b"),
          expr(graft.operators.TextOps.bandKey("sig", "b", r = 4))))
        .select("doc_id", "gkey")
      t("membership count") { memb.count() }
      val comp = t("byGroup total") {
        val c = graft.operators.ConnectedComponents.byGroup(
          memb, "doc_id", "gkey")
        c.count(); c
      }
      t("final agg") {
        comp.groupBy("component")
          .agg(count(lit(1)).as("n_docs"),
            sort_array(collect_list(col("doc_id"))).as("ms"))
          .where(col("n_docs") >= 2).count()
      }
    }
    spark.stop()
  }
}
