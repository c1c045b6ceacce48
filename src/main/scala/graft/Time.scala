package graft
import org.apache.spark.sql.SparkSession

/** Local-iteration timer: `runMain graft.Time q_a q_b` times the named
  * queries (3 reps each, min + all reps printed) on
  * SPARK_GRAFT_SF_DIR (default sf0.1) with the Bench session config —
  * the per-query drill-down Bench itself doesn't offer.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "usage: runMain graft.Time <query> [query ...]")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-28s min=${times.min}%6.2fs " +
        s"reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
