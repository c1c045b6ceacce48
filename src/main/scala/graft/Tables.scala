package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  * One parquet file per table under `sfDir`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map
      // to its µs TimestampType. Read nanos as a long and truncate to µs —
      // the same truncation every µs-based engine applies. The conf is also
      // set at session setup (Verify/Bench/SparkSuite); setting it here too
      // keeps driver-owned sessions working. It is execution-time, so it
      // cannot be scoped to this one read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE: the test data DOES carry sub-µs nanos (e.g. …575175), so
      // truncation is lossy — but the DuckDB oracle (1.0) also reads
      // TIMESTAMP(NANOS) as µs TIMESTAMP, applying the SAME truncation,
      // so both engines see identical values by construction.
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  private val rowCounts =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  /** Cached row count for a static table. The parquet count is
    * footer-metadata-only, but each call still plans and runs a job —
    * the IVF gate queries all need n for the centroid-count rule, so
    * one count per (dir, table) per JVM amortizes them.
    *
    * CONTRACT: the path must be IMMUTABLE for the JVM lifetime (true
    * of the driver's testdata dirs). The cache is keyed by path only —
    * overwriting a counted path mid-JVM yields a stale n, from which
    * suggestedBandBits/suggestedCentroids would derive stale geometry
    * that gateCheck can NOT catch (it validates against the same n).
    * Anything that rewrites a table in place must call
    * [[invalidateRowCount]] (DocumentSink/VectorIndex write to fresh
    * target dirs, so library code never needs to).
    */
  def rowCount(spark: SparkSession, sfDir: String, name: String): Long =
    rowCounts.getOrElseUpdate((sfDir, name), load(spark, sfDir, name).count())

  /** Drop a cached count after rewriting `sfDir/name.parquet` in place. */
  def invalidateRowCount(sfDir: String, name: String): Unit =
    rowCounts.remove((sfDir, name))
}
