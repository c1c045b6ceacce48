package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned output layout for document corpora — the standard
  * 100 TB training-data shape: shard the store by a low-cardinality
  * routing column (language, source, date) so every downstream job
  * that filters on it prunes whole directories at planning time
  * instead of scanning and discarding rows.
  *
  * `savePartitioned` repartitions by the routing column first (one
  * file set per partition value instead of one per input task x value
  * — a task-fanout layout produces numPartitions x numValues small
  * files) and sorts within partitions so per-file min/max column stats
  * make row-group skipping effective for range predicates on the sort
  * column.
  *
  * Reference analog: MINE's per-database Mongo collections
  * (databases.py:263-306) route by database name; parquet partition
  * directories are the columnar equivalent.
  */
object DocumentSink {

  /** Write `docs` under `path` partitioned by `partCol`, sorted within
    * partitions by `sortCol`; returns the manifest (one row per
    * partition value with its doc count) computed from the written
    * files, so the manifest can never disagree with the store.
    */
  def savePartitioned(
      docs: DataFrame,
      path: String,
      partCol: String = "lang",
      sortCol: String = "doc_id"): DataFrame = {
    docs
      .repartition(col(partCol))
      .sortWithinPartitions(partCol, sortCol)
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
    docs.sparkSession.read.parquet(path)
      .groupBy(partCol).agg(count(lit(1)).as("n_docs"))
      .orderBy(partCol)
  }

  /** Read one partition back; the filter on `partCol` resolves to a
    * directory-level PartitionFilter (no data scan outside the value's
    * directory — assert via the plan's PartitionFilters).
    */
  def readPartition(
      spark: SparkSession,
      path: String,
      partCol: String,
      value: String): DataFrame =
    spark.read.parquet(path).where(col(partCol) === value)
}
