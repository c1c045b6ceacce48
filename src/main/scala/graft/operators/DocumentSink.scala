package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-pruned output layout for document corpora — the standard
  * 100 TB training-data shape: shard the store by a low-cardinality
  * routing column (language, source, date) so every downstream job
  * that filters on it prunes whole directories at planning time
  * instead of scanning and discarding rows.
  *
  * `savePartitioned` RANGE-repartitions on (partCol, sortCol) first:
  * rows of one partition value land in a handful of contiguous tasks
  * (not one file per input task x value — a task-fanout layout
  * produces numPartitions x numValues small files), while a HOT value
  * (English ≈ half of any real corpus) spans as many tasks as its row
  * share of the range sample — no single-task straggler writing one
  * giant file, which a plain hash `repartition(partCol)` forces at
  * 100 TB. Within-partition sort keeps per-file min/max column stats
  * tight so row-group skipping works for range predicates on the sort
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
    *
    * @param numTasks write-task count (0 = the session's shuffle
    *                 partition setting); a hot partition value spans
    *                 multiple of these tasks via the range partitioner,
    *                 producing multiple files under its directory
    */
  def savePartitioned(
      docs: DataFrame,
      path: String,
      partCol: String = "lang",
      sortCol: String = "doc_id",
      numTasks: Int = 0): DataFrame = {
    val ranged =
      if (numTasks > 0)
        docs.repartitionByRange(numTasks, col(partCol), col(sortCol))
      else docs.repartitionByRange(col(partCol), col(sortCol))
    ranged
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
