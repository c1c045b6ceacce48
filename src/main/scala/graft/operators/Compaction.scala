package graft.operators

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass every long-lived
  * lakehouse table needs: streaming sinks, incremental appends, and
  * per-partition writers accumulate kilobyte parquet files whose
  * per-file open/footer/seek overhead dominates a 100 TB scan long
  * before row decode does.
  *
  * The compactor is SELECTIVE, the property that makes it cheap enough
  * to run continuously:
  *  - files already at or above `smallBytes` are moved BYTE-FOR-BYTE
  *    (Hadoop `FileUtil.copy` — no decode, no re-encode, row groups
  *    and encodings preserved exactly);
  *  - only the small-file tail is decoded, and it rewrites into
  *    `ceil(smallTotal / targetBytes)` outputs via one repartition —
  *    work proportional to the JUNK, not the table.
  *
  * Output files land in `dstDir` (immutable-input discipline — swap
  * directories under the reader like any static side; an in-place
  * compactor would race live scans).
  */
object Compaction {

  final case class CompactionPlan(
      smallFiles: Seq[String], bigFiles: Seq[String],
      smallBytes: Long, nMergedOutputs: Int)

  /** Split `srcDir`'s parquet files into the rewrite set and the
    * move-through set, from filesystem metadata only (no data read).
    */
  def plan(
      spark: SparkSession, srcDir: String,
      smallBytes: Long = 32L * 1024 * 1024,
      targetBytes: Long = 128L * 1024 * 1024): CompactionPlan = {
    require(smallBytes <= targetBytes,
      s"smallBytes ($smallBytes) must be <= targetBytes ($targetBytes)")
    val fs = new Path(srcDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(srcDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val (small, big) = files.partition(_.getLen < smallBytes)
    val smallTotal = small.map(_.getLen).sum
    CompactionPlan(
      small.map(_.getPath.toString).sorted.toSeq,
      big.map(_.getPath.toString).sorted.toSeq,
      smallTotal,
      math.max(1, math.ceil(smallTotal.toDouble / targetBytes).toInt))
  }

  /** Execute a plan: byte-copy the big files, decode + merge the small
    * tail. Returns the plan it ran.
    */
  def compactTo(
      spark: SparkSession, srcDir: String, dstDir: String,
      smallBytes: Long = 32L * 1024 * 1024,
      targetBytes: Long = 128L * 1024 * 1024): CompactionPlan = {
    val p = plan(spark, srcDir, smallBytes, targetBytes)
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(dstDir)
    val fs = dst.getFileSystem(conf)
    fs.mkdirs(dst)
    p.bigFiles.foreach { f =>
      val src = new Path(f)
      FileUtil.copy(src.getFileSystem(conf), src, fs,
        new Path(dst, src.getName), false, conf)
    }
    if (p.smallFiles.nonEmpty) {
      // merged outputs get a distinct prefix so a repeated run cannot
      // collide with moved-through names
      spark.read.parquet(p.smallFiles: _*)
        .repartition(p.nMergedOutputs)
        .write.mode("append").parquet(s"$dstDir/__merged")
      // hoist the merged part-files up beside the moved files: one
      // flat directory, same reader contract as the source
      val merged = fs.listStatus(new Path(s"$dstDir/__merged"))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      merged.zipWithIndex.foreach { case (m, i) =>
        fs.rename(m.getPath, new Path(dst, s"merged-$i.parquet"))
      }
      fs.delete(new Path(s"$dstDir/__merged"), true)
    }
    p
  }
}
