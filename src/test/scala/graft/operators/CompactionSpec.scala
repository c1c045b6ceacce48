package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Compactor pins: selective plan from fs metadata, byte-identical
  * move-through of already-good files, small-tail merge into the
  * planned output count, and content-multiset equality.
  */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  test("compactTo merges the small tail, byte-copies big files, and " +
    "preserves the content multiset") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val base = Files.createTempDirectory("compact").toString
    val src = s"$base/src"
    val dst = s"$base/dst"
    // 48 tiny files + 1 "big" file (written separately, above the
    // small threshold we pass)
    li.where(col("l_orderkey") % 5 =!= 0).repartition(48)
      .write.mode("overwrite").parquet(src)
    val bigDir = s"$base/big"
    li.where(col("l_orderkey") % 5 === 0).coalesce(1)
      .write.mode("overwrite").parquet(bigDir)
    val bigFile = new java.io.File(bigDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bigTarget = new java.io.File(src, "big-0.parquet")
    java.nio.file.Files.copy(bigFile.toPath, bigTarget.toPath)

    // thresholds sized to the fixture: the 48 shards are each a few
    // KB, the single file is bigger than all of them
    val smallBytes = bigTarget.length - 1
    val targetBytes = smallBytes * 8
    val p = Compaction.compactTo(spark, src, dst, smallBytes, targetBytes)
    assert(p.smallFiles.size === 48)
    assert(p.bigFiles.size === 1)

    val outFiles = new java.io.File(dst).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(outFiles.length === p.nMergedOutputs + 1)
    assert(outFiles.length < 49)
    // the big file moved through byte-identically
    val moved = outFiles.find(_.getName == "big-0.parquet").get
    assert(java.util.Arrays.equals(
      java.nio.file.Files.readAllBytes(moved.toPath),
      java.nio.file.Files.readAllBytes(bigTarget.toPath)))
    // content multiset unchanged
    def fp(dir: String) = spark.read.parquet(dir)
      .agg(count(lit(1)), sum("l_orderkey"), sum("l_partkey"),
        sum(col("l_quantity").cast("long")))
      .as[(Long, Long, Long, Long)].head()
    assert(fp(dst) === fp(src))
  }

  test("plan rejects inverted thresholds; all-big source plans no merge") {
    val base = Files.createTempDirectory("compact2").toString
    graft.Tables.load(spark, sf, "region").coalesce(1)
      .write.mode("overwrite").parquet(base + "/t")
    intercept[IllegalArgumentException] {
      Compaction.plan(spark, base + "/t", smallBytes = 10, targetBytes = 5)
    }
    val p = Compaction.plan(spark, base + "/t", smallBytes = 1)
    assert(p.smallFiles.isEmpty && p.bigFiles.size === 1)
  }
}
