package graft.operators

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order clustering: bit-level pins on the interleave, and the
  * data-skipping property itself — measured from the parquet footers a
  * 100 TB scan would prune with, not asserted by construction.
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("interleave places d1 bits at odd positions, d2 at even") {
    val out = Seq((0L, 0L), (ZOrder.GridMax, 0L), (0L, ZOrder.GridMax),
      (ZOrder.GridMax, ZOrder.GridMax), (1L, 0L), (0L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // 0xAAAAAAAA = odd bits, 0x55555555 = even bits; (3,5): a=0b011
    // fills positions 1,3; b=0b101 fills positions 0,4 ->
    // 1+2+8+16 = 27
    assert(out === Seq(0L, 0xAAAAAAAAL, 0x55555555L, 0xFFFFFFFFL,
      2L, 1L, 27L))
  }

  test("withZValue is a pure projection: row count kept, z in range, " +
    "deterministic across partition layouts") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey")
    val z1 = ZOrder.withZValue(li, "l_partkey", "l_suppkey")
    val z4 = ZOrder.withZValue(li.repartition(7), "l_partkey", "l_suppkey")
    assert(z1.count() === li.count())
    val mm = z1.agg(min("zval"), max("zval")).as[(Long, Long)].head()
    assert(mm._1 >= 0L && mm._2 <= (1L << (2 * ZOrder.Bits)) - 1)
    // order-independent fingerprint: same multiset of z-values
    // (zval^2 would overflow a long at 2^32 scale — mod first)
    val fp = expr("sum((zval % 1000003L) * (zval % 1000003L))")
    val fp1 = z1.agg(sum("zval"), fp, count(lit(1)))
      .as[(Long, Long, Long)].head()
    val fp4 = z4.agg(sum("zval"), fp, count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(fp1 === fp4)
  }

  /** Files whose [min,max] footer stats for `col` overlap [lo, hi] —
    * exactly the row-group pruning decision a scan makes.
    */
  private def overlapping(
      dir: String, column: String, lo: Long, hi: Long): Int = {
    val conf = new Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    files.count { f =>
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        import scala.jdk.CollectionConverters._
        rd.getFooter.getBlocks.asScala.exists { b =>
          val cc = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val st = cc.getStatistics
          val mn = st.genericGetMin.asInstanceOf[Number].longValue
          val mx = st.genericGetMax.asInstanceOf[Number].longValue
          mx >= lo && mn <= hi
        }
      } finally rd.close()
    }
  }

  test("clusteredWrite skips on BOTH dimensions; single-column sort " +
    "only on its own") {
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey")
    val base = Files.createTempDirectory("zorder").toString
    val zDir = s"$base/z"
    val linDir = s"$base/lin"
    val nFiles = 16
    ZOrder.clusteredWrite(li, "l_partkey", "l_suppkey", zDir, nFiles)
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(linDir)

    // an eighth-of-range slice of each dimension
    val (pmn, pmx, smn, smx) = li.agg(
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey"))
      .as[(Long, Long, Long, Long)].head()
    val (pLo, pHi) = (pmn, pmn + (pmx - pmn) / 8)
    val (sLo, sHi) = (smn, smn + (smx - smn) / 8)

    val zOnP = overlapping(zDir, "l_partkey", pLo, pHi)
    val zOnS = overlapping(zDir, "l_suppkey", sLo, sHi)
    val linOnP = overlapping(linDir, "l_partkey", pLo, pHi)
    val linOnS = overlapping(linDir, "l_suppkey", sLo, sHi)

    // the linear layout answers its own sort key well but degenerates
    // to a full scan on the other dimension; the z layout prunes on
    // both. Thresholds are loose on purpose — the property, not a
    // brittle count, is pinned (range-exchange boundaries shift a
    // file or two when the shared test session runs under different
    // conf, e.g. the partition-invariance sweep's 7-partition phase).
    assert(linOnP <= nFiles / 4, s"linear layout should prune its own " +
      s"key: $linOnP of $nFiles")
    assert(linOnS >= nFiles - 1, s"linear layout cannot prune the " +
      s"other key: $linOnS of $nFiles")
    assert(zOnP <= 5 * nFiles / 8, s"z layout should prune dim 1: $zOnP")
    assert(zOnS <= 5 * nFiles / 8, s"z layout should prune dim 2: $zOnS")
    assert(zOnS <= linOnS - nFiles / 4,
      s"z layout must clearly beat linear on the non-sort dim: " +
        s"$zOnS vs $linOnS")

    // correctness: the clustered copy holds exactly the same multiset
    val a = spark.read.parquet(zDir)
      .agg(sum("l_partkey"), sum("l_suppkey"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    val b = li.agg(sum("l_partkey"), sum("l_suppkey"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(a === b)
  }
}
