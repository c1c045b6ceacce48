package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite
import graft.expressions.Hash64

/** Pins the mergeable-sketch semantics (Sketches.scala): HLL register
  * contents against a hand computation, the merge law both sketches owe
  * their 100 TB story to (shard sketches union into the whole with no
  * re-scan), partition invariance, and CMS's one-sided error guarantee
  * over EVERY key (the oracle query audits only the top-10).
  */
class SketchesSpec extends SparkSuite {

  private def liSample = {
    import spark.implicits._
    (1 to 500).map(i => (i.toLong, s"g${i % 3}")).toDF("k", "g")
  }

  test("HLL registers match the hand-computed bucket/rho of the hash") {
    import spark.implicits._
    val keys = Seq("42", "oxidoreductase", "a-doc")
    val df = keys.map(k => (k, "x")).toDF("k", "g")
    val regs = Sketches.hllRegisters(df, col("k"), Seq("g"), p = 12)
      .select("bucket", "reg")
      .as[(Long, Long)].collect().toMap
    // independent computation from the compiled digest twin
    val expected = keys.map { k =>
      val h = Hash64.compute(UTF8String.fromString(k))
      val bucket = h >>> 48
      val w = h & ((1L << 48) - 1)
      val rho =
        if (w == 0) 49L else 49L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      bucket -> rho
    }.groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    assert(regs === expected)
  }

  test("HLL sketches merge: shard registers max-union to the whole") {
    val df = liSample
    val whole = Sketches.hllRegisters(df, col("k"), Seq("g"))
      .orderBy("g", "bucket").collect().toSeq
    val s1 = Sketches.hllRegisters(df.where(col("k") <= 250), col("k"), Seq("g"))
    val s2 = Sketches.hllRegisters(df.where(col("k") > 250), col("k"), Seq("g"))
    val merged = s1.union(s2)
      .groupBy("g", "bucket").agg(max("reg").as("reg"))
      .orderBy("g", "bucket").collect().toSeq
    assert(merged === whole)
  }

  test("HLL registers and estimate are partition-invariant") {
    val df = liSample
    val a = Sketches.hllEstimate(
      Sketches.hllRegisters(df, col("k"), Seq("g")), Seq("g"))
      .orderBy("g").collect().toSeq
    val b = Sketches.hllEstimate(
      Sketches.hllRegisters(df.repartition(7), col("k"), Seq("g")), Seq("g"))
      .orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("HLL raw estimate lands within 5% of truth at n=20000, p=12") {
    // the RAW estimator's operating zone is n > 2.5m (=10240 at p=12);
    // below it the documented small-range bias applies and callers use
    // the exact empty-bucket count the operator also returns
    import spark.implicits._
    val df = (1 to 20000).map(_.toLong).toDF("k")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(df, col("k"), Seq.empty), Seq.empty)
      .select("hll_est").collect().head.getDouble(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.05, s"est $est")
  }

  test("CMS never undercounts: est >= true for every key") {
    import spark.implicits._
    // skewed frequencies: key i appears i times — 100 keys, 5050 rows
    val rows = (1 to 100).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k")
    val sk = Sketches.cmsSketch(rows, col("k"), d = 4, w = 64)
    val truth = rows.groupBy(col("k").cast("string").as("key"))
      .agg(count(lit(1)).as("true_cnt"))
    val est = Sketches.cmsEstimate(sk, truth.select("key"), d = 4, w = 64)
    val bad = est.join(truth, Seq("key"))
      .where(col("cms_est") < col("true_cnt")).count()
    assert(bad === 0)
    // and with only 64 buckets for 100 keys, collisions must exist
    val over = est.join(truth, Seq("key"))
      .where(col("cms_est") > col("true_cnt")).count()
    assert(over > 0, "expected at least one collision at w=64")
  }

  test("Misra-Gries candidates keep every key above the threshold " +
    "even with aggressive eviction") {
    import spark.implicits._
    // 1 partition, k=3 counters, 10k rows: two heavy keys (30% each)
    // drowned in 4000 singletons — eviction churns constantly but the
    // MG guarantee keeps anything above n/(k+1) = 25%
    val heavy = Seq.fill(3000)("hh1") ++ Seq.fill(3000)("hh2")
    val noise = (1 to 4000).map(i => s"n$i")
    val df = (heavy ++ noise).toDF("k").repartition(1)
    val cands = Sketches.mgCandidates(df, col("k"), k = 3)
      .as[String].collect().toSet
    assert(cands.contains("hh1") && cands.contains("hh2"))
    assert(cands.size <= 3)
  }

  test("heavyHitters equals the exact groupBy answer under any " +
    "partitioning") {
    import spark.implicits._
    val df = (1 to 100).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k")
    val n = 5050L
    val k = 63
    val want = df.groupBy(col("k").cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1L) > n)
      .as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 4, 13)) {
      val got = Sketches.heavyHitters(df.repartition(parts), col("k"), k)
        .select("key", "cnt").as[(String, Long)].collect().toMap
      assert(got === want, s"parts=$parts")
    }
    assert(want.nonEmpty) // the fixture actually exercises the filter
  }

  test("saved HLL sketch + append equals the full rebuild, and the " +
    "meta table pins the geometry") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("hll_store").toString
    val df = liSample
    val (oldHalf, newHalf) =
      (df.where(col("k") <= 250), df.where(col("k") > 250))
    Sketches.saveHll(
      Sketches.hllRegisters(oldHalf, col("k"), Seq("g"), p = 10),
      dir, p = 10)
    Sketches.appendHll(newHalf, col("k"), Seq("g"), dir)
    val (loaded, p) = Sketches.loadHll(spark, dir)
    assert(p === 10)
    val got = loaded.orderBy("g", "bucket")
      .as[(String, Long, Long)].collect().toSeq
    val want = Sketches.hllRegisters(df, col("k"), Seq("g"), p = 10)
      .orderBy("g", "bucket")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("CMS sketches merge: shard cells sum to the whole") {
    import spark.implicits._
    val rows = (1 to 100).flatMap(i => Seq.fill(i)(i.toLong)).toDF("k")
    val whole = Sketches.cmsSketch(rows, col("k"), d = 4, w = 64)
      .orderBy("row", "bucket").collect().toSeq
    val s1 = Sketches.cmsSketch(rows.where(col("k") % 2 === 0), col("k"), d = 4, w = 64)
    val s2 = Sketches.cmsSketch(rows.where(col("k") % 2 === 1), col("k"), d = 4, w = 64)
    val merged = s1.union(s2)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("row", "bucket").collect().toSeq
    assert(merged === whole)
  }
}
