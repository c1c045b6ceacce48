package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.pickaxe.RuleSelection

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("withDecodedFeatures attaches the stub feature columns") {
    val df = Seq(("a", "hello world"), ("b", "x" * 1000))
      .toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val out = Multimodal.withDecodedFeatures(df, "media", chunkSize = 256)
    val rows = out.select("id", "n_bytes", "n_chunks", "width", "height",
      "sig").collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getInt(2), r.getString(5))).toMap
    assert(rows("a")._1 === 11L)
    assert(rows("a")._2 === 1)
    assert(rows("b")._1 === 1000L)
    assert(rows("b")._2 === 4)
    assert(rows("a")._3.length === 8) // deterministic md5-derived sig
    // deterministic across runs
    val again = Multimodal.withDecodedFeatures(df, "media", 256)
      .select("sig").as[String].collect().sorted
    assert(again === out.select("sig").as[String].collect().sorted)
  }

  test("frameSample emits every stride-th byte frame, tail included, " +
    "none for empty media") {
    // 10 bytes at frameSize=3 -> frames 0..3 ('012','345','678','9');
    // stride 2 samples indices 0 and 2
    val df = Seq(("a", "0123456789"), ("b", ""))
      .toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val out = Multimodal.frameSample(df, "media", frameSize = 3, stride = 2)
      .select(col("id"), col("frame_idx"), col("frame").cast("string"))
      .as[(String, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(("a", 0, "012"), ("a", 2, "678")))
    // stride 1 = every frame; the partial tail frame is a frame
    val all = Multimodal.frameSample(df, "media", frameSize = 3, stride = 1)
      .select(col("frame").cast("string")).as[String].collect()
    assert(all.toSeq.sorted === Seq("012", "345", "678", "9"))
    // byte-based framing: a 3-byte UTF-8 char splits across frames
    val utf = Seq(("u", "a世b")).toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val nBytes = utf.select(octet_length(col("media"))).as[Int].head()
    assert(nBytes === 5)
    assert(Multimodal.frameSample(utf, "media", 2, 1).count() === 3)
  }

  test("chunked yields ceil(n/chunk) ordered chunk rows that reassemble") {
    val df = Seq(("a", "0123456789")).toDF("id", "payload")
      .withColumn("media", col("payload").cast("binary"))
    val out = Multimodal.chunked(df, "media", chunkSize = 4)
      .orderBy("chunk_idx")
      .select(col("chunk_idx"), col("chunk").cast("string"))
      .as[(Int, String)].collect()
    assert(out.map(_._2).mkString === "0123456789")
    assert(out.map(_._1).toSeq === Seq(0, 1, 2))
  }

  test("rule selection: coverage CDF cut includes the crossing rule") {
    val rules = Seq(
      ("r1", "Any", "[#6:1]>>[#6:1]", "Any"),
      ("r2", "Any", "[#7:1]>>[#7:1]", "Any"),
      ("r3", "Any", "[#8:1].[O:2]=[O:3]>>[#8:1]", "Any"),
      ("r4", "Any", "[#16:1]>>[#16:1]", "Any"))
      .toDF("Name", "Reactants", "SMARTS", "Products")
    val coverage = (Seq.fill(50)("r1") ++ Seq.fill(30)("r2") ++
      Seq.fill(15)("r3") ++ Seq.fill(5)("r4"))
      .zipWithIndex.map { case (n, i) => (n, s"rxn$i") }
      .toDF("Name", "Reaction")
    // 0.6 fraction: r1 (0.5) + r2 (0.8 crossing) — bisect_right keeps r2
    val byFrac = RuleSelection.select(rules, coverage,
      fractionCoverage = Some(0.6))
    assert(byFrac.select("Name").as[String].collect().toSeq ===
      Seq("r1", "r2"))
    // top-n
    val topN = RuleSelection.select(rules, coverage, nRules = Some(3))
    assert(topN.count() === 3)
    // anaerobic: exclude O2-consuming SMARTS (rules.py:123-128)
    val anaerobic = RuleSelection.select(rules, coverage,
      excludeSmarts = Some("\\[O:\\d+\\]=\\[O:\\d+\\]"))
    assert(!anaerobic.select("Name").as[String].collect().contains("r3"))
  }
}
