package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The correctness gate's failure path must be LOUD: round 10 shipped
  * with 6 of 88 registered queries erroring, yet the artifact read
  * 82/82 green because a throwing query leaves no output directory and
  * the checker silently dropped it. These cases pin the r11 fix:
  * `errors.json` always accounts for every registered query.
  */
class VerifySpec extends SparkSuite {

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft-verify-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val okQuery: (SparkSession, String) => DataFrame =
    (s, _) => { import s.implicits._; Seq((1, "a"), (2, "b")).toDF("id", "v") }
  private val boomQuery: (SparkSession, String) => DataFrame =
    (_, _) => throw new IllegalStateException("forced failure\nsecond line")

  test("a throwing query is recorded in errors.json, not silently dropped") {
    val out = tmpDir("fail")
    val errs = Verify.run(spark, sf, out,
      queries = Map("q_ok" -> okQuery, "q_boom" -> boomQuery),
      oracleSql = Map("q_ok" -> "SELECT 1"),
      only = None)
    assert(errs.keySet == Set("q_boom"))
    // the good query still wrote; the bad one left NO stale parquet
    assert(Files.exists(Paths.get(out, "q_ok")))
    assert(!Files.exists(Paths.get(out, "q_boom")))
    val marker = Files.readString(Paths.get(out, "errors.json"))
    assert(marker.contains("\"n_registered\": 2"))
    assert(marker.contains("\"n_selected\": 2"))
    assert(marker.contains("\"n_written\": 1"))
    assert(marker.contains("\"q_boom\""))
    assert(marker.contains("IllegalStateException"))
    // multi-line exception messages must not break the JSON encoding
    assert(!marker.linesIterator.drop(1).hasNext)
  }

  test("a failed query's prior output is deleted before the attempt") {
    val out = tmpDir("stale")
    // seed a stale "green" output for the query that will fail
    Verify.run(spark, sf, out,
      Map("q_boom" -> okQuery), Map.empty, None)
    assert(Files.exists(Paths.get(out, "q_boom")))
    val errs = Verify.run(spark, sf, out,
      Map("q_boom" -> boomQuery), Map.empty, None)
    assert(errs.contains("q_boom"))
    assert(!Files.exists(Paths.get(out, "q_boom")),
      "stale parquet from a prior run must not survive a failing re-run")
  }

  test("all-green run writes an empty errors map with full counts") {
    val out = tmpDir("green")
    val errs = Verify.run(spark, sf, out,
      Map("q_ok" -> okQuery), Map("q_ok" -> "SELECT 1"), None)
    assert(errs.isEmpty)
    val marker = Files.readString(Paths.get(out, "errors.json"))
    assert(marker.contains("\"n_registered\": 1"))
    assert(marker.contains("\"n_written\": 1"))
    assert(marker.contains("\"errors\": {}"))
    // the start-of-run crash sentinel must have been overwritten
    assert(!marker.contains("__run_incomplete__"))
  }

  test("the crash sentinel is on disk while queries run, so a mid-run " +
    "JVM death cannot leave partial outputs with no audit trail") {
    val out = tmpDir("crash")
    // observe errors.json from INSIDE a query body: at that moment the
    // run is by definition incomplete, which is exactly the state a
    // crash would freeze on disk
    var seen: String = null
    Verify.run(spark, sf, out,
      Map("q_probe" -> ((s: org.apache.spark.sql.SparkSession, _: String) => {
        seen = Files.readString(Paths.get(out, "errors.json"))
        import s.implicits._
        Seq(1).toDF("x")
      })),
      Map.empty, None)
    assert(seen != null && seen.contains("__run_incomplete__"),
      s"sentinel absent while queries were running: $seen")
    val after = Files.readString(Paths.get(out, "errors.json"))
    assert(!after.contains("__run_incomplete__") &&
      after.contains("\"n_written\": 1"))
  }

  test("subset run prunes unselected outputs and counts honestly") {
    val out = tmpDir("subset")
    Verify.run(spark, sf, out,
      Map("q_a" -> okQuery, "q_b" -> okQuery), Map.empty, None)
    assert(Files.exists(Paths.get(out, "q_b")))
    Verify.run(spark, sf, out,
      Map("q_a" -> okQuery, "q_b" -> okQuery), Map.empty,
      only = Some(Set("q_a")))
    assert(!Files.exists(Paths.get(out, "q_b")),
      "unselected stale output must be pruned so a subset dir can't gate the full registry")
    val marker = Files.readString(Paths.get(out, "errors.json"))
    assert(marker.contains("\"n_registered\": 2"))
    assert(marker.contains("\"n_selected\": 1"))
  }
}
