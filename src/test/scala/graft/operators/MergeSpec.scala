package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** CDC merge semantics pins: latest wins, deletes drop, inserts land,
  * deleted-then-upserted resurrects, and the version reduce is
  * deterministic under any partition layout.
  */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    .toDF("k", "name", "v")

  test("upsert, delete, insert, latest-wins, resurrect") {
    val changes = Seq(
      // plain update of k=1
      (1L, "a2", 11L, "u", 1L),
      // delete k=2
      (2L, "b", 20L, "d", 1L),
      // k=3: update then delete -> delete wins (latest)
      (3L, "c2", 31L, "u", 1L),
      (3L, "c2", 31L, "d", 2L),
      // k=4: delete then upsert -> resurrects with new value
      (4L, "d", 40L, "d", 1L),
      (4L, "d2", 42L, "u", 2L),
      // k=9: pure insert (no base row)
      (9L, "i", 90L, "u", 1L))
      .toDF("k", "name", "v", "op", "seq")
    val out = Merge.cdcMerge(base, changes, Seq("k"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "a2", 11L), (4L, "d2", 42L), (9L, "i", 90L)))
  }

  test("no changes is identity; reduce is layout-independent") {
    val empty = Seq.empty[(Long, String, Long, String, Long)]
      .toDF("k", "name", "v", "op", "seq")
    assert(Merge.cdcMerge(base, empty, Seq("k")).count() === 4)

    val manyVersions = (1 to 40).map(i =>
      (1L, s"n$i", i.toLong, "u", i.toLong))
      .toDF("k", "name", "v", "op", "seq")
    val a = Merge.cdcMerge(base, manyVersions, Seq("k"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    val b = Merge.cdcMerge(base, manyVersions.repartition(7), Seq("k"))
      .orderBy("k").as[(Long, String, Long)].collect().toSeq
    assert(a === b)
    assert(a.head === ((1L, "n40", 40L))) // seq 40 wins
  }
}
