package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Privacy audits: pinned class profiles on known data, negative-value
  * floor bucketing, ladder chosen-level semantics (incl. no-level-
  * satisfies), and the quarantine split's edge rules.
  */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  test("kAnonymity pins the class profile exactly") {
    // classes: (a,x)=3 rows, (a,y)=1, (b,x)=2  → k=1, 3 classes,
    // at k=2: one class (size 1) at risk carrying 1 row
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"),
      ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("q1", "q2")
    val r = Privacy.kAnonymity(df, Seq("q1", "q2"), 2L).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((1L, 3L, 6L, 1L, 1L)))
  }

  test("all-distinct QIs give k_anonymity = 1 with every row at risk") {
    val df = (1 to 5).map(i => (i, s"u$i")).toDF("id", "q")
    val r = Privacy.kAnonymity(df, Seq("q"), 5L).head()
    assert(r.getLong(0) === 1L && r.getLong(3) === 5L &&
      r.getLong(4) === 5L)
  }

  test("lDiversity flags homogeneous classes (l = 1)") {
    // class g1: sensitive {s1,s2} → l=2; class g2: {s1,s1,s1} → l=1
    val df = Seq(
      ("g1", "s1"), ("g1", "s2"),
      ("g2", "s1"), ("g2", "s1"), ("g2", "s1")).toDF("q", "s")
    val r = Privacy.lDiversity(df, Seq("q"), "s", 2L).head()
    // l_diversity=1, 2 classes, 1 below l carrying its 3 rows
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((1L, 2L, 1L, 3L)))
  }

  test("floorBucket floors negative values (engine-portable identity)") {
    val df = Seq(-21L, -20L, -1L, 0L, 9L, 10L, 19L).toDF("v")
      .withColumn("b", Privacy.floorBucket(col("v"), 10L))
    assert(df.select("b").as[Long].collect().toSeq ===
      Seq(-3L, -2L, -1L, 0L, 0L, 1L, 1L))
  }

  test("generalizationLadder marks the smallest satisfying width") {
    // values 0..9 in one fixed class: width 2 → classes of 2 (k=2);
    // width 5 → classes of 5 (k=5); width 10 → one class of 10.
    val df = (0 until 10).map(v => ("g", v.toLong)).toDF("g", "v")
    val out = Privacy.generalizationLadder(
      df, Seq("g"), col("v"), Seq(2L, 5L, 10L), 5L)
      .select("width", "k_anonymity", "satisfies", "chosen")
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq
    assert(out === Seq(
      (2L, 2L, false, false),
      (5L, 5L, true, true),     // smallest satisfying ladder rung
      (10L, 10L, true, false))) // satisfies but is not the least-coarse
  }

  test("generalizationLadder with no satisfying width chooses nothing") {
    val df = (0 until 4).map(v => ("g", v.toLong)).toDF("g", "v")
    val out = Privacy.generalizationLadder(
      df, Seq("g"), col("v"), Seq(1L, 2L), 100L)
      .select("satisfies", "chosen").as[(Boolean, Boolean)]
      .collect().toSeq
    assert(out === Seq((false, false), (false, false)))
  }

  test("quarantine: labels in declaration order, exact partition") {
    val parent = Seq(1L, 2L).toDF("pk")
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10L), "dup"),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(999L), "dup"),
      (java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long],
        "a"),
      (java.lang.Long.valueOf(9L), java.lang.Long.valueOf(10L), "b"),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L),
        "c"))
      .toDF("fk", "v", "k")
    val rules = Seq(
      Expectations.NotNull("v"),
      Expectations.Unique("k"),
      Expectations.InRange("v", 0L, 100L),
      Expectations.ForeignKey("fk", parent, "pk"))
    val labeled = Expectations.withViolations(df, rules)
      .select(col("k"), col("fk"), col("v"),
        array_join(col("violations"), ",").as("r"))
      .as[(String, Option[Long], Option[Long], String)]
      .collect().sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(labeled === Seq(
      // null v: not_null fires, in_range does NOT (nullness owns it);
      // "a" is a dup... no — k="a" unique; fk=1 valid
      ("a", Some(1L), None, "not_null:v"),
      // fk=9 orphan + v in range + unique k
      ("b", Some(9L), Some(10L), "foreign_key:fk"),
      // null fk is NOT an FK violation (SQL FK semantics)
      ("c", None, Some(10L), ""),
      // both dup rows marked; one also out of range — declaration order
      ("dup", Some(1L), Some(10L), "unique:k"),
      ("dup", Some(2L), Some(999L), "unique:k,in_range:v")))
    val (good, bad) = Expectations.quarantine(df, rules)
    assert(good.count() + bad.count() === df.count())
    assert(good.columns.toSeq === df.columns.toSeq)
    assert(good.select("k").as[String].collect().toSeq === Seq("c"))
  }
}
