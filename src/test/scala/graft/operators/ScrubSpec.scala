package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the PII-scrub regex behavior on synthetic strings (the testdata
  * corpus contains no real PII, so q_text_scrub's oracle only proves
  * the wiring — the regex SEMANTICS are pinned here) and the
  * whole-token blocklist masking edge cases.
  */
class ScrubSpec extends SparkSuite {
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("text")
      .select(TextOps.scrubPii(col("text")).as("c"))
      .as[String].head()

  test("emails are replaced with [EMAIL], including dotted local parts") {
    assert(scrub("mail me at jane.doe+spam@sub.example.co today") ===
      "mail me at [EMAIL] today")
    assert(scrub("a@b.co,x@y.org") === "[EMAIL],[EMAIL]")
  }

  test("phone numbers with +country prefix are replaced with [PHONE]") {
    assert(scrub("call +1 555 867 5309 now") === "call [PHONE] now")
    assert(scrub("reach +44 7946 095 832 ok") === "reach [PHONE] ok")
    // no + prefix -> not matched (bare digit runs stay: they are years,
    // quantities, ids far more often than phones)
    assert(scrub("in 2026 we had 1234567 rows") ===
      "in 2026 we had 1234567 rows")
  }

  test("bare IPv4s are replaced with [IP]; version strings are not") {
    assert(scrub("served from 10.0.42.7 port 80") ===
      "served from [IP] port 80")
    // three dotted components is a version string, not an address
    assert(scrub("semver v1.2.3 is fine") === "semver v1.2.3 is fine")
  }

  test("email wins over IPv4 on overlapping spans (applied first)") {
    assert(scrub("root@10.0.0.1.example.com") === "[EMAIL]")
  }

  test("blocklist masks whole tokens only") {
    val out = Seq("the customer saw customers accumulate")
      .toDF("text")
      .withColumn("t", TextOps.tokens("text"))
      .select(array_join(
        TextOps.maskTokens(col("t"), Seq("customer", "merge"),
          "[MASKED]"),
        " ").as("m"))
      .as[String].head()
    // 'customers' and 'accumulate' contain the term but are NOT masked
    assert(out === "the [MASKED] saw customers accumulate")
  }

  test("scrub-then-tokenize keeps token alignment for downstream stages") {
    val row = Seq("ping 10.0.42.7 from jane@ex.co customer")
      .toDF("text")
      .withColumn("clean", TextOps.scrubPii(col("text")))
      .withColumn("t", TextOps.tokens("clean"))
      .select(col("clean"), size(col("t")).as("n"))
      .as[(String, Int)].head()
    assert(row === (("ping [IP] from [EMAIL] customer", 5)))
  }

  test("blocklist terms are data, not SQL text: quotes and backslashes " +
    "match literally; empty blocklists are rejected") {
    val out = Seq("say a'b and c\\d aloud")
      .toDF("text")
      .withColumn("t", TextOps.tokens("text"))
      .select(array_join(
        TextOps.maskTokens(col("t"), Seq("a'b", "c\\d"), "[DON'T]"),
        " ").as("m"))
      .as[String].head()
    assert(out === "say [DON'T] and [DON'T] aloud")
    intercept[IllegalArgumentException] {
      TextOps.maskTokens(col("t"), Seq.empty, "[MASKED]")
    }
  }

  test("piiCount counts sequentially, matching scrubPii's replacements") {
    def counts(s: String): (Long, Long) =
      Seq(s).toDF("text")
        .select(TextOps.piiCount(col("text")).as("n"),
          TextOps.scrubProjection(col("text"), Seq("zzz"), "[M]")
            .getField("n_pii").as("n2"))
        .as[(Long, Long)].head()
    // email whose host part is a dotted quad: ONE replacement -> 1,
    // not 2 (raw-text counting of email + IPv4 would double-count)
    assert(counts("root@10.0.0.1.example.com") === ((1L, 1L)))
    // disjoint spans still all count
    assert(counts("a@b.co then 10.0.42.7 then +1 555 867 5309") ===
      ((3L, 3L)))
    assert(counts("nothing here") === ((0L, 0L)))
  }
}
