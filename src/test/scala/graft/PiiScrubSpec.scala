package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextStats

/** PII detection + redaction: counts, placeholder substitution, rule
  * ordering (email before IP — the domain's dots must never leave
  * half-matched residue), global replacement, and PII-free text
  * passing through untouched.
  */
class PiiScrubSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def scrub(s: String): (Long, Long, Long, String) = {
    val df = Seq(Tuple1(s)).toDF("t")
    df.select(TextStats.piiCounts(col("t")).as("c"),
        TextStats.redactPii(col("t")).as("r"))
      .select(col("c.n_emails"), col("c.n_phones"), col("c.n_ips"),
        col("r"))
      .as[(Long, Long, Long, String)].head()
  }

  test("counts and placeholders for each rule family; multiple " +
      "occurrences all redact (global replacement)") {
    assert(scrub("mail a.b+c@sub.example.org now") ===
      ((1L, 0L, 0L, "mail [EMAIL] now")))
    assert(scrub("call +84-123-4567 or +1-555-0000 today") ===
      ((0L, 2L, 0L, "call [PHONE] or [PHONE] today")))
    assert(scrub("host 192.168.0.1 gateway 10.0.0.254") ===
      ((0L, 0L, 2L, "host [IP] gateway [IP]")))
    assert(scrub("x@y.io +1-555-1234 1.2.3.4") ===
      ((1L, 1L, 1L, "[EMAIL] [PHONE] [IP]")))
  }

  test("email rule runs before the IP rule — an IP-looking domain " +
      "redacts as ONE email, not as residue around an [IP]") {
    // detection counts read the RAW text (both rules fire there —
    // that is the audit contract); redaction applies email first, so
    // the whole address becomes [EMAIL] instead of u@[IP].example.com
    assert(scrub("u@10.2.3.4.example.com") === ((1L, 0L, 1L, "[EMAIL]")))
  }

  test("PII-free text passes through byte-identical; version strings " +
      "with fewer than three dots survive") {
    val clean = "spark 4.1 reads 3.2 GB in 1.5 s"
    assert(scrub(clean) === ((0L, 0L, 0L, clean)))
  }
}
