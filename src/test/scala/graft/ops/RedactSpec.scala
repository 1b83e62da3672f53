package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** PII redaction (q107): typed counts, placeholder replacement, null text. */
class RedactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts and redacts every default PII type") {
    val df = Seq(
      (1L, "mail a.b_c%x+1@sub.ex-mail.org and d@e.io here"),
      (2L, "ssn 123-45-6789 phone 415-555-0134 ip 10.0.255.7"),
      (3L, "no pii at all")).toDF("id", "text")
    val got = Redact.scrub(df, "text")
      .select("id", "n_email", "n_ssn", "n_phone", "n_ip", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got(0) === ((1L, 2L, 0L, 0L, 0L,
      "mail <EMAIL> and <EMAIL> here")))
    assert(got(1) === ((2L, 0L, 1L, 1L, 1L,
      "ssn <SSN> phone <PHONE> ip <IP>")))
    assert(got(2) === ((3L, 0L, 0L, 0L, 0L, "no pii at all")))
  }

  test("replacement order: an earlier placeholder is not re-matched") {
    // SSN shape redacts before the phone pattern gets a chance to see it,
    // and a phone never matches inside an <SSN> placeholder.
    val df = Seq((1L, "123-45-6789 then 123-456-7890")).toDF("id", "text")
    val got = Redact.scrub(df, "text").select("text").as[String].head()
    assert(got === "<SSN> then <PHONE>")
  }

  test("word boundaries: digit runs embedded in longer tokens do not match") {
    val df = Seq((1L, "ref 9123-45-67890 v1.2.3.4.5")).toDF("id", "text")
    val r = Redact.scrub(df, "text")
      .select("n_ssn", "n_ip").as[(Long, Long)].head()
    // 9123-45-67890 has no \b before the 3-digit group; 1.2.3.4.5 has five
    // dotted groups so the first four match once (greedy left-to-right).
    assert(r._1 === 0L)
    assert(r._2 === 1L)
  }

  test("null text follows the empty-string convention") {
    val df = Seq((1L, null: String), (2L, "x@y.io")).toDF("id", "text")
    val got = Redact.scrub(df, "text")
      .select("id", "n_email", "text").orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 0L, ""), (2L, 1L, "<EMAIL>")))
  }
}
