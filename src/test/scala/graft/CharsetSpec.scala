package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.llm.TextAnalysis

/** Charset/encoding pins (round 9, from the round-8 advice):
  *
  *  1. The m07/m08/m09 DuckDB oracles compute frame energies from
  *     CODEPOINTS (ascii()/substr over split characters) while the
  *     Spark side uses UTF-8 payload BYTES — the twins agree only
  *     because the generated documents corpus is pure ASCII. That
  *     assumption is pinned HERE as a loud invariant: if a future
  *     corpus regeneration introduces multibyte text, this test names
  *     the problem instead of letting m-family hash comparisons fail
  *     mysteriously (the fix then is byte-level oracle CTEs).
  *
  *  2. t20's multibyte/replacement/mojibake counters are all zero on
  *     that same ASCII corpus, so the columns the audit exists for
  *     were never graded nonzero — the crafted-corpus test below runs
  *     real multibyte, U+FFFD, and Ã/Â mojibake text through the
  *     operator and checks hand-computed expectations.
  */
class CharsetSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fixture corpus is pure ASCII — the invariant the m-family " +
    "codepoint-vs-byte oracle equivalence relies on") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { sf =>
      val bad = Tables.load(spark, sf, "documents")
        .filter(col("text").isNotNull)
        .filter(expr("octet_length(text)") =!= length(col("text")))
        .count()
      assert(bad == 0L,
        s"$sf: $bad docs with multibyte text — the m07/m08/m09 oracles' " +
          "codepoint arithmetic no longer matches Spark's byte " +
          "arithmetic; move those oracle CTEs to byte-level semantics")
    }
  }

  test("t20 charset audit: multibyte, U+FFFD and mojibake marks are " +
    "counted exactly on a crafted corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "hello world", "en", "a", 11L),
      (2L, "café naïve", "fr", "a", 10L),
      (3L, "bad �� data", "en", "b", 11L),
      (4L, "mojibake Ã© and Â nbsp", "en", "b", 22L),
      (5L, "中文文本", "zh", "c", 4L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("t20corpus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.queries("t20_charset_audit")(spark, dir)
      .collect()
      .map(row => row.getString(0) -> (row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5), row.getLong(6)))
      .toMap
    // (n_docs, n_multibyte_docs, total_chars, total_bytes,
    //  n_replacement, n_mojibake_marks) — hand-computed:
    // a: "hello world" 11c/11b ASCII; "café naïve" 10c/12b (2×2-byte).
    assert(r("a") == ((2L, 1L, 21L, 23L, 0L, 0L)), s"a: ${r("a")}")
    // b: "bad �� data" 11c/15b (2×3-byte U+FFFD, both counted);
    //    "mojibake Ã© and Â nbsp" 22c/25b (Ã, ©, Â at 2 bytes each),
    //    mojibake marks = Ã + Â = 2 (© is not a marker).
    assert(r("b") == ((2L, 2L, 33L, 40L, 2L, 2L)), s"b: ${r("b")}")
    // c: 4 CJK chars at 3 bytes each.
    assert(r("c") == ((1L, 1L, 4L, 12L, 0L, 0L)), s"c: ${r("c")}")
  }
}
