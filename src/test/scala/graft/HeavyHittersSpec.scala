package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The Misra-Gries mergeable-summaries guarantees the t19 gate can't
  * articulate (stored counts are merge-order-sensitive): presence of
  * every f > n/k item, the two-sided count bound f − n/k ≤ stored ≤ f,
  * and the ≤ k−1 state bound — all under ADVERSARIAL partitionings
  * (single partition, many small partitions, value-clustered
  * partitions), which is exactly where a broken merge rule diverges.
  */
class HeavyHittersSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Zipf-ish deterministic corpus: item i appears ~N/(i+1) times. */
  private def corpus(nDistinct: Int, scale: Int): Seq[String] =
    (0 until nDistinct).flatMap(i =>
      Seq.fill(math.max(scale / (i + 1), 1))(s"tok$i"))

  test("MG sketch keeps every f > n/k item with bounded counts under " +
    "adversarial partitionings") {
    val s = spark
    import s.implicits._
    val k = 10
    val items = corpus(200, 2000)
    val exact = items.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = items.size.toLong
    val guaranteed = exact.filter { case (_, f) => f * k > n }.keySet
    assert(guaranteed.nonEmpty, "test corpus has no heavy hitters")
    val df = items.toDF("tok")
    val layouts = Seq(
      df.coalesce(1),
      df.repartition(13),
      // Value-clustered: each item's occurrences land in ONE partition,
      // so merges see maximally disjoint partials.
      df.repartition(8, col("tok")))
    layouts.zipWithIndex.foreach { case (lay, li) =>
      val m = lay.agg(expr(s"mg_topk(tok, $k)")).head()
        .getMap[String, Long](0)
      assert(m.size <= k - 1, s"layout $li: state exceeded k-1 entries")
      guaranteed.foreach { t =>
        assert(m.contains(t),
          s"layout $li: guaranteed heavy hitter $t missing")
      }
      m.foreach { case (t, c) =>
        val f = exact.getOrElse(t, 0L)
        assert(c <= f, s"layout $li: stored count $c overshoots exact $f")
        assert(c >= f - n / k,
          s"layout $li: stored count $c below the f - n/k bound for $t")
      }
    }
  }

  test("mg_topk on a <k-1 cardinality column is exactly COUNT(*)") {
    val s = spark
    import s.implicits._
    val df = Seq.tabulate(300)(i => s"v${i % 5}").toDF("tok")
      .repartition(11)
    val m = df.agg(expr("mg_topk(tok, 50)")).head()
      .getMap[String, Long](0)
    val exact = (0 until 5).map(i => s"v$i" -> 60L).toMap
    assert(m.toMap == exact, s"sub-capacity sketch not exact: $m")
  }

  test("t21 Count-Min estimates equal an in-memory CMS on a vocabulary " +
    "larger than the sketch (collisions forced), and never undercount") {
    val s = spark
    import s.implicits._
    // 5000 distinct fillers over 3×1024 counters force collisions into
    // the heavy tokens' buckets — the regime where est > freq appears
    // and the one-sided guarantee (never est < freq) earns its keep.
    val heavyToks = Seq("alpha", "beta", "gamma")
    val fillers = (0 until 5000).map(i => f"w$i%04d")
    val words = heavyToks.flatMap(Seq.fill(1000)(_)) ++ fillers
    val docs = words.grouped(200).zipWithIndex
      .map { case (ws, i) =>
        (i.toLong, ws.mkString(" "), "en", "src0", 1L)
      }.toSeq
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("t21corpus").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // In-memory reference CMS with the same md5 bucket derivation.
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(tok: String, j: Int): Int = {
      val h = md.digest(s"$tok#$j".getBytes("UTF-8"))
      val hex = h.take(4).map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex, 16) % 1024L).toInt
    }
    val cms = Array.fill(3, 1024)(0L)
    words.foreach(t => (0 until 3).foreach(j => cms(j)(bucket(t, j)) += 1))
    val exact = words.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong
    }
    val n = words.size.toLong
    val expected = exact.filter { case (_, f) => f * 100 > n }
      .map { case (t, f) =>
        val est = (0 until 3).map(j => cms(j)(bucket(t, j))).min
        (t, f, est, if (est > f) 1L else 0L)
      }.toSet
    assert(expected.nonEmpty, "no heavy tokens in the synthetic corpus")

    val got = graft.llm.TextAnalysis.queries("t21_countmin_sketch")(
        spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
      .toSet
    assert(got == expected)
    got.foreach { case (t, f, est, _) =>
      assert(est >= f, s"CMS undercounted $t: $est < $f")
    }
  }
}
