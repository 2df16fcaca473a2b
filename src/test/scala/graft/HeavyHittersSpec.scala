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
}
