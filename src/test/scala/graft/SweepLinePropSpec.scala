package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property: p21's windowed sweep-line summary equals a literal
  * day-by-day brute force on arbitrary per-key interval sets —
  * duplicates (identical (st, en) pairs, the window-tie case), nested
  * and touching intervals (one ending exactly where the next starts
  * must NOT count as concurrent under half-open semantics, but DOES
  * merge into one island), and keys whose intervals are all disjoint.
  * Brute-force peak scans every day in the key's span and counts
  * containing intervals; brute-force coverage/islands merge the sorted
  * interval list in plain Scala.
  */
class SweepLinePropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("sweep summary == day-scan brute force on random intervals") {
    val s = spark
    import s.implicits._
    val epochMs = 86400000L
    def day(d: Int): Date = new Date(d.toLong * epochMs)
    // Narrow day range (0..40) + spans 1..12 over few keys → heavy
    // overlap, frequent exact duplicates and touch points.
    val genIv = for {
      k <- Gen.choose(0, 2)
      st <- Gen.choose(0, 40)
      span <- Gen.choose(1, 12)
    } yield (k.toLong, st, st + span)
    val genCase = Gen.listOfN(30, genIv)

    def brute(ivs: List[(Long, Int, Int)])
        : Map[Long, (Long, Long, Long, Long)] =
      ivs.groupBy(_._1).map { case (k, ks) =>
        val spans = ks.map(t => (t._2, t._3))
        val lo = spans.map(_._1).min
        val hi = spans.map(_._2).max
        val peak = (lo until hi)
          .map(t => spans.count(sp => sp._1 <= t && t < sp._2)).max
        // touching spans merge: islands over the (st, en)-sorted list
        val sorted = spans.sorted
        val islands = sorted.tail.foldLeft(List(sorted.head)) {
          case (acc @ ((ist, ien) :: rest), (st2, en2)) =>
            if (st2 > ien) (st2, en2) :: acc
            else (ist, math.max(ien, en2)) :: rest
          case (acc, _) => acc
        }
        val covered = islands.map(i => i._2 - i._1).sum.toLong
        k -> (spans.length.toLong, peak.toLong,
          islands.length.toLong, covered)
      }

    val prop = Prop.forAll(genCase) { ivs =>
      val df = ivs.map(t => (t._1, day(t._2), day(t._3)))
        .toDF("k", "st", "en")
      val got = graft.queries.Temporal.sweepSummary(df)
        .select(col("k"), col("n_intervals"), col("peak_concurrency"),
          col("n_islands"), col("covered_days"))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      got == brute(ivs)
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(25), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
