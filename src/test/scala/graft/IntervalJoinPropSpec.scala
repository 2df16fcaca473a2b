package graft

import java.sql.Date

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.IntervalJoin

/** Property: the binned interval-overlap join (p20's engine) is
  * multiset-identical to an in-memory brute force (max(starts) <
  * min(ends), the set definition of non-empty intersection) on
  * arbitrary interval sets — including zero-length intervals (overlap
  * nothing under half-open semantics), intervals spanning many buckets
  * (explode fanout > 2), interval ends landing exactly on bucket
  * boundaries, duplicate intervals on both sides, and bucket widths
  * from 1 day (key-per-day) to wider than every interval (all keys
  * collapse toward one bucket). The subtle claim under test is the
  * canonical-bucket rule: each overlapping pair is produced EXACTLY
  * once — no misses at boundaries, no double counts without a
  * distinct. The p20 oracle checks one fixed dataset; this pins the
  * equivalence over the input space.
  */
class IntervalJoinPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("binned overlap join == brute-force theta join on random intervals") {
    val s = spark
    import s.implicits._
    val epochMs = 86400000L
    def day(d: Int): Date = new Date(d.toLong * epochMs)
    // Day offsets 0..120 with spans 0..45: crosses 1-day buckets
    // constantly and 40-day buckets occasionally; span 0 = empty.
    val genIv = for {
      st <- Gen.choose(0, 120)
      span <- Gen.frequency((1, Gen.const(0)), (6, Gen.choose(1, 45)))
    } yield (st, st + span)
    val genCase = for {
      ls <- Gen.listOfN(25, genIv)
      rs <- Gen.listOfN(25, genIv)
      bucketDays <- Gen.oneOf(1, 7, 30, 40, 200)
    } yield (ls, rs, bucketDays)

    def multiset(rows: Array[org.apache.spark.sql.Row])
        : Map[(Long, Long), Int] =
      rows.map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(identity).view.mapValues(_.length).toMap

    val prop = Prop.forAll(genCase) { case (ls, rs, bucketDays) =>
      val left = ls.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, day(a), day(b)) }
        .toDF("lid", "ls", "le")
      val right = rs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, day(a), day(b)) }
        .toDF("rid", "rs", "re")
      val binned = IntervalJoin
        .overlap(left, right, "ls", "le", "rs", "re", bucketDays)
        .select(col("lid"), col("rid")).collect()
      // In-memory brute force from the SET definition — non-empty
      // intersection of half-open intervals iff max(starts) <
      // min(ends), which is false whenever either side is empty. An
      // INDEPENDENT derivation: a Spark theta join sharing the
      // operator's own predicate could never catch an empty-interval
      // contract violation.
      val brute: Map[(Long, Long), Int] = (for {
        ((la, lb), i) <- ls.zipWithIndex
        ((ra, rb), j) <- rs.zipWithIndex
        if math.max(la, ra) < math.min(lb, rb)
      } yield (i.toLong, j.toLong))
        .groupBy(identity).view.mapValues(_.length).toMap
      multiset(binned) == brute
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(30), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
