package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.SaltedJoin

/** Property: the salted join is row-identical (as a multiset) to the plain
  * inner equi-join on arbitrary skewed inputs — including the motivating
  * case of one key owning most rows, duplicate rows on both sides, and
  * keys present on only one side. The p04 oracle checks one fixed skewed
  * dataset; this pins the losslessness claim over the input space.
  */
class SaltedJoinPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted join is multiset-equal to the plain join on skewed inputs") {
    val s = spark
    import s.implicits._
    // 70% of probe rows land on key 0 — the hot-key regime salting exists
    // for; remaining keys uniform.
    val genLeftRow = for {
      k <- Gen.frequency((7, Gen.const(0L)), (3, Gen.choose(1L, 5L)))
      v <- Gen.choose(0L, 50L) // small domain → duplicate rows on purpose
    } yield (k, v)
    val genRightRow = for {
      k <- Gen.choose(0L, 7L)  // keys 6,7 unmatched on the left
      w <- Gen.choose(0L, 50L)
    } yield (k, w)
    val genCase = for {
      ls <- Gen.listOfN(60, genLeftRow)
      rs <- Gen.listOfN(20, genRightRow)
      nSalts <- Gen.choose(2, 5)
    } yield (ls, rs, nSalts)

    def multiset(rows: Array[org.apache.spark.sql.Row])
        : Map[(Long, Long, Long, Long), Int] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(identity).view.mapValues(_.length).toMap

    val prop = Prop.forAll(genCase) { case (ls, rs, nSalts) =>
      val left = ls.toDF("lk", "lv")
      val right = rs.toDF("rk", "rv")
      val saltedRows = SaltedJoin
        .inner(left, right, "lk", "rk", col("lv"), nSalts)
        .select(col("lk"), col("lv"), col("rk"), col("rv")).collect()
      val plainRows = left.join(right, col("lk") === col("rk"))
        .select(col("lk"), col("lv"), col("rk"), col("rv")).collect()
      multiset(saltedRows) == multiset(plainRows)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
