package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.ParallelWindow

/** Property test for the halo-bucket global window: on random inputs with
  * heavy order-key duplication (keys straddling bucket cut points are the
  * risk case), the K-way decomposition must be row-identical to the serial
  * `OVER (ORDER BY ...)` plan. w13's oracle checks one fixed dataset; this
  * pins the decomposition over the input space, within the documented
  * precondition (bucket size >= frame size).
  */
class ParallelWindowPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("halo-bucket rolling sum equals the serial global window") {
    val s = spark
    import s.implicits._
    val genCase = for {
      n <- Gen.choose(60, 150)
      // key domain much smaller than n → many duplicates at cut points
      keys <- Gen.listOfN(n, Gen.choose(0L, 30L))
      vals <- Gen.listOfN(n, Gen.choose(-100L, 100L))
      preceding <- Gen.choose(1, 5)
      nBuckets <- Gen.choose(2, 4)
    } yield (keys.zip(vals).zipWithIndex
      .map { case ((k, v), i) => (k, i.toLong, v) }, preceding, nBuckets)

    val prop = Prop.forAll(genCase) { case (rows, preceding, nBuckets) =>
      val df = rows.toDF("k", "tie", "v")
      // The guard may legitimately reject a generated case (duplicate
      // quantile cuts under key skew → an undersized/empty bucket); a
      // loud precondition error is correct behavior, so the property
      // holds vacuously there.
      try {
        val par = ParallelWindow.rollingAgg(df, "k", "tie",
            sum(col("v")), preceding, nBuckets, "roll")
          .select(col("k"), col("tie"), col("roll")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("tie")).rowsBetween(-preceding, 0)
        val serial = df.withColumn("roll", sum(col("v")).over(w))
          .select(col("k"), col("tie"), col("roll")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        par == serial
      } catch {
        case e: IllegalArgumentException
          if e.getMessage.contains("ParallelWindow precondition") => true
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("undersized bucket fails fast instead of truncating lookback") {
    val s = spark
    import s.implicits._
    // 10 rows over 2 buckets → ~5 rows/bucket, frame needs 8: the old
    // behavior silently dropped lookback at the bucket boundary.
    val df = (0 until 10).map(i => (i.toLong, i.toLong, 1L))
      .toDF("k", "tie", "v")
    val e = intercept[IllegalArgumentException] {
      ParallelWindow.rollingAgg(df, "k", "tie", sum(col("v")),
        preceding = 8, nBuckets = 2, out = "roll").collect()
    }
    assert(e.getMessage.contains("ParallelWindow precondition"))
  }
}
