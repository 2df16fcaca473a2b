package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.NotInRewrite

/** NotInRewrite must match native NOT IN semantics (the reference's
  * null_aware.rs:59-149 cases) while planning only ordinary distributable
  * joins. */
class NotInRewriteSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def natives(subSql: String): Array[Long] = {
    Tables.load(spark, sf, "customer").createOrReplaceTempView("customer")
    Tables.load(spark, sf, "orders").createOrReplaceTempView("orders")
    spark.sql(
      s"SELECT c_custkey FROM customer WHERE c_custkey NOT IN ($subSql)")
      .orderBy("c_custkey").collect().map(_.getLong(0))
  }

  test("matches native NOT IN when subquery has no NULLs") {
    val c = Tables.load(spark, sf, "customer")
    val sub = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000).select(col("o_custkey"))
    val rewritten = NotInRewrite.notIn(c, col("c_custkey"), sub)
      .orderBy("c_custkey").collect().map(_.getLong(0))
    val native =
      natives("SELECT o_custkey FROM orders WHERE o_totalprice > 400000")
    assert(rewritten.sameElements(native))
    assert(rewritten.nonEmpty)
  }

  test("matches native NOT IN when subquery contains NULLs (empty result)") {
    val c = Tables.load(spark, sf, "customer")
    val sub = Tables.load(spark, sf, "orders")
      .select(when(col("o_orderkey") % 50 === 0, lit(null))
        .otherwise(col("o_custkey")).as("k"))
    val rewritten = NotInRewrite.notIn(c, col("c_custkey"), sub).count()
    val native = natives(
      "SELECT CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_custkey END FROM orders").length
    assert(rewritten == 0 && native == 0)
  }

  test("empty subquery passes every row") {
    val c = Tables.load(spark, sf, "customer")
    val sub = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") < -1).select(col("o_custkey"))
    assert(NotInRewrite.notIn(c, col("c_custkey"), sub).count() == c.count())
  }

  test("plans only ordinary joins (no null-aware single-task join)") {
    val c = Tables.load(spark, sf, "customer")
    val sub = Tables.load(spark, sf, "orders").select(col("o_custkey"))
    val p = NotInRewrite.notIn(c, col("c_custkey"), sub)
      .queryExecution.executedPlan.toString()
    assert(!p.contains("NAAJ") && !p.toLowerCase.contains("nullaware"), p)
    assert(p.contains("LeftAnti"), p)
  }
}
