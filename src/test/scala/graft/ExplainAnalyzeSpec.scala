package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** EXPLAIN ANALYZE analogue (reference `context_checks.rs:1129`):
  * executed-plan metrics must surface as a result table. */
class ExplainAnalyzeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("metrics table has output-row counts for an executed aggregation") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val m = graft.plans.ExplainAnalyze.run(spark, df)
    val all = m.collect()
    assert(all.nonEmpty, "no metrics at all")
    val names = all.map(_.getString(2)).distinct.sorted
    assert(all.exists(_.getString(2) == "numOutputRows"),
      s"no numOutputRows; metric names seen: ${names.mkString(", ")}")
    val render = graft.plans.ExplainAnalyze.render(spark, df)
    assert(render.nonEmpty)
  }

  test("observe() collects named runtime metrics on the query path") {
    // The reference ships per-operator metric sets to the client over
    // proto (ballista.proto:439-494); Spark's user-facing analogue for
    // pipeline-level counters is df.observe: named aggregates evaluated
    // DURING execution, no second pass over the data.
    val obs = new org.apache.spark.sql.Observation("graft_obs")
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(col("l_quantity").cast("long")).as("qty_sum"))
      .filter(col("l_quantity") > 25)
    val kept = df.count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] > kept,
      s"observe ran after the filter: $m vs kept=$kept")
    assert(m("qty_sum").asInstanceOf[Long] > 0)
  }
}
