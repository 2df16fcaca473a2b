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

  test("stage table reports shuffle read/write bytes and records per stage") {
    // A join + aggregation forces at least two materialized shuffle
    // stages under AQE; the stage table must surface their write AND
    // read counters — the per-stage view the reference renders in
    // DistributedExplainAnalyzeExec.
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val c = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .hint("merge", Seq.empty[String]: _*)
    val df = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    val t = graft.plans.ExplainAnalyze.stageTable(spark, df)
    assert(t.columns.toSeq == Seq("stage_id", "stage",
      "shuffle_records_written", "shuffle_bytes_written",
      "shuffle_records_read", "shuffle_bytes_read", "data_size_bytes"))
    val rows = t.collect()
    assert(rows.length >= 2, s"expected >=2 stages, got ${rows.toSeq}")
    assert(rows.exists(_.getLong(2) > 0), s"no stage wrote records: ${rows.toSeq}")
    assert(rows.exists(_.getLong(3) > 0), s"no stage wrote bytes: ${rows.toSeq}")
    assert(rows.exists(_.getLong(4) > 0), s"no stage read records: ${rows.toSeq}")
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
