package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.ParallelWindow
import graft.queries.Dx._

/** ParallelWindow must (1) return exactly what the serial no-PARTITION-BY
  * window returns, and (2) actually run the window partitioned by range
  * bucket (the point of the reference's PartitionedBoundedWindowAggExec). */
class ParallelWindowSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("row-identical to the serial global window") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val parallel = ParallelWindow.rollingAgg(ev, "ts", "event_id",
        sum(dec(col("value"))), preceding = 10, nBuckets = 8, out = "rsum")
      .select(col("event_id"), col("rsum").cast("double"))
      .orderBy(col("event_id")).collect()
    val serial = ev.select(col("event_id"),
        sum(dec(col("value"))).over(Window
          .orderBy(col("ts"), col("event_id")).rowsBetween(-10, 0))
          .cast("double"))
      .orderBy(col("event_id")).collect()
    assert(parallel.length == serial.length)
    parallel.zip(serial).foreach { case (p, s) => assert(p == s) }
  }

  test("window executes partitioned by bucket, not on one partition") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val df = ParallelWindow.rollingAgg(ev, "ts", "event_id",
      sum(dec(col("value"))), preceding = 10, nBuckets = 8, out = "rsum")
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("hashpartitioning(__bucket"),
      s"window not partitioned by range bucket:\n$p")
  }
}
