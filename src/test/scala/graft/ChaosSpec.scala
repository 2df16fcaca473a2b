package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.plans.Chaos

/** ChaosExec fault injection + Spark task-retry recovery — the analogue of
  * the reference's chaos suite (`chaos_exec.rs`, `chaos-testing/`). Uses a
  * dedicated session with task retries enabled (local[4,2]). */
class ChaosSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4,2]") // 2 task attempts: retry absorbs the fault
      .appName("graft-chaos")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(GraftExtensions.install)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("ChaosNode plans to ChaosExec via the injected strategy") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val chaotic = Chaos.inject(spark, df, runId = "plan-check",
      failPartition = -1) // no fault, just the plan
    // SparkPlan.nodeName strips the Exec suffix: renders as "Chaos <args>"
    assert(chaotic.queryExecution.executedPlan.toString()
      .startsWith("Chaos "))
    assert(chaotic.count() == 25)
  }

  test("injected transient fault is absorbed by task retry") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .repartition(4)
    val runId = s"retry-${System.nanoTime()}"
    val chaotic = Chaos.inject(spark, df, runId, failPartition = 2)
    // First attempt of partition 2 throws; Spark retries the task and the
    // query must still produce the full, correct result.
    val n = chaotic.count()
    assert(n == df.count())
    assert(Chaos.attemptCount(runId) >= 5,
      s"expected a retried attempt, saw ${Chaos.attemptCount(runId)}")
  }
}
