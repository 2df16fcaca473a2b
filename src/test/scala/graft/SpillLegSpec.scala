package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Constrained-memory verification leg — the analogue of the reference's
  * CI gates that re-run the verified suite under a 2 GB memory pool
  * (`.github/workflows/tpch.yml:136`) and the tiny-memory-budget
  * sort-shuffle suite (`ballista/client/tests/sort_shuffle.rs:152-538`).
  *
  * Scalatest shares one JVM across suites, so a per-suite small heap is
  * not available; instead the leg forces Spark's spill machinery directly
  * by dropping the in-memory row thresholds of every spillable operator
  * (window buffers, sort-merge-join buffers, external sort/aggregate) to
  * a few rows. That is stronger than a merely-small heap: the external
  * sorter / ExternalAppendOnlyUnsafeRowArray spill paths are GUARANTEED
  * to execute (asserted via TaskMetrics), not just likely to. Results
  * must be identical to the default profile — spilling is an executor
  * memory-management concern and must never change answers.
  */
class SpillLegSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.01"
  private var spark: SparkSession = _
  @volatile private var spilledBytes = 0L

  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        spilledBytes += t.taskMetrics.memoryBytesSpilled +
          t.taskMetrics.diskBytesSpilled
  }

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    spark.sparkContext.addSparkListener(listener)
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      spark.sparkContext.removeSparkListener(listener)
      spark.stop()
    }
  }

  // Shapes chosen to exercise every spillable operator family: TopK over
  // a grouped join (q18), high-cardinality hash aggregation (h05, h10),
  // object-hash aggregation (a04), the LSH bucket-join pipeline (d03),
  // and the window paths (w13 global halo-bucket, w14 top-N sweep).
  private val slice = Seq("q18_large_orders", "h05_sum3_by_id6",
    "h10_sum_count_by_all", "a04_collect_list", "d03_minhash_lsh_pairs",
    "w13_parallel_global", "w14_topn_sweep")

  // Buffer thresholds are PER window-partition / PER join-key buffer —
  // small enough to engage at sf0.01 (window partitions there hold
  // hundreds-to-thousands of rows), large enough that the spill-file
  // count stays sane (2-row thresholds at sf0.001 produced so many
  // micro-spills the JVM died — the opposite failure mode). The Tungsten
  // test-fallback conf forces hash aggregation onto its sort-based
  // external path after 128 in-memory keys — the same mechanism Spark's
  // own aggregate spill suites use; the object-hash threshold does the
  // same for collect_list/collect_set.
  private val spillConfs = Map(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "16",
    "spark.sql.windowExec.buffer.spill.threshold" -> "16",
    "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold" -> "64",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "64",
    "spark.sql.cartesianProductExec.buffer.in.memory.threshold" -> "64",
    "spark.sql.cartesianProductExec.buffer.spill.threshold" -> "64",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "128",
    "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "128,256")

  private def runOnce(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq

  private def withConfs[T](confs: Map[String, String])(body: => T): T = {
    val prev = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  slice.foreach { name =>
    test(s"identical rows under forced spill: $name") {
      val baseline = runOnce(name)
      assert(baseline.nonEmpty, s"$name returned no rows")
      val got = withConfs(spillConfs)(runOnce(name))
      assert(got == baseline,
        s"$name differs under spill leg (${got.size} vs ${baseline.size} rows)")
    }
  }

  test("the leg actually spilled (TaskMetrics spill bytes > 0)") {
    // Listener events are delivered asynchronously — poll briefly.
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (spilledBytes == 0L && System.nanoTime() < deadline)
      Thread.sleep(200)
    assert(spilledBytes > 0L,
      "no task reported spilled bytes — the thresholds did not engage")
  }
}
