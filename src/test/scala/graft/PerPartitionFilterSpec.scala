package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.PerPartitionFilter

/** Per-partition predicate dispatch (reference `PerPartitionFilterExec`):
  * each partition k keeps only rows passing predicates(k), the whole
  * dispatch stays one codegen'd Filter (no mapPartitions boundary).
  */
class PerPartitionFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("each partition applies its own predicate; equals manual dispatch") {
    val df = spark.range(0, 1000).toDF("v").repartition(3)
    val preds = Seq(col("v") % 2 === 0, col("v") % 2 === 1, col("v") < 100)
    val got = PerPartitionFilter.filter(df, preds)
      .select(spark_partition_id().as("pid"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.nonEmpty)
    // every surviving row satisfies its partition's predicate
    got.foreach { case (pid, v) =>
      val ok = pid match {
        case 0 => v % 2 == 0
        case 1 => v % 2 == 1
        case 2 => v < 100
        case _ => true
      }
      assert(ok, s"row $v survived in partition $pid against its predicate")
    }
    // and equals the manual per-partition dispatch over the same layout
    val manual = df.select(spark_partition_id().as("pid"), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .filter { case (pid, v) => pid match {
        case 0 => v % 2 == 0
        case 1 => v % 2 == 1
        case 2 => v < 100
        case _ => true
      }}
    assert(got.sorted.toSeq == manual.sorted.toSeq)
  }

  test("dispatch compiles to a single codegen'd Filter (no mapPartitions)") {
    val df = spark.range(0, 100).toDF("v").repartition(2)
    val preds = Seq(col("v") > 10, col("v") < 90)
    val p = PerPartitionFilter.filter(df, preds)
      .queryExecution.executedPlan.toString()
    assert(p.contains("Filter"), p)
    assert(!p.contains("MapPartitions"), p)
  }
}
