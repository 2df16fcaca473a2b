package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the z-order layout audit (c29) and the bigram
  * typicality model (t18) beyond the oracle's value hash: exact tile
  * balance, sort-layout monotonicity, the normalized curve's
  * both-dimension pruning win, and the typicality score's lower bound.
  */
class LayoutAuditSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("c29: exact ntile balance and full coverage in both layouts") {
    val r = graft.queries.Composite.queries("c29_zorder_layout")(spark, sf)
      .cache()
    assert(r.count() == 64, "2 layouts x 32 files")
    val n = Tables.load(spark, sf, "lineitem").count()
    val byLayout = r.groupBy(col("layout"))
      .agg(sum(col("n_rows")).as("total"),
        max(col("n_rows")).as("mx"), min(col("n_rows")).as("mn"))
      .collect()
    byLayout.foreach { row =>
      assert(row.getAs[Long]("total") == n,
        s"${row.getString(0)}: files don't cover the table")
      assert(row.getAs[Long]("mx") - row.getAs[Long]("mn") <= 1,
        s"${row.getString(0)}: ntile balance broken")
    }
  }

  test("c29: pk_sort files are partkey-monotone; z-order bounds the " +
    "suppkey spans a 1-d sort leaves at full range") {
    val r = graft.queries.Composite.queries("c29_zorder_layout")(spark, sf)
      .cache()
    // 1-d sort layout: file pk ranges advance with file id (boundaries
    // may share a key value, so min is non-decreasing, not disjoint).
    val pkViol = r.filter(col("layout") === "pk_sort")
      .withColumn("prev_min", lag(col("pk_min"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("layout"))
          .orderBy(col("f"))))
      .filter(col("prev_min").isNotNull && col("pk_min") < col("prev_min"))
      .count()
    assert(pkViol == 0, s"$pkViol pk_sort files out of key order")
    // The normalized z-curve's win: the 1-d sort leaves suppkey spans
    // at (essentially) the full range in EVERY file; the z-order layout
    // must bound the AVERAGE suppkey span strictly below that.
    val spans = r.groupBy(col("layout"))
      .agg(avg(col("sk_max") - col("sk_min")).as("avg_sk_span"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(spans("zorder") < spans("pk_sort") * 0.8,
      s"z-order avg suppkey span ${spans("zorder")} not below " +
        s"0.8x the 1-d sort's ${spans("pk_sort")} — the curve isn't " +
        "clustering the second dimension")
  }

  test("t18: typicality >= 1 (every instance counts itself) and " +
    "own-only bigrams bounded by distinct bigrams") {
    val r = graft.llm.TextAnalysis
      .queries("t18_bigram_typicality")(spark, sf).cache()
    assert(r.filter(col("typicality") < 1.0 - 1e-12).count() == 0,
      "typicality below its arithmetic lower bound")
    assert(r.filter(col("n_own_only") > col("n_distinct_bg")).count() == 0)
    assert(r.filter(col("n_distinct_bg") > col("n_bg")).count() == 0)
  }
}
