package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Source/sink surface — the reference's scan + write rows (SURVEY.md §2B):
  * CSV (`README.md:49`), Parquet (`context_basic.rs:47`), JSON listing
  * tables, in-memory tables, `df.write_parquet`/`write_csv`
  * (`context_basic.rs:47-76`), INSERT INTO + write-read roundtrip
  * (`context_checks.rs:596-657`).
  */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    tmp = Files.createTempDirectory("graft-sources").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("parquet write + read roundtrip preserves rows and schema") {
    val n = Tables.load(spark, sf, "nation")
    n.write.mode(SaveMode.Overwrite).parquet(s"$tmp/nation_pq")
    val back = spark.read.parquet(s"$tmp/nation_pq")
    assert(back.schema == n.schema)
    assert(back.count() == n.count())
  }

  test("csv write + read roundtrip (header + explicit schema)") {
    val n = Tables.load(spark, sf, "nation")
    n.write.mode(SaveMode.Overwrite).option("header", "true")
      .csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").schema(n.schema)
      .csv(s"$tmp/nation_csv")
    assert(back.count() == n.count())
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(n.orderBy("n_nationkey").collect()))
  }

  test("orc write + read roundtrip") {
    // Spark ships ORC natively — source breadth beyond the reference's
    // CSV/Parquet/JSON/Arrow listing formats, same scan surface.
    val n = Tables.load(spark, sf, "nation")
    n.write.mode(SaveMode.Overwrite).orc(s"$tmp/nation_orc")
    val back = spark.read.orc(s"$tmp/nation_orc")
    assert(back.schema == n.schema)
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(n.orderBy("n_nationkey").collect()))
  }

  test("json write + read roundtrip") {
    val r = Tables.load(spark, sf, "region")
    r.write.mode(SaveMode.Overwrite).json(s"$tmp/region_json")
    val back = spark.read.schema(r.schema).json(s"$tmp/region_json")
    assert(back.orderBy("r_regionkey").collect()
      .sameElements(r.orderBy("r_regionkey").collect()))
  }

  test("in-memory table (createDataFrame) joins against parquet") {
    val s = spark; import s.implicits._
    val mem = Seq((0, "AFRICA-X"), (1, "AMERICA-X")).toDF("key", "alias")
    val joined = Tables.load(spark, sf, "region")
      .join(mem, col("r_regionkey") === col("key"))
    assert(joined.count() == 2)
  }

  test("INSERT INTO external table (SQL write path)") {
    spark.sql(s"""CREATE TABLE IF NOT EXISTS nation_ext
      USING parquet LOCATION '$tmp/nation_ext'
      AS SELECT * FROM parquet.`$sf/nation.parquet`""")
    spark.sql(
      s"INSERT INTO nation_ext SELECT n_nationkey + 100, n_name, n_regionkey " +
        s"FROM parquet.`$sf/nation.parquet` WHERE n_nationkey < 2")
    assert(spark.table("nation_ext").count() == 27)
    spark.sql("DROP TABLE nation_ext")
  }

  test("partitioned parquet write prunes partitions on read") {
    val o = Tables.load(spark, sf, "orders")
    o.withColumn("status", col("o_orderstatus"))
      .write.mode(SaveMode.Overwrite).partitionBy("status")
      .parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part")
      .filter(col("status") === "F")
    val scan = pruned.queryExecution.executedPlan.toString()
    assert(scan.contains("PartitionFilters"), scan)
    assert(pruned.count() ==
      o.filter(col("o_orderstatus") === "F").count())
  }

  test("COPY TO analogue: INSERT OVERWRITE DIRECTORY writes queryable parquet") {
    // Reference: SQL `COPY ... TO` (context_checks.rs:448-494) — the
    // SQL-directed file sink. Spark's equivalent statement form.
    Tables.load(spark, sf, "region").createOrReplaceTempView("region_v")
    spark.sql(
      s"""INSERT OVERWRITE DIRECTORY '$tmp/region_copy' USING parquet
         |SELECT r_regionkey, r_name FROM region_v""".stripMargin)
    val back = spark.read.parquet(s"$tmp/region_copy")
    assert(back.count() == Tables.load(spark, sf, "region").count())
    assert(back.columns.toSeq == Seq("r_regionkey", "r_name"))
  }

  test("bucketed tables join co-located: no shuffle exchange on either side") {
    // The 100 TB co-location play: bucket both fact tables on the join key
    // at write time; the sort-merge join then reads bucket-aligned splits
    // with NO Exchange (the analogue of the reference pre-partitioning
    // stages on the join key ahead of SortMergeJoinExec).
    spark.sql("DROP TABLE IF EXISTS o_bkt")
    spark.sql("DROP TABLE IF EXISTS l_bkt")
    Tables.load(spark, sf, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode(SaveMode.Overwrite).saveAsTable("o_bkt")
    Tables.load(spark, sf, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode(SaveMode.Overwrite).saveAsTable("l_bkt")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("o_bkt").join(spark.table("l_bkt"),
        col("o_orderkey") === col("l_orderkey"))
      val p = j.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"),
        s"bucketed join still shuffles:\n$p")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS o_bkt")
      spark.sql("DROP TABLE IF EXISTS l_bkt")
    }
  }
}
