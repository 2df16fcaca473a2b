package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.ArrowIpcSource

/** Arrow IPC source — the reference reads `.arrow` listing tables
  * (`context_checks.rs:1319`); roundtrip + query-over-arrow checks. */
class ArrowIpcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var tmp: String = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
    tmp = Files.createTempDirectory("graft-arrow").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("arrow write-read roundtrip preserves values, types, and nulls") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, 10, 1.5, "alpha", true),
      (2L, 20, -2.5, "beta", false),
      (3L, 30, 0.0, "gamma", true)
    ).toDF("id", "n", "x", "name", "flag")
      .withColumn("maybe", when(col("id") === 2, col("name")))
    ArrowIpcSource.write(df, s"$tmp/t1.arrow")
    val back = ArrowIpcSource.read(spark, s"$tmp/t1.arrow")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(3) == "alpha")
    assert(rows(0).isNullAt(5) && !rows(1).isNullAt(5))
    assert(rows(1).getString(5) == "beta")
  }

  test("arrow file participates in SQL joins like any table") {
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .select(col("n_nationkey").cast("long").as("nk"), col("n_name"))
    ArrowIpcSource.write(nation, s"$tmp/nation.arrow")
    val arrowNation = ArrowIpcSource.read(spark, s"$tmp/nation.arrow")
    val joined = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .join(arrowNation, col("c_nationkey") === col("nk"))
      .groupBy(col("n_name")).count()
    assert(joined.count() > 0)
  }

  test("distributed writer: one file per partition, batched, dir roundtrip") {
    val s = spark; import s.implicits._
    val df = (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(4)
    val dir = s"$tmp/dist"
    // batchSize 256 → ~10 record batches per file: exercises the
    // bounded-batch loop, not just one writeBatch.
    ArrowIpcSource.writeDir(df, dir, batchSize = 256)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".arrow"))
    assert(files.length == 4, s"expected 4 part files, got ${files.length}")
    val back = ArrowIpcSource.read(spark, dir)
    assert(back.count() == 10000)
    assert(back.agg(sum(col("k"))).head.getLong(0) == 50005000L)
  }

  test("date/decimal/array columns roundtrip (Date32, Decimal128, List)") {
    val s = spark; import s.implicits._
    val df = Seq(
      (1L, "2024-03-01", "12.34", Seq(1.5f, -2.5f), Seq("a", "b")),
      (2L, "1969-12-31", "-0.07", Seq.empty[Float], Seq("c")),
      (3L, "2001-09-09", "99999.99", Seq(0.0f), Seq.empty[String])
    ).toDF("id", "d", "m", "vec", "tags")
      .withColumn("d", to_date(col("d")))
      .withColumn("m", col("m").cast("decimal(12,2)"))
      // null date / null decimal / null array all on row 2
      .withColumn("d", when(col("id") === 2, lit(null)).otherwise(col("d")))
      .withColumn("m", when(col("id") === 2, lit(null)).otherwise(col("m")))
      .withColumn("vec", when(col("id") === 2, lit(null)).otherwise(col("vec")))
    ArrowIpcSource.write(df, s"$tmp/typed.arrow")
    val back = ArrowIpcSource.read(spark, s"$tmp/typed.arrow")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getDate(1).toString == "2024-03-01")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2) && rows(1).isNullAt(3))
    assert(rows(0).getDecimal(2).compareTo(new java.math.BigDecimal("12.34")) == 0)
    assert(rows(2).getDecimal(2).compareTo(new java.math.BigDecimal("99999.99")) == 0)
    assert(rows(0).getSeq[Float](3) == Seq(1.5f, -2.5f))
    assert(rows(2).getSeq[Float](3) == Seq(0.0f))
    assert(rows(0).getSeq[String](4) == Seq("a", "b"))
    assert(rows(2).getSeq[String](4) == Seq.empty[String])
    // the arrow table still queries like any table (rows 1 and 3 pass
    // the date filter; row 2's null date is excluded)
    assert(ArrowIpcSource.read(spark, s"$tmp/typed.arrow")
      .filter(col("d") > lit("2000-01-01"))
      .agg(sum(col("m")).as("t")).head
      .getDecimal(0).compareTo(new java.math.BigDecimal("100012.33")) == 0)
  }

  test("directory of arrow files reads as one table") {
    val s = spark; import s.implicits._
    val dir = Files.createDirectory(
      java.nio.file.Paths.get(s"$tmp/multi")).toString
    ArrowIpcSource.write(Seq((1L, "a")).toDF("k", "v"), s"$dir/p0.arrow")
    ArrowIpcSource.write(Seq((2L, "b")).toDF("k", "v"), s"$dir/p1.arrow")
    val back = ArrowIpcSource.read(spark, dir)
    assert(back.count() == 2)
    assert(back.orderBy("k").collect().map(_.getString(1)).toSeq ==
      Seq("a", "b"))
  }
}
