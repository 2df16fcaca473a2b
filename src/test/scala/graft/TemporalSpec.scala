package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Invariants of the gap-fill (p16) and bounded-EWMA (p17) operators
  * that the oracle's value-hash can't articulate: grid completeness,
  * interpolation bracketing, exact-hit collapse, and EWMA's
  * fixed-point/bounds behavior. All run on the sf0.001 corpus through
  * the graded query functions, so they pin the shipped plan.
  */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val hourUs = 3600L * 1000 * 1000

  test("p16: one grid row per user-hour across the user's span") {
    val out = graft.queries.Temporal.queries("p16_gap_fill")(spark, sf)
      .cache()
    val spans = Tables.load(spark, sf, "events")
      .filter(col("user_id") < 10)
      .withColumn("h", expr(s"(ts div 1000) div $hourUs"))
      .groupBy(col("user_id"))
      .agg((max(col("h")) - min(col("h")) + 1).as("n_hours"))
    val counts = out.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"))
    val bad = spans.join(counts, "user_id")
      .filter(col("n_hours") =!= col("n_rows")).count()
    assert(bad == 0, s"$bad users with grid-row count != hour-span")
    // Grid points are distinct and hour-aligned.
    assert(out.filter(col("t_us") % hourUs =!= 0).count() == 0)
    assert(out.count() == out.select(col("user_id"), col("t_us"))
      .distinct().count())
  }

  test("p16: interp is bracketed by neighbors; exact-hit collapses to locf") {
    val out = graft.queries.Temporal.queries("p16_gap_fill")(spark, sf)
      .cache()
    val ev = Tables.load(spark, sf, "events")
      .filter(col("user_id") < 10)
      .select(col("user_id"), expr("ts div 1000").as("t_us"),
        col("value"))
    // A grid point landing exactly on an event takes that event's value
    // for BOTH locf and interp (zero-gap collapse).
    val hits = out.join(ev, Seq("user_id", "t_us"))
    val badHit = hits.filter(
      abs(col("locf") - col("value")) > 1e-9 ||
        abs(col("interp") - col("value")) > 1e-9).count()
    assert(badHit == 0, s"$badHit exact-hit grid points off the event value")
    // interp (when present) lies within [min, max] of the user's values.
    val bounds = ev.groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val badBr = out.filter(col("interp").isNotNull).join(bounds, "user_id")
      .filter(col("interp") < col("lo") - 1e-9 ||
        col("interp") > col("hi") + 1e-9).count()
    assert(badBr == 0, s"$badBr interpolated values outside the value range")
  }

  test("p17: constant series is a fixed point; n_terms saturates at 16") {
    val out = graft.queries.Temporal.queries("p17_ewma")(spark, sf).cache()
    assert(out.filter(col("n_terms") > 16).count() == 0)
    // EWMA is a convex combination: bracketed by each user's min/max.
    val ev = Tables.load(spark, sf, "events").filter(col("user_id") < 40)
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val bad = out.join(ev, "user_id")
      .filter(col("ewma") < col("lo") - 1e-9 ||
        col("ewma") > col("hi") + 1e-9).count()
    assert(bad == 0, s"$bad EWMA values outside the convex hull")
    // Synthetic fixed point: constant input => ewma == the constant.
    val s2 = spark
    import s2.implicits._
    val const = Seq.tabulate(40)(i => (1L, i.toLong, 7.25))
      .toDF("user_id", "event_id", "value")
      .withColumn("ts", col("event_id") * 1000000000L)
    // Reuse the graded arithmetic by writing a mini corpus to parquet.
    val tmp = java.nio.file.Files.createTempDirectory("p17fx").toFile
    try {
      Tables.load(spark, sf, "events").limit(0)
        .unionByName(const.select(
          col("event_id"), col("ts"), col("user_id"),
          lit("click").as("event_type"), col("value"),
          lit("{}").as("props")))
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val fx = graft.queries.Temporal.queries("p17_ewma")(spark, tmp.getPath)
      val off = fx.filter(abs(col("ewma") - 7.25) > 1e-12).count()
      assert(off == 0, s"$off rows where constant-series EWMA drifts")
    } finally {
      def rec(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
        f.delete()
      }
      rec(tmp)
    }
  }
}
