package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.functions.KllState

/** KLL-style quantile sketch (graft.functions.{KllState, KllQuantile}) —
  * exact-regime equality, compaction-regime rank-error bound, and the
  * distributed partial/merge path through a real shuffle.
  */
class QuantileSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("exact regime: sketch quantile == exact quantile below capacity") {
    val st = new KllState(1024)
    val values = (1 to 1000).map(_.toDouble)
    scala.util.Random.shuffle(values).foreach(st.insert)
    assert(st.quantile(0.5) == 500.0)
    assert(st.quantile(0.9) == 900.0)
    assert(st.quantile(1.0) == 1000.0)
  }

  test("serialize/deserialize roundtrip preserves quantiles") {
    val st = new KllState(256)
    (1 to 200).foreach(i => st.insert(i.toDouble))
    val back = KllState.deserialize(st.serialize())
    assert(back.quantile(0.5) == st.quantile(0.5))
    assert(back.totalItems == st.totalItems)
  }

  test("compaction regime: rank error stays within 5% at 40x capacity") {
    val cap = 512
    val n = cap * 40
    val st = new KllState(cap)
    // adversarial-ish order: interleaved halves
    (0 until n / 2).foreach { i =>
      st.insert(i.toDouble)
      st.insert((n - 1 - i).toDouble)
    }
    assert(st.totalItems <= cap + 1, s"state kept ${st.totalItems} items")
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val est = st.quantile(q)
      val rankErr = math.abs(est / n - q)
      assert(rankErr < 0.05, s"q=$q est=$est rank error $rankErr")
    }
  }

  test("merge terminates on adversarial tiny-capacity sequences (hang regression)") {
    // Regression: compact() used to no-op (first level <2 items) while
    // merge's shrink loop condition stayed true — ~5% of random
    // insert/merge sequences at capacity 4-64 hung. compact() now targets
    // the fullest level and reports no-progress, which shrink treats as
    // stop.
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { _ =>
      val cap = 4 + rnd.nextInt(60)
      val a = new KllState(cap)
      val b = new KllState(cap)
      (0 until rnd.nextInt(300)).foreach(_ => a.insert(rnd.nextDouble()))
      (0 until rnd.nextInt(300)).foreach(_ => b.insert(rnd.nextDouble()))
      a.merge(b)
      a.merge(KllState.deserialize(a.serialize()))
      assert(a.totalItems <= math.max(cap, a.levels.length) + cap,
        s"state ballooned: ${a.totalItems} items at capacity $cap")
    }
  }

  test("batch quantiles() equals per-call quantile() in both regimes") {
    val rnd = new scala.util.Random(7)
    val qs = (1 until 32).map(_ / 32.0) ++ Seq(0.0, 1.0, 0.999)
    // exact regime (no compaction) and compacted regime
    for (cap <- Seq(1 << 16, 64)) {
      val st = new KllState(cap)
      (0 until 5000).foreach(_ => st.insert(rnd.nextInt(1000).toDouble))
      val batch = st.quantiles(qs)
      qs.zip(batch).foreach { case (q, b) =>
        assert(st.quantile(q) == b, s"cap=$cap q=$q")
      }
    }
    // empty sketch: NaN for every q, same as quantile()
    assert(new KllState(64).quantiles(Seq(0.5)).head.isNaN)
  }

  test("distributed partial/merge across a shuffle stays exact under capacity") {
    val df = spark.range(0, 5000, 1, 8) // 8 partitions -> 8 partial sketches
      .select((col("id") % 100).as("g"), col("id").cast("double").as("v"))
    val got = df.groupBy(col("g"))
      .agg(expr("kll_quantile(v, 0.5)").as("q50"))
      .orderBy(col("g")).collect()
    // group g holds {g, g+100, ..., g+4900}: 50 values; disc median is the
    // 25th smallest = g + 24*100.
    got.foreach { r =>
      val g = r.getLong(0)
      assert(r.getDouble(1) == g + 2400.0, r.toString)
    }
  }
}
