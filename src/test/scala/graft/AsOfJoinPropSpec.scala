package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.operators.AsOfJoin

/** Property test for the distributed as-of join: on random keyed event
  * streams (duplicate timestamps, empty right groups, unmatched-early left
  * rows included by construction), the union+window implementation must
  * equal the brute-force per-row definition "most recent right.ts <=
  * left.ts in the same key group, ties included". The p01/p05 oracle
  * checks one fixed dataset; this pins the operator over the input space.
  */
class AsOfJoinPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private case class L(k: Long, ts: Long, lv: Long)
  private case class R(k: Long, ts: Long, rv: Long)

  /** Brute-force reference: scala-side nested loop over the same rows.
    * Tie rule (the operator's documented semantic since round 9): at
    * the winning timestamp, the GREATEST carried right tuple wins —
    * so duplicate (k, ts) right rows are fair game for the generator. */
  private def reference(ls: List[(Long, Long, Long)],
                        rs: List[(Long, Long, Long)])
      : Set[(Long, Long, Long, Option[Long])] =
    ls.map { case (k, ts, lv) =>
      val best = rs.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(r => (r._2, r._3)).lastOption
      (k, ts, lv, best.map(_._3))
    }.toSet

  /** Forward-direction brute force: EARLIEST right.ts >= left.ts, and
    * at that timestamp the greatest rv (same tie rule as backward). */
  private def referenceFwd(ls: List[(Long, Long, Long)],
                           rs: List[(Long, Long, Long)])
      : Set[(Long, Long, Long, Option[Long])] =
    ls.map { case (k, ts, lv) =>
      val cand = rs.filter(r => r._1 == k && r._2 >= ts)
      val best =
        if (cand.isEmpty) None
        else {
          val mt = cand.map(_._2).min
          Some(cand.filter(_._2 == mt).map(_._3).max)
        }
      (k, ts, lv, best)
    }.toSet

  test("as-of backward join equals brute force on random streams") {
    val s = spark
    import s.implicits._
    val genRow = for {
      k <- Gen.choose(0L, 4L)       // few keys → dense per-key activity
      ts <- Gen.choose(0L, 20L)     // small ts domain → many exact ties
      v <- Gen.choose(0L, 1000L)
    } yield (k, ts, v)
    val genCase = for {
      ls <- Gen.listOfN(40, genRow)
      rs <- Gen.listOfN(25, genRow)
    } yield (ls, rs)

    val prop = Prop.forAll(genCase) { case (ls0, rs0) =>
      // Duplicate (k, ts) right rows stay IN: the deterministic
      // greatest-tuple tie rule makes the expected value well-defined
      // without the pre-round-9 dedupe.
      val rs = rs0
      val ls = ls0.distinct
      val left = ls.toDF("k", "ts", "lv")
      val right = rs.toDF("k", "ts", "rv")
      val got = AsOfJoin.backward(left, right, "k", "ts", Seq("rv"))
        .select(col("k"), col("ts"), col("lv"), col("asof_rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      got == reference(ls, rs)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("forward as-of join equals brute force on random streams") {
    val s = spark
    import s.implicits._
    val genRow = for {
      k <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 20L)
      v <- Gen.choose(0L, 1000L)
    } yield (k, ts, v)
    val genCase = for {
      ls <- Gen.listOfN(40, genRow)
      rs <- Gen.listOfN(25, genRow)
    } yield (ls, rs)

    val prop = Prop.forAll(genCase) { case (ls0, rs0) =>
      val rs = rs0
      val ls = ls0.distinct
      val left = ls.toDF("k", "ts", "lv")
      val right = rs.toDF("k", "ts", "rv")
      val got = AsOfJoin.forward(left, right, "k", "ts", Seq("rv"))
        .select(col("k"), col("ts"), col("lv"), col("asof_rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      got == referenceFwd(ls, rs)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("nearest as-of equals brute force incl. the backward tie rule") {
    val s = spark
    import s.implicits._
    val genRow = for {
      k <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 20L)     // dense domain → many exact-tie cases
      v <- Gen.choose(0L, 1000L)
    } yield (k, ts, v)
    val genCase = for {
      ls <- Gen.listOfN(40, genRow)
      rs <- Gen.listOfN(25, genRow)
    } yield (ls, rs)

    val prop = Prop.forAll(genCase) { case (ls0, rs0) =>
      val rs = rs0
      val ls = ls0.distinct
      val left = ls.toDF("k", "ts", "lv")
      val right = rs.toDF("k", "ts", "rv")
      val got = AsOfJoin.nearest(left, right, "k", "ts", Seq("rv"))
        .select(col("k"), col("ts"), col("lv"), col("asof_rv"),
          col("asof_dir_back"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toSet
      // Brute force: closest |r.ts - ts| in the key group, equidistant
      // tie → backward (the earlier right row); same-(k, ts) ties →
      // greatest rv, both directions.
      val expected = ls.map { case (k, ts, lv) =>
        val back = rs.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(r => (r._2, r._3)).lastOption
        val fwd = {
          val cand = rs.filter(r => r._1 == k && r._2 >= ts)
          if (cand.isEmpty) None
          else {
            val mt = cand.map(_._2).min
            Some((k, mt, cand.filter(_._2 == mt).map(_._3).max))
          }
        }
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (ts - b._2 <= f._2 - ts) Some((b._3, 1L))
            else Some((f._3, 0L))
          case (Some(b), None) => Some((b._3, 1L))
          case (None, Some(f)) => Some((f._3, 0L))
          case _ => None
        }
        (k, ts, lv, pick.map(_._1), pick.map(_._2))
      }.toSet
      got == expected
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("tolerance-bounded as-of equals brute force incl. truncation rule") {
    val s = spark
    import s.implicits._
    val genRow = for {
      k <- Gen.choose(0L, 4L)
      ts <- Gen.choose(0L, 200L)    // wide enough that tolerance bites
      v <- Gen.choose(0L, 1000L)
    } yield (k, ts, v)
    val genCase = for {
      ls <- Gen.listOfN(40, genRow)
      rs <- Gen.listOfN(25, genRow)
      tol <- Gen.choose(0L, 8L)     // tolerance in TRUNCATED (div 10) units
    } yield (ls, rs, tol)

    val prop = Prop.forAll(genCase) { case (ls0, rs0, tol) =>
      val rs = rs0
      val ls = ls0.distinct
      val left = ls.toDF("k", "ts", "lv")
      val right = rs.toDF("k", "ts", "rv")
      val got = AsOfJoin
        .backwardWithin(left, right, "k", "ts", Seq("rv"),
          tolerance = tol, truncateTo = 10L)
        .select(col("k"), col("ts"), col("lv"), col("asof_rv"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      // Reference: the MATCH is still the plain backward as-of (the bound
      // nulls stale matches, it never promotes an older row), and the
      // keep test truncates FIRST: ts div 10 - rts div 10 <= tol.
      val expected = reference(ls, rs).map { case (k, ts, lv, best) =>
        val keep = best.isDefined && {
          val rts = rs.filter(r => r._1 == k && r._2 <= ts)
            .map(_._2).maxOption.get
          ts / 10 - rts / 10 <= tol
        }
        (k, ts, lv, if (keep) best else None)
      }
      got == expected
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("non-orderable carried columns (map) execute; orderable ones still break ties") {
    val s = spark
    import s.implicits._
    // A map column can't join a window ORDER BY — the tie struct must
    // exclude it (and only it) instead of failing analysis.
    val left = Seq((1L, 10L, 7L)).toDF("k", "ts", "lv")
    val right = Seq((1L, 5L, 100L, "a"), (1L, 5L, 200L, "b"))
      .toDF("k", "ts", "rv", "tag")
      .withColumn("attrs", map(col("tag"), col("rv")))
    val out = AsOfJoin.backward(left, right, "k", "ts",
      Seq("rv", "attrs")).collect()
    assert(out.length == 1)
    val row = out.head
    // rv is orderable → deterministic greatest-tuple pick (200), and
    // the matched map rides along with it.
    assert(row.getAs[Long]("asof_rv") == 200L)
    assert(row.getAs[Map[String, Long]]("asof_attrs") == Map("b" -> 200L))
  }
}
