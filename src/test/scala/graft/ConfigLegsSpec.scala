package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Multi-config verification legs — the analogue of the reference's TPC-H
  * CI matrix, which re-runs the verified suite under several planner
  * configurations (static; AQE on; AQE + max_partitions_per_task=0;
  * prefer_hash_join=false — `.github/workflows/tpch.yml:30-40,135-136`).
  * Here: each flagship query must return IDENTICAL rows with AQE off,
  * broadcast disabled (all joins shuffle), and shuffled-hash-join
  * preferred, as under the default profile. Plan strategy must never
  * change results — the invariant those CI legs exist to protect.
  */
class ConfigLegsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val flagships = Seq(
    "q1_agg", "q3_topk", "q5_join6", "q18_large_orders",
    "j02_not_exists_q21", "a11_rollup", "w10_topn_per_group",
    "s05_intersect_all", "c08_deep_report", "d01_exact_dedup")

  private val legs: Seq[(String, Map[String, String])] = Seq(
    "aqe-off" -> Map("spark.sql.adaptive.enabled" -> "false"),
    "no-broadcast" -> Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"),
    "hash-join-preferred" ->
      Map("spark.sql.join.preferSortMergeJoin" -> "false"))

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

  test("reliable-checkpoint leg: d06 identical with graft.cc.checkpointDir") {
    // The d06 iteration barrier defaults to localCheckpoint (executor-
    // local, not fault-tolerant); graft.cc.checkpointDir switches it to a
    // reliable checkpoint per round. Same fixpoint either way.
    val baseline = runOnce("d06_dup_clusters")
    assert(baseline.nonEmpty)
    val dir =
      java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val got = withConfs(Map("graft.cc.checkpointDir" -> dir))(
      runOnce("d06_dup_clusters"))
    assert(got == baseline,
      s"d06 differs under reliable checkpoint (${got.size} vs ${baseline.size} rows)")
  }

  test("AQE skew-split leg: h15 identical under forced skew handling") {
    // The 100 TB skew story: AQE splits oversized shuffle partitions of
    // a sort-merge join into multiple tasks. Forcing the split (tiny
    // thresholds + forceOptimizeSkewedJoin) must not change results —
    // the invariant that makes skew handling safe to leave on.
    val baseline = runOnce("h15_join_big")
    assert(baseline.nonEmpty)
    val got = withConfs(Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true"))(
      runOnce("h15_join_big"))
    assert(got == baseline,
      s"h15 differs under skew-split leg (${got.size} vs ${baseline.size} rows)")
  }

  test("AQE skew-split leg: pair miners identical under forced skew " +
    "handling, including on a deliberately skewed corpus") {
    // The pair miners bound bucket populations structurally (d03/v03
    // band caps, d19 rarest-first prefixes), but residual bucket skew
    // still lands on single shuffle partitions — AQE's skew-join split
    // is the runtime backstop (≙ the reference's adaptive partition
    // coalescing, `coalesce_partitions.rs:17-45`). Forcing the split
    // (tiny thresholds + forceOptimizeSkewedJoin) must not change any
    // miner's rows.
    val skewConfs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    Seq("d03_minhash_lsh_pairs", "d19_prefix_filter_pairs",
      "v03_neardup_embed").foreach { name =>
      val baseline = runOnce(name)
      assert(baseline.nonEmpty, s"$name returned no rows")
      val got = withConfs(skewConfs)(runOnce(name))
      assert(got == baseline,
        s"$name differs under skew-split leg " +
          s"(${got.size} vs ${baseline.size} rows)")
    }
    // And on a corpus with REAL key skew: half the docs share one hot
    // token block (one prefix/band bucket swallows them all if the df
    // ranking fails), plus rare-token near-dup pairs that must still
    // surface. The prefix-filter join's rows must be identical with
    // the skew split forced.
    val s = spark
    import s.implicits._
    val hot = (0 until 60).map(i =>
      (i.toLong, "src", s"hot0 hot1 hot2 hot3 filler$i extra${i % 7}"))
    val dups = (0 until 5).flatMap(i => Seq(
      (1000L + 2 * i, "src", s"rare${i}a rare${i}b rare${i}c rare${i}d"),
      (1001L + 2 * i, "src", s"rare${i}a rare${i}b rare${i}c rare${i}e")))
    val docs = (hot ++ dups).toDF("doc_id", "source", "text")
    val base2 = graft.llm.Dedup.prefixFilterPairsOn(docs)
      .collect().map(_.toString).toSeq
    assert(base2.nonEmpty, "skewed-corpus miner found no pairs")
    val got2 = withConfs(skewConfs)(
      graft.llm.Dedup.prefixFilterPairsOn(docs)
        .collect().map(_.toString).toSeq)
    assert(got2 == base2,
      s"prefix-filter join differs under skew-split leg on skewed corpus " +
        s"(${got2.size} vs ${base2.size} rows)")
  }

  test("shuffle-partition sweep leg: identical rows at 16/64/256") {
    // The analogue of the reference's max_partitions_per_task CI matrix
    // (.github/workflows/tpcds.yml:76-77): results must be invariant to
    // the shuffle fan-out. Exercises hash partitioning of every
    // aggregate/join key and the window/sort exchanges across a
    // representative slice (the same order-stable flagship set the other
    // legs use).
    // v03 covers the round-6 banded+capped LSH miner: its bucket-size
    // guard counts per (band, key) and must be fan-out-invariant; d19
    // covers the prefix-filter join (its per-doc DF ranking and prefix
    // cut must not depend on how the token explode partitions).
    val slice = Seq("q1_agg", "q5_join6", "q18_large_orders",
      "w10_topn_per_group", "a11_rollup", "d03_minhash_lsh_pairs",
      "v03_neardup_embed", "d19_prefix_filter_pairs")
    slice.foreach { name =>
      val baseline = runOnce(name)
      assert(baseline.nonEmpty, s"$name returned no rows")
      Seq("16", "64", "256").foreach { np =>
        val got = withConfs(
          Map("spark.sql.shuffle.partitions" -> np))(runOnce(name))
        assert(got == baseline,
          s"$name differs at shuffle.partitions=$np " +
            s"(${got.size} vs ${baseline.size} rows)")
      }
    }
  }

  flagships.foreach { name =>
    test(s"config legs agree: $name") {
      val baseline = runOnce(name)
      assert(baseline.nonEmpty, s"$name returned no rows")
      legs.foreach { case (leg, confs) =>
        val got = withConfs(confs)(runOnce(name))
        assert(got == baseline,
          s"$name differs under leg '$leg' (${got.size} vs ${baseline.size} rows)")
      }
    }
  }
}
