package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Plan-stability / plan-shape suite — the Spark analogue of the
  * reference's frozen staged plans
  * (`ballista/scheduler/tests/tpch_plan_stability/approved/q1-22.txt`):
  * rather than byte-identical plan text (Spark plan strings carry unstable
  * expression ids), we pin the structural properties those goldens protect:
  * join strategy choice, pushdown, top-k fusion, codegen, and the absence
  * of scale-killers (CartesianProduct, all-pairs joins).
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = GraftSession.builder(4, 4).appName("graft-test").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.tune(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString()
  }

  /** Final AQE plan after actually running the query (collect executes the
    * df's own QueryExecution, so AdaptiveSparkPlanExec reaches isFinalPlan). */
  private def ranPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
  }

  test("q5: dimension joins broadcast, filters reach the parquet scan") {
    val p = plan("q5_join6")
    assert(p.contains("BroadcastHashJoin"),
      s"expected dimension broadcast join in:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(r_name), EqualTo(r_name,ASIA)]")
      || p.contains("EqualTo(r_name,ASIA)"),
      s"region filter not pushed to scan:\n$p")
  }

  test("q1: partial aggregation before the shuffle (two-phase agg)") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q3: TopK fuses into TakeOrderedAndProject") {
    val p = plan("q3_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q6: selective filters pushed, scan prunes columns") {
    val p = plan("q6_filter_agg")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate"), p)
    // projection pruning: scan must not read l_orderkey
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At 100 TB the probe-side scan volume of a selective fact-dim
    // shuffle join is the cost driver; Spark's runtime row-level filter
    // injects a bloom_filter_agg on the (small, filtered) build side and
    // a might_contain predicate on the probe scan — the runtime-filter
    // analogue of the reference's stats-driven planning. Pin that the
    // injection fires when enabled.
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val l = Tables.load(spark, sf, "lineitem")
      val o = Tables.load(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val df = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val p = df.queryExecution.optimizedPlan.toString().toLowerCase
      assert(p.contains("bloom"),
        s"runtime bloom filter not injected:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("no CartesianProduct anywhere in the inventory") {
    SparkEntry.queries.keys.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name has a CartesianProduct:\n$p")
    }
  }

  test("w10: top-N-per-group plans WindowGroupLimit") {
    val p = plan("w10_topn_per_group")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("j08: pure non-equi join becomes BroadcastNestedLoopJoin") {
    val p = plan("j08_theta_nlj")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("whole-stage codegen active on the q1 hot path") {
    // AQE only renders codegen spans in the final (executed) plan; simple
    // mode marks each WholeStageCodegen span as "*(n) ".
    val p = ranPlan("q1_agg")
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(p).isDefined,
      s"aggregation not inside a WholeStageCodegen span:\n$p")
    assert("""\*\(\d+\) Filter""".r.findFirstIn(p).isDefined,
      s"filter not inside a WholeStageCodegen span:\n$p")
  }

  test("sort-merge join engages for fact-fact joins (reference default)") {
    // orders x lineitem with broadcast disabled — the Ballista SMJ default
    // (tpch_plan_stability/README.md:33).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = Tables.load(spark, sf, "orders")
      val l = Tables.load(spark, sf, "lineitem")
      val p = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).count()
        .queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("h11: small-side join broadcasts supplier") {
    val p = plan("h11_join_small")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("h15: large-large join at scale is a sort-merge join") {
    // At the bench SF neither side of lineitem x orders broadcasts; pin
    // the SMJ shape with the threshold off (as the reference's default).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = plan("h15_join_big")
      assert(p.contains("SortMergeJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hash join engages on opt-in (reference prefer_hash_join analogue)") {
    // The reference's opt-in hash join (`datafusion.optimizer.
    // prefer_hash_join` + `ballista.hash_join.max_build_partition_bytes`,
    // core/src/config.rs:119) maps to Spark's SHUFFLE_HASH hint /
    // preferSortMergeJoin=false. Same rows as the SMJ default.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = Tables.load(spark, sf, "orders")
      val l = Tables.load(spark, sf, "lineitem")
      val hj = o.hint("SHUFFLE_HASH")
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val p = hj.queryExecution.executedPlan.toString()
      assert(p.contains("ShuffledHashJoin"), p)
      val smj = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      assert(hj.orderBy(col("o_orderpriority")).collect().toSeq ==
        smj.orderBy(col("o_orderpriority")).collect().toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("d03: token-set re-attach is stats-driven, never a forced broadcast") {
    // The tset side of the d03 re-attach join is corpus-sized (one row per
    // document) — a hard-coded broadcast() of it is the one thing that
    // kills a 1000-executor run (the r2 verdict's scale flaw). A forced
    // hint survives autoBroadcastJoinThreshold=-1; a stats-driven promotion
    // does not. So: with both static and adaptive thresholds off, the d03
    // plan must contain NO broadcast join at all — proving every broadcast
    // seen at test scale comes from size stats (the reference's
    // planner.rs:313-350 stats-driven decision), not from a hint.
    val prevS = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = scala.util.Try(
      spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.filter(_ != null)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = ranPlan("d03_minhash_lsh_pairs")
      assert(!p.contains("BroadcastHashJoin") &&
        !p.contains("BroadcastExchange"),
        s"d03 still forces a corpus-size broadcast:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevS)
      prevA match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("ingest probes aggregate no corpus band rows: the BandCap rule " +
    "rides the artifacts' build-time pop column (round-13)") {
    // The round-12 finding: capBuckets recomputed bucket populations
    // with a groupBy over the FULL corpus band table on every probe —
    // an O(corpus) aggregate inside paths whose contract is "work ∝
    // batch". The fix materializes pop into the index artifacts, so a
    // probe plan may aggregate bucket-grain pops scans (3-col
    // band/mh/pop schema) but NEVER corpus band rows (the 4-col
    // db/band/mh/pop table). Walk the physical plans: every aggregate
    // keyed on the band bucket must have only pops-shaped leaves.
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // d43 probes the COMPACTED artifact: single segment again, so the
    // cap must be back to the pushed-filter-only form — that plan-shape
    // recovery is what compaction buys, so it's pinned here too.
    for (q <- Seq("d21_indexed_ingest", "d23_index_delta_append",
        "d43_index_compaction", "d33_serving_pipeline")) {
      // sparkPlan, not executedPlan: the AQE wrapper's collect() does
      // not traverse into its current physical plan, and the pre-AQE
      // tree is the one whose shape this pin freezes anyway.
      val exec = SparkEntry.queries(q)(spark, sf)
        .queryExecution.sparkPlan
      val offending = exec.collect {
        case a: BaseAggregateExec
            if a.groupingExpressions.size == 2 &&
              a.groupingExpressions.flatMap(_.references)
                .map(_.name.stripSuffix("b")).toSet == Set("band", "mh") &&
              a.collectLeaves().exists {
                case f: FileSourceScanExec =>
                  f.output.map(_.name).contains("db") // band ROWS, not pops
                case _ => false
              } => a
      }
      assert(offending.isEmpty,
        s"$q: bucket-grain aggregate over corpus band rows (the probe " +
          s"re-counts populations the artifact already stores):\n" +
          offending.mkString("\n"))
      // And the cap must actually reach the band scans as a pushed
      // parquet filter — the artifact's pop column doing its job.
      val scans = exec.collectLeaves().collect {
        case f: FileSourceScanExec
            if f.output.map(_.name).toSet
              .intersect(Set("db", "pop")).size == 2 => f
      }
      assert(scans.nonEmpty, s"$q: no band-artifact scan found")
      scans.foreach { f =>
        assert(f.dataFilters.exists(_.toString.contains("<= 256")),
          s"$q: band scan without the pushed pop<=256 cap:\n$f")
      }
    }
  }

  test("SELECT without FROM executes as a one-row plan") {
    // Reference: test_empty_exec_with_one_row (EmptyExec producing a
    // single row) — Spark's OneRowRelation.
    val r = spark.sql("SELECT 1 AS one, 2 + 3 AS five, 'x' AS s").collect()
    assert(r.length == 1 && r(0).getInt(0) == 1 && r(0).getInt(1) == 5 &&
      r(0).getString(2) == "x")
  }

  test("AQE is enabled on the session profile") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    val p = ranPlan("q5_join6")
    assert(p.contains("AdaptiveSparkPlan") || p.contains("AQEShuffleRead"), p)
  }
}
