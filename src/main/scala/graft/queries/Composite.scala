package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dx._

/** TPC-DS-class composite shapes — the reference's TPC-DS corpus leans on
  * channel-union + ROLLUP reports (q5/q77/q80), windowed top-k over joined
  * aggregates (q67), EXISTS/NOT-EXISTS chains (q10/q35), channel-INTERSECT
  * item restriction (q14), cumulative window-over-union comparison (q51),
  * deep multi-join year-over-year reports (q64), HAVING-frequent ×
  * scalar-threshold (q23), HAVING-band join-back (q34/q73), LEFT-join
  * channel ratios (q78), sales-netted-against-returns self-joins (q93),
  * per-channel sales-vs-returns ROLLUP profit reports (q77/q80),
  * multi-supplier-order two-IN chains (q95), cross-channel
  * tolerance-equality reports (q58), weekly day-of-week pivot
  * year-over-year ratios (q2/q59), channel-overlap FULL-OUTER counts
  * (q97), per-customer cross-channel growth comparison (q4/q11),
  * IN-restricted channel-union totals (q33/q56/q60), INTERSECT/EXCEPT
  * retention counts (q38/q87), buy-return-resell funnels (q17/q29),
  * rank-within-ROLLUP-parent margin reports (q36), and 12-month pivot
  * warehouse reports (q66)
  * (`benchmarks/queries-tpcds/`). Re-expressed on the synthetic schema,
  * each combining several §2B rows in one plan.
  */
object Composite {

  private def ts(s: String) = lit(s).cast("timestamp")

  /** One-time ORDERKEY-BUCKETED copies of the two fact tables — c28's
    * co-location artifact (the write-side half of the "bucketed tables
    * join with zero Exchange" plan test in SourcesSpec). 32 buckets to
    * match the session shuffle parallelism at the graded SF; in
    * production the count scales with data (≈ table bytes / 256 MB
    * target splits — both tables MUST agree) and the plan shape is
    * invariant to it. Both sides bucket+sort on the join key, so every
    * lineitem ⋈ orders pass reads bucket-aligned pre-sorted splits. Session-catalog tables (in-memory metastore):
    * built once per session per sfDir, reused by warmup and measured
    * passes alike. */
  private def ensureBucketedFacts(s: SparkSession,
                                  dir: String): (DataFrame, DataFrame) = {
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    (CatalogPublish.bucketed(s, s"graft_l_bkt_$key",
      new java.io.File(s"$dir/lineitem.parquet"), "graft_l_bkt",
      Tables.load(s, dir, "lineitem"), 32, "l_orderkey"),
      CatalogPublish.bucketed(s, s"graft_o_bkt_$key",
        new java.io.File(s"$dir/orders.parquet"), "graft_o_bkt",
        Tables.load(s, dir, "orders"), 32, "o_orderkey"))
  }

  /** REBUCKETING compaction (round 16) — the lifecycle fix for the
    * bucketed warehouse's one frozen constant: c28's sf10 ratio (3.3×
    * for 10× data) is per-bucket split growth with the bucket count
    * pinned at 32 while data grew 100× — the exact argument d43/v19b
    * settled for the text/ANN indexes, at the warehouse grain. The
    * production answer is not "re-ingest the corpus at 128 buckets"
    * but an ARTIFACT-to-ARTIFACT rewrite: read the existing 32-bucket
    * tables (never the raw corpus) and re-bucket 32 → 128 — each
    * table pays exactly ONE shuffle (the repartition that IS the
    * re-bucketing) plus a bucket-aligned write, and every downstream
    * exchange-free join/window/pruning shape survives unchanged on
    * the new count (both facts re-bucket together — the co-location
    * contract says the counts MUST agree). Cached under its own
    * family key, so the 32- and 128-bucket warehouses coexist and the
    * graded c28/c30/c31 rows keep their original layout. */
  private def ensureRebucketedFacts(s: SparkSession,
                                    dir: String): (DataFrame, DataFrame) = {
    val (l32, o32) = ensureBucketedFacts(s, dir)
    val key = dir.replaceAll("[^A-Za-z0-9]", "_")
    (CatalogPublish.bucketed(s, s"graft_l_bkt128_$key",
      new java.io.File(s"$dir/lineitem.parquet"), "graft_l_bkt128",
      l32, 128, "l_orderkey"),
      CatalogPublish.bucketed(s, s"graft_o_bkt128_$key",
        new java.io.File(s"$dir/orders.parquet"), "graft_o_bkt128",
        o32, 128, "o_orderkey"))
  }

  /** c28's report body over an explicit bucketed (lineitem, orders)
    * pair — factored (round 16) so the 32-bucket graded row and the
    * re-bucketed 128-bucket row run the IDENTICAL plan over the two
    * layouts; same rows as c09 (bucketing is physical, not
    * semantics). */
  private def colocFrequentBest(l: DataFrame, o: DataFrame): DataFrame = {
    val lo = l.hint("merge").join(o, col("l_orderkey") === col("o_orderkey"))
    val freq = lo.filter(year(col("o_orderdate")) === 1996)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 4).select(col("l_partkey"))
    val spend = lo.groupBy(col("o_custkey"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
        .as("spend"))
    val thresh = spend
      .agg((max(col("spend")).cast("double") / 2).as("half_max"))
    val best = spend.crossJoin(thresh)
      .filter(col("spend").cast("double") > col("half_max"))
      .select(col("o_custkey"))
    lo.filter(year(col("o_orderdate")) === 1997)
      .join(freq, Seq("l_partkey"), "left_semi")
      .join(best, Seq("o_custkey"), "left_semi")
      .groupBy(month(col("o_orderdate")).cast("long").as("mth"))
      .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("rev"),
        count(lit(1)).as("n"))
      .orderBy(col("mth"))
  }

  /** c30's exchange-free window body over an explicit bucketed
    * lineitem (see [[colocFrequentBest]]'s factoring rationale). */
  private def colocWindow(l: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val uPre = org.apache.spark.sql.expressions.Window.unboundedPreceding
    l.filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
      .withColumn("line_seq", row_number().over(w).cast("long"))
      .withColumn("run_amount",
        sum(dec(col("l_extendedprice"))).over(w.rowsBetween(uPre, 0))
          .cast("double"))
      .select(col("l_orderkey"), col("l_linenumber"), col("line_seq"),
        col("run_amount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** c31's bucket-pruned point lookup over an explicit bucketed
    * lineitem (see [[colocFrequentBest]]'s factoring rationale). */
  private def bucketLookup(l: DataFrame): DataFrame =
    l.filter(col("l_orderkey").isin(1L, 7L, 33L, 129L))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_orderkey"))

  /** 2-d bit-interleave of two [[zorderNormalized]] 10-bit keys — the
    * Z-value every real `OPTIMIZE ... ZORDER BY` computes (shared by
    * c29's exact-ntile layout and c29b's sketch-cut layout). */
  private def zval(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 10).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(1), 2 * i + 1) +
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(1), 2 * i)
    }.reduce(_ + _)

  /** lineitem keys range-normalized to a common 10-bit space from column
    * min/max stats (one tiny scalar agg — production reads these from
    * file footers): the step every real Z-ORDER implementation performs,
    * and load-bearing — raw interleave lets the wider key's high bits
    * dominate and degenerates to a 1-d sort (see c29's rationale). */
  private def zorderNormalized(s: SparkSession, dir: String,
      rowFilter: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    val l0full = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    // Optional deterministic row subset (c29c): the filter applies
    // BEFORE the stats pass, so the sampled audit is self-contained —
    // normalization, tile boundaries and bounding boxes all derive
    // from the sampled sub-corpus, exactly as the DuckDB twin does.
    // Round 17 (StageProfile): the coined scan is persisted — the
    // stats aggregate AND the normalization branch both sit below the
    // audit's persist point, so the per-row md5 coin ran twice
    // (2 × ~1 s scan stages, the two heaviest of c29c's plan). Four
    // ints per sampled row; only the sampled path pays the persist
    // (c29's unfiltered stats re-scan carries no per-row md5).
    val l0 = rowFilter.map(f => l0full.filter(f)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .getOrElse(l0full)
    val stats = l0.agg(min(col("l_partkey")).as("pkmn"),
      max(col("l_partkey")).as("pkmx"),
      min(col("l_suppkey")).as("skmn"),
      max(col("l_suppkey")).as("skmx"))
    l0.crossJoin(broadcast(stats))
      .withColumn("npk", expr(
        "CASE WHEN pkmx = pkmn THEN CAST(0 AS BIGINT)" +
          " ELSE ((l_partkey - pkmn) * 1023) div (pkmx - pkmn) END"))
      .withColumn("nsk", expr(
        "CASE WHEN skmx = skmn THEN CAST(0 AS BIGINT)" +
          " ELSE ((l_suppkey - skmn) * 1023) div (skmx - skmn) END"))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("npk"), col("nsk"))
  }

  /** c29's exact two-grain ntile layout audit over an explicit
    * normalized frame — factored (round 16) so the full-corpus audit
    * row (c29) and the md5-sampled bounded row (c29c) run the
    * IDENTICAL prefix-sum machinery; only the input frame differs. */
  private def zorderExactAudit(lIn: DataFrame): DataFrame = {
    // Persist the normalized frame (round 16, the c29b discipline
    // applied to the exact legs): it feeds FOUR subtrees — two legs ×
    // (bucket-cut aggregate + the keyed window join) — and unpersisted
    // it re-ran the scan + stats broadcast + normalization (and c29c's
    // per-row md5 coin) once per subtree; StageProfile showed four
    // near-identical low-parallelism stages doing exactly that. Six
    // ints per row, Bench/Verify clearCache lifecycle.
    // The spread applies on the EXACT-audit path only (not in
    // zorderNormalized): c29b aggregates a capacity-2^20 kll_sketch per
    // input partition, and spreading its 1-3 scan partitions to 32
    // multiplied the partial-sketch serialization 10× (isolated re-run
    // measured 4.2 → 8.8 s — caught and reverted this round). Here the
    // per-row work (c29c's md5 coin, normalization CASEs, the window
    // md5s) is what must parallelize, and the partial state per task is
    // bounded aggregate rows, not megabyte sketches.
    val l = lIn
      .repartition(lIn.sparkSession.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uPre = org.apache.spark.sql.expressions.Window.unboundedPreceding
    val uFol = org.apache.spark.sql.expressions.Window.unboundedFollowing
    def leg(name: String, key: org.apache.spark.sql.Column,
            bucketShift: Int): DataFrame = {
      // Coarse bucket = high bits of the sort key: order-compatible
      // with the total order, bounded count, so the only global
      // window runs over bucket TOTALS, not rows.
      val keyed = l.withColumn("k", key)
        .withColumn("bucket", shiftrightunsigned(col("k"), bucketShift))
      val wCut = org.apache.spark.sql.expressions.Window
        .orderBy(col("bucket"))
      val cuts = keyed.groupBy(col("bucket"))
        .agg(count(lit(1)).as("bn"))
        .withColumn("cum_before",
          coalesce(sum(col("bn")).over(wCut.rowsBetween(uPre, -1)),
            lit(0L)))
        .withColumn("total", sum(col("bn")).over(wCut.rowsBetween(uPre, uFol)))
        .select(col("bucket"), col("cum_before"), col("total"))
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket"))
        .orderBy(col("k"), col("l_orderkey"), col("l_linenumber"))
      // Exact ntile(32) boundaries from (rn, total): the first
      // total%32 tiles carry one extra row.
      keyed.join(broadcast(cuts), "bucket")
        .withColumn("rn", col("cum_before") + row_number().over(wIn))
        .withColumn("base", expr("total div 32"))
        .withColumn("rem", col("total") % 32)
        .withColumn("cutoff", col("rem") * (col("base") + 1))
        .withColumn("f", expr(
          "CAST(CASE WHEN rn <= cutoff THEN (rn - 1) div (base + 1) + 1" +
            " ELSE rem + (rn - cutoff - 1) div base + 1 END AS BIGINT)"))
        .groupBy(col("f"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"),
          max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"),
          max(col("l_suppkey")).as("sk_max"))
        .withColumn("layout", lit(name))
        // Dx rule: exact DECIMAL product (≙ HUGEINT), one closing
        // double cast. At the sf10 leg a file's span on each key
        // reaches ~1e11, so a long product overflows 2^63 and ANSI
        // mode throws — the bounding-box product must be
        // overflow-proof at any scale; both engines round the same
        // exact integer to the same double.
        .withColumn("span_product", expr(
          "CAST(CAST(pk_max - pk_min AS DECIMAL(19,0))" +
            " * CAST(sk_max - sk_min AS DECIMAL(19,0)) AS DOUBLE)"))
    }
    leg("pk_sort", col("l_partkey"), 8)
      .unionByName(leg("zorder", zval(col("npk"), col("nsk")), 13))
      .select(col("layout"), col("f"), col("n_rows"),
        col("pk_min"), col("pk_max"), col("sk_min"), col("sk_max"),
        col("span_product"))
      .orderBy(col("layout"), col("f"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_channel_rollup" -> { (s, dir) =>
      // Channel union -> dimension joins -> ROLLUP report (q5 shape).
      val l = Tables.load(s, dir, "lineitem")
      def channel(from: String, to: String, name: String): DataFrame =
        l.filter(col("l_shipdate") >= ts(from) && col("l_shipdate") < ts(to))
          .select(col("l_orderkey"),
            discounted(col("l_extendedprice"), col("l_discount")).as("rev"),
            lit(name).as("channel"))
      val sales = channel("1996-01-01", "1997-01-01", "y1996")
        .unionByName(channel("1997-01-01", "1998-01-01", "y1997"))
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      sales.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("channel"))
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_sales"),
          grouping(col("n_name")).cast("long").as("g_nation"))
        .orderBy(col("n_name").asc_nulls_first,
          col("channel").asc_nulls_first)
    },

    "c02_windowed_topk" -> { (s, dir) =>
      // Aggregate over a join, then rank within group, top-3 (q67 shape).
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val agg = l.join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("mth", month(col("l_shipdate")).cast("long"))
        .groupBy(col("p_brand"), col("mth"))
        .agg(dsum(col("l_quantity")).as("qty"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_brand"))
        .orderBy(col("qty").desc, col("mth"))
      agg.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .orderBy(col("p_brand"), col("rnk"))
    },

    "c03_exists_chain" -> { (s, dir) =>
      // Semi + anti chain over correlated conditions (q10/q35 shape).
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01"))
      val ret = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_orderkey"))
      val urgent = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("u_custkey"))
      val withReturnedOrder = o
        .join(ret, col("o_orderkey") === col("r_orderkey"), "left_semi")
      c.join(withReturnedOrder, col("c_custkey") === col("o_custkey"),
          "left_semi")
        .join(urgent, col("c_custkey") === col("u_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("bal"))
        .orderBy(col("nk"))
    },

    "c04_multi_count" -> { (s, dir) =>
      // q88 shape: N independent filtered counts of the same fact table,
      // combined by cross-joining 1-row aggregates (each cross join is a
      // BroadcastNestedLoopJoin over single rows — constant cost; the N
      // scans share the cached parquet footer and prune to used columns).
      val l = Tables.load(s, dir, "lineitem")
      def cnt(cond: org.apache.spark.sql.Column, name: String): DataFrame =
        l.filter(cond).agg(count(lit(1)).as(name))
      cnt(col("l_quantity") < 10 && col("l_discount") < 0.02, "n_small_disc")
        .crossJoin(cnt(col("l_quantity").between(20, 30) &&
          col("l_returnflag") === "R", "n_mid_returned"))
        .crossJoin(cnt(col("l_quantity") > 40 &&
          col("l_linestatus") === "F", "n_big_finished"))
        .crossJoin(cnt(col("l_extendedprice") > 50000, "n_pricey"))
    },

    "c05_yoy_growth" -> { (s, dir) =>
      // q31 shape: same aggregate at two periods, joined for a
      // period-over-period ratio (the reference skips q31 in CI for
      // ORDER-BY-tie nondeterminism — the month key here is unique).
      val l = Tables.load(s, dir, "lineitem")
      def rev(year: Int): DataFrame =
        l.filter(col("l_shipdate") >= ts(s"$year-01-01") &&
            col("l_shipdate") < ts(s"${year + 1}-01-01"))
          .groupBy(month(col("l_shipdate")).cast("long").as("mth"))
          .agg(dsum(col("l_extendedprice")).as(s"rev$year"))
      rev(1996).join(rev(1997).withColumnRenamed("mth", "mth2"),
          col("mth") === col("mth2"))
        .select(col("mth"), col("rev1996"), col("rev1997"),
          (col("rev1997") / col("rev1996")).as("growth"))
        .orderBy(col("mth"))
    },

    "c06_channel_intersect" -> { (s, dir) =>
      // q14 shape: cross_items = parts sold in ALL channels (INTERSECT of
      // part keys across three channel slices), then the channel-union
      // report restricted to that set. INTERSECT is a shuffle on the key
      // only (distinct + semi-join semantics), and the final restriction
      // is a semi-join — no row blow-up anywhere at 100 TB.
      val l = Tables.load(s, dir, "lineitem")
      def chan(name: String, cond: org.apache.spark.sql.Column): DataFrame =
        l.filter(cond).select(col("l_partkey"), col("l_extendedprice"),
          col("l_discount"), lit(name).as("channel"))
      val c1 = chan("y1996", col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      val c2 = chan("y1997", col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      val c3 = chan("returned", col("l_returnflag") === "R")
      val cross = c1.select(col("l_partkey"))
        .intersect(c2.select(col("l_partkey")))
        .intersect(c3.select(col("l_partkey")))
      val p = Tables.load(s, dir, "part")
      c1.unionByName(c2).unionByName(c3)
        .join(cross, Seq("l_partkey"), "left_semi")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("channel"), col("p_brand"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("rev"),
          count(lit(1)).as("n_sales"))
        .orderBy(col("channel"), col("p_brand"))
    },

    "c07_cumulative_compare" -> { (s, dir) =>
      // q51 shape: two channel series full-outer-joined on the month key,
      // cumulative sums over the join, rows where one channel's running
      // total overtakes the other. The cumulative sums stay in DECIMAL
      // through the window (exact + associative): DuckDB computes windowed
      // double sums with a segment tree, whose association order differs
      // from Spark's streaming frame — decimals make that unobservable.
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
      def series(flag: String, out: String): DataFrame =
        l.filter(col("l_returnflag") === flag)
          .groupBy((year(col("l_shipdate")) * 100 +
            month(col("l_shipdate"))).cast("long").as("ym"))
          .agg(sum(dec(col("l_extendedprice"))).as(out))
      val a = series("R", "rev_r")
      val b = series("N", "rev_n").withColumnRenamed("ym", "ym2")
      val z = lit(BigDecimal(0)).cast("decimal(12,2)")
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ym"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      a.join(b, col("ym") === col("ym2"), "full_outer")
        .select(coalesce(col("ym"), col("ym2")).as("ym"),
          coalesce(col("rev_r"), z).as("rev_r"),
          coalesce(col("rev_n"), z).as("rev_n"))
        .withColumn("cum_r", sum(col("rev_r")).over(w))
        .withColumn("cum_n", sum(col("rev_n")).over(w))
        .filter(col("cum_r") > col("cum_n"))
        .select(col("ym"), col("rev_r").cast("double").as("rev_r"),
          col("rev_n").cast("double").as("rev_n"),
          col("cum_r").cast("double").as("cum_r"),
          col("cum_n").cast("double").as("cum_n"))
        .orderBy(col("ym"))
    },

    "c08_deep_report" -> { (s, dir) =>
      // q64 shape: the same 6-table dimension pipeline evaluated at two
      // periods, self-joined on the report key to compare across years
      // (q64 keeps rows where the later count <= the earlier). Dimension
      // joins broadcast; the two year slices scan-prune on l_shipdate;
      // the self-join key (cust_nation, p_brand) is low-cardinality but
      // the joined sides are already aggregates — tiny at any scale.
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val sup = Tables.load(s, dir, "supplier")
      val p = Tables.load(s, dir, "part")
      val cn = n.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))
      val sn = n.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
      def yearly(year: Int, rev: String, cnt: String): DataFrame =
        Tables.load(s, dir, "lineitem")
          .filter(col("l_shipdate") >= ts(s"$year-01-01") &&
            col("l_shipdate") < ts(s"${year + 1}-01-01"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(cn, col("c_nationkey") === col("cn_key"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(sn, col("s_nationkey") === col("sn_key"))
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("cust_nation"), col("p_brand"))
          .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
              .cast("double").as(rev),
            count(lit(1)).as(cnt))
      val y96 = yearly(1996, "rev96", "n96")
      val y97 = yearly(1997, "rev97", "n97")
        .withColumnRenamed("cust_nation", "cn2")
        .withColumnRenamed("p_brand", "pb2")
      y96.join(y97, col("cust_nation") === col("cn2") &&
          col("p_brand") === col("pb2"))
        .filter(col("rev97") <= col("rev96"))
        .select(col("cust_nation"), col("p_brand"),
          col("rev96"), col("n96"), col("rev97"), col("n97"))
        .orderBy(col("cust_nation"), col("p_brand"))
    },

    "c09_frequent_best" -> { (s, dir) =>
      // q23 shape: frequent items (HAVING count over a period) × best
      // customers (spend above a scalar-subquery threshold: half the max
      // customer spend), restricting a later period's sales to both sets.
      // The threshold is a 1-row aggregate cross-joined in (constant-cost
      // BNLJ); both restrictions are semi-joins on the aggregate keys.
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val freq = lo.filter(year(col("o_orderdate")) === 1996)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 4).select(col("l_partkey"))
      val spend = lo.groupBy(col("o_custkey"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .as("spend"))
      // threshold compare in DOUBLE on both engines: decimal division
      // rounds to a derived scale in Spark but converts to double in
      // DuckDB — double halving is exact and identical in both.
      val thresh = spend
        .agg((max(col("spend")).cast("double") / 2).as("half_max"))
      val best = spend.crossJoin(thresh)
        .filter(col("spend").cast("double") > col("half_max"))
        .select(col("o_custkey"))
      lo.filter(year(col("o_orderdate")) === 1997)
        .join(freq, Seq("l_partkey"), "left_semi")
        .join(best, Seq("o_custkey"), "left_semi")
        .groupBy(month(col("o_orderdate")).cast("long").as("mth"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy(col("mth"))
    },

    "c10_having_count" -> { (s, dir) =>
      // q34/q73 shape: customers whose order count in a slice lands in a
      // band (HAVING BETWEEN over a grouped join), joined back to the
      // customer dimension for the report.
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      val c = Tables.load(s, dir, "customer")
      o.groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt").between(2, 5))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
          col("cnt"))
        .orderBy(col("cnt").desc, col("c_custkey"))
    },

    "c11_channel_ratio" -> { (s, dir) =>
      // q78 shape: per-key revenue in one channel LEFT-joined against
      // another, ratio with an absent-channel null path (q78 keeps rows
      // with no counterpart — the LEFT join + COALESCE is the point).
      val l = Tables.load(s, dir, "lineitem")
      def chan(flag: String, rev: String): DataFrame =
        l.filter(col("l_returnflag") === flag)
          .groupBy(col("l_partkey"))
          .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .as(rev))
      val kept = chan("N", "rev_kept")
      val ret = chan("R", "rev_ret").withColumnRenamed("l_partkey", "pk2")
      kept.join(ret, col("l_partkey") === col("pk2"), "left_outer")
        .select(col("l_partkey"),
          col("rev_kept").cast("double").as("rev_kept"),
          coalesce(col("rev_ret").cast("double"), lit(0.0)).as("rev_ret"),
          (coalesce(col("rev_ret").cast("double"), lit(0.0)) /
            col("rev_kept").cast("double")).as("ret_ratio"))
        .orderBy(col("l_partkey"))
    },

    "c12_net_returns" -> { (s, dir) =>
      // q93 shape: sales netted against a returns slice of the SAME fact
      // table (q93 joins store_sales to store_returns on item+ticket).
      // Aggregate both sides to the join grain FIRST, then one left join —
      // the self-join never fans out, and the shuffle carries one row per
      // (orderkey, partkey) on each side.
      val l = Tables.load(s, dir, "lineitem")
      val sold = l.filter(col("l_returnflag") =!= "R")
        .groupBy(col("l_orderkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("sold_qty"))
      val ret = l.filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as("ro"), col("l_partkey").as("rp"))
        .agg(dsum(col("l_quantity")).as("ret_qty"))
      sold.join(ret, col("l_orderkey") === col("ro") &&
          col("l_partkey") === col("rp"), "left_outer")
        .select(col("l_orderkey"), col("l_partkey"), col("sold_qty"),
          coalesce(col("ret_qty"), lit(0.0)).as("ret_qty"),
          (col("sold_qty") - coalesce(col("ret_qty"), lit(0.0)))
            .as("net_qty"))
        .orderBy(col("l_orderkey"), col("l_partkey"))
    },

    "c13_monthly_deviation" -> { (s, dir) =>
      // q47/q57 shape — the reference pins it as bug regression 1296
      // (ballista/client/tests/bugs.rs:34-147, TPC-DS q47 "missing sort
      // information"): window OVER an aggregate (yearly average of
      // monthly sums) + rank over time + TRIPLE self-join on rank for
      // prev/next month, filtered to months deviating >10% from the
      // yearly average. avg is computed as decimal-sum / count so both
      // engines divide the same exact values.
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
      val monthly = l
        .groupBy(col("l_returnflag"),
          year(col("l_shipdate")).cast("long").as("yr"),
          month(col("l_shipdate")).cast("long").as("mth"))
        .agg(sum(dec(col("l_extendedprice"))).as("sum_dec"))
      val wYear = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"), col("yr"))
      val wRank = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag")).orderBy(col("yr"), col("mth"))
      val v1 = monthly
        .withColumn("avg_monthly",
          (sum(col("sum_dec")).over(wYear).cast("double") /
            count(lit(1)).over(wYear)))
        .withColumn("rn", row_number().over(wRank).cast("long"))
        .select(col("l_returnflag"), col("yr"), col("mth"),
          col("sum_dec").cast("double").as("sum_sales"),
          col("avg_monthly"), col("rn"))
      val vLag = v1.select(col("l_returnflag").as("f2"),
        col("rn").as("rn2"), col("sum_sales").as("psum"))
      val vLead = v1.select(col("l_returnflag").as("f3"),
        col("rn").as("rn3"), col("sum_sales").as("nsum"))
      v1.join(vLag, col("l_returnflag") === col("f2") &&
          col("rn") === col("rn2") + 1)
        .join(vLead, col("l_returnflag") === col("f3") &&
          col("rn") === col("rn3") - 1)
        .filter(col("yr") === 1997 && col("avg_monthly") > 0 &&
          abs(col("sum_sales") - col("avg_monthly")) / col("avg_monthly")
            > 0.1)
        .select(col("l_returnflag"), col("yr"), col("mth"),
          col("sum_sales"), col("avg_monthly"), col("psum"), col("nsum"))
        .orderBy(col("l_returnflag"), col("mth"))
    },

    "c14_channel_topn_union" -> { (s, dir) =>
      // q49 shape: rank items WITHIN each channel, take each channel's
      // top 10, UNION the per-channel leaderboards. The rank window is
      // per-channel over the part dimension (bounded cardinality at any
      // corpus size), and WindowGroupLimit keeps 10 rows per channel
      // past the exchange.
      val l = Tables.load(s, dir, "lineitem")
      def board(flag: String, name: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("rev").desc, col("l_partkey"))
        l.filter(col("l_returnflag") === flag)
          .groupBy(col("l_partkey"))
          .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("rev"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 10)
          .select(lit(name).as("channel"), col("rnk"), col("l_partkey"),
            col("rev"))
      }
      board("R", "returned").unionByName(board("N", "kept"))
        .orderBy(col("channel"), col("rnk"))
    },

    "c15_channel_profit_rollup" -> { (s, dir) =>
      // q77 shape (`benchmarks/queries-tpcds/q77.sql`): per channel, a
      // sales aggregate LEFT-joined to a returns aggregate on the
      // channel's entity id (returns coalesced to 0, loss subtracted
      // from profit), the three channel blocks UNION ALL'd, and the
      // whole report summarized with ROLLUP(channel, id). Each block's
      // two aggregates shuffle once on (id); the rollup input is already
      // one row per (channel, id) — tiny at any corpus size. All money
      // math stays in exact decimal until after the ROLLUP sums.
      val l = Tables.load(s, dir, "lineitem")
      def block(from: String, to: String, name: String): DataFrame = {
        val slice = l.filter(col("l_shipdate") >= ts(from) &&
          col("l_shipdate") < ts(to))
        val sales = slice.filter(col("l_returnflag") =!= "R")
          .groupBy(col("l_suppkey").as("id"))
          .agg(sum(dec(col("l_extendedprice"))).as("sales"),
            sum(discounted(col("l_extendedprice"), col("l_discount")))
              .as("profit"))
        val rets = slice.filter(col("l_returnflag") === "R")
          .groupBy(col("l_suppkey").as("rid"))
          .agg(sum(dec(col("l_extendedprice"))).as("returns"),
            sum(discounted(col("l_extendedprice"), col("l_discount")))
              .as("loss"))
        sales.join(rets, col("id") === col("rid"), "left_outer")
          .select(lit(name).as("channel"), col("id"),
            col("sales"),
            coalesce(col("returns"),
              lit(BigDecimal(0)).cast("decimal(22,2)")).as("returns"),
            (col("profit") - coalesce(col("loss"),
              lit(BigDecimal(0)).cast("decimal(31,4)"))).as("profit"))
      }
      block("1996-01-01", "1997-01-01", "y1996")
        .unionByName(block("1997-01-01", "1998-01-01", "y1997"))
        .unionByName(block("1998-01-01", "1999-01-01", "y1998"))
        .rollup(col("channel"), col("id"))
        .agg(sum(col("sales")).cast("double").as("sales"),
          sum(col("returns")).cast("double").as("returns"),
          sum(col("profit")).cast("double").as("profit"))
        .orderBy(col("channel").asc_nulls_first, col("id").asc_nulls_first)
    },

    "c16_multi_supplier_returns" -> { (s, dir) =>
      // q95 shape (`benchmarks/queries-tpcds/q95.sql`): orders shipped in
      // a window, restricted by two dimension attributes, that (a) span
      // more than one supplier and (b) also have a returned line among
      // the multi-supplier orders — q95's two IN-subqueries over the
      // ws_wh self-join. The multi-supplier set is computed as a
      // grouped count(distinct) rather than the reference's pairwise
      // self-join: EXISTS(pair with a different supplier) ⇔
      // count(distinct supplier) > 1, and the aggregate form shuffles
      // lineitem once on orderkey with no pair fan-out at 100 TB.
      val l = Tables.load(s, dir, "lineitem")
      val multi = l.groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"))
        .filter(col("nsupp") > 1).select(col("l_orderkey").as("mo"))
      val retMulti = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rko"))
        .join(multi, col("rko") === col("mo"), "left_semi")
      val o = Tables.load(s, dir, "orders")
      val natSet = Tables.load(s, dir, "nation")
        .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))
      val custSet = Tables.load(s, dir, "customer")
        .join(natSet, col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val supSet = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") > 0).select(col("s_suppkey"))
      l.filter(col("l_shipdate") >= ts("1996-05-01") &&
          col("l_shipdate") < ts("1996-07-01"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(custSet, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(supSet, col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(multi, col("l_orderkey") === col("mo"), "left_semi")
        .join(retMulti, col("l_orderkey") === col("rko"), "left_semi")
        .agg(countDistinct(col("l_orderkey")).as("order_cnt"),
          sum(dec(col("l_extendedprice")) * dec(col("l_tax"), 8))
            .cast("double").as("ship_cost"),
          sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("net_profit"))
    },

    "c17_cross_channel_tolerance" -> { (s, dir) =>
      // q58 shape (`benchmarks/queries-tpcds/q58.sql`): per-item revenue
      // in three channels, inner-joined on the item key, keeping items
      // whose revenue in EVERY channel lies within 90–110% of every
      // other channel's, reporting each channel's deviation from the
      // three-channel average. Three one-shuffle aggregates joined on
      // the same key; the tolerance filter and deviations are computed
      // in double on both engines (exact-decimal sums cast to double
      // first, so the band compares identical bits).
      val l = Tables.load(s, dir, "lineitem")
      def chanRev(flag: String, key: String, out: String): DataFrame =
        l.filter(col("l_returnflag") === flag)
          .groupBy(col("l_partkey").as(key))
          .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as(out))
      def band(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        x.between(y * 0.9, y * 1.1)
      val a = chanRev("A", "l_partkey", "a_rev")
      val n = chanRev("N", "pk2", "n_rev")
      val r = chanRev("R", "pk3", "r_rev")
      val avg3 = (col("a_rev") + col("n_rev") + col("r_rev")) / lit(3)
      a.join(n, col("l_partkey") === col("pk2"))
        .join(r, col("l_partkey") === col("pk3"))
        .filter(band(col("a_rev"), col("n_rev")) &&
          band(col("a_rev"), col("r_rev")) &&
          band(col("n_rev"), col("a_rev")) &&
          band(col("n_rev"), col("r_rev")) &&
          band(col("r_rev"), col("a_rev")) &&
          band(col("r_rev"), col("n_rev")))
        .select(col("l_partkey"),
          col("a_rev"), (col("a_rev") / avg3 * 100).as("a_dev"),
          col("n_rev"), (col("n_rev") / avg3 * 100).as("n_dev"),
          col("r_rev"), (col("r_rev") / avg3 * 100).as("r_dev"),
          avg3.as("average"))
        .orderBy(col("l_partkey"))
    },

    "c18_weekly_dow_ratio" -> { (s, dir) =>
      // q2/q59 shape (`benchmarks/queries-tpcds/q2.sql`, `q59.sql`):
      // weekly revenue pivoted to day-of-week columns via conditional
      // aggregation, the week series self-joined against the same week
      // one year later, reporting the per-day ratios. Week/day keys are
      // derived by integer day arithmetic from a fixed Monday anchor —
      // identical in both engines (calendar week functions differ at
      // year boundaries across engines). One groupBy(week) shuffle, then
      // a self-join of two ~|weeks|-row aggregates — trivial at any SF.
      val o = Tables.load(s, dir, "orders")
      val anchor = to_date(lit("1994-12-26")) // Monday before data start
      val base = o.withColumn("d", datediff(to_date(col("o_orderdate")), anchor))
        .withColumn("wk", floor(col("d") / 7).cast("long"))
        .withColumn("dow", (col("d") % 7).cast("int"))
      val dows = 0 until 7
      val aggs = dows.map(j =>
        sum(when(col("dow") === j, dec(col("o_totalprice")))).as(s"s$j"))
      val weekly = base.groupBy(col("wk")).agg(aggs.head, aggs.tail: _*)
      val y1 = weekly
      val y2 = weekly.select(col("wk").as("wk2") +:
        dows.map(j => col(s"s$j").as(s"t$j")): _*)
      val allPresent = dows.map(j =>
        col(s"s$j").isNotNull && col(s"t$j").isNotNull)
        .reduce(_ && _)
      y1.join(y2, col("wk") + 52 === col("wk2"))
        .filter(allPresent)
        .select(col("wk") +: dows.map(j =>
          (col(s"t$j").cast("double") / col(s"s$j").cast("double"))
            .as(s"r$j")): _*)
        .orderBy(col("wk"))
    },

    "c19_channel_overlap" -> { (s, dir) =>
      // q97 shape (`benchmarks/queries-tpcds/q97.sql`): distinct
      // (customer, part) pairs in two channel slices, FULL OUTER joined
      // on the pair key, counting pairs seen only in the first channel,
      // only in the second, and in both. Two distincts + one full-outer
      // merge join on the same key — each a single shuffle, no fan-out.
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
      def pairs(year: Int, ck: String, pk: String): DataFrame =
        lo.filter(org.apache.spark.sql.functions.year(col("o_orderdate")) === year)
          .select(col("o_custkey").as(ck), col("l_partkey").as(pk))
          .distinct()
      pairs(1996, "ck1", "pk1")
        .join(pairs(1997, "ck2", "pk2"),
          col("ck1") === col("ck2") && col("pk1") === col("pk2"),
          "full_outer")
        .agg(
          sum(when(col("ck1").isNotNull && col("ck2").isNull, 1)
            .otherwise(0)).cast("long").as("only_1996"),
          sum(when(col("ck1").isNull && col("ck2").isNotNull, 1)
            .otherwise(0)).cast("long").as("only_1997"),
          sum(when(col("ck1").isNotNull && col("ck2").isNotNull, 1)
            .otherwise(0)).cast("long").as("both_years"))
    },

    "c20_growth_compare" -> { (s, dir) =>
      // q4/q11 shape (`benchmarks/queries-tpcds/q4.sql`, `q11.sql`):
      // per-customer year-over-year spend growth computed separately in
      // two channels, keeping customers whose growth in the "returned"
      // channel exceeds their growth in the "kept" channel. All four
      // period×channel aggregates come from ONE conditional-aggregation
      // pass over the joined fact (one shuffle on custkey), not four
      // scans — the Spark-first fix for q4's quadruple CTE scan.
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("yr", year(col("o_orderdate")))
      def spend(yr: Int, flag: String): org.apache.spark.sql.Column =
        sum(when(col("yr") === yr && col("l_returnflag") === flag,
          discounted(col("l_extendedprice"), col("l_discount"))))
      val g = lo.groupBy(col("o_custkey"))
        .agg(spend(1996, "N").as("s96n"), spend(1997, "N").as("s97n"),
          spend(1996, "R").as("s96r"), spend(1997, "R").as("s97r"))
        .filter(col("s96n").isNotNull && col("s97n").isNotNull &&
          col("s96r").isNotNull && col("s97r").isNotNull)
      g.select(col("o_custkey"),
          col("s96n").cast("double").as("s96n"),
          col("s97n").cast("double").as("s97n"),
          col("s96r").cast("double").as("s96r"),
          col("s97r").cast("double").as("s97r"))
        .withColumn("growth_r", col("s97r") / col("s96r"))
        .withColumn("growth_n", col("s97n") / col("s96n"))
        .filter(col("growth_r") > col("growth_n"))
        .orderBy(col("o_custkey"))
    },

    "c21_restricted_channel_total" -> { (s, dir) =>
      // q33/q56/q60 shape (`benchmarks/queries-tpcds/q33.sql`, `q56.sql`,
      // `q60.sql`): per-channel revenue for items restricted by an
      // IN-subquery over a dimension attribute (small parts), UNION ALL'd
      // and re-aggregated to a grand total per brand. The restriction is
      // a semi-join on the (broadcastable, dimension-sized) part subset;
      // each channel aggregates before the union so the re-aggregate
      // input is |brands|×3 rows.
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val target = p.filter(col("p_size") < 10).select(col("p_partkey"))
      def chan(flag: String): DataFrame =
        l.filter(col("l_returnflag") === flag &&
            col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01"))
          .join(target, col("l_partkey") === col("p_partkey"), "left_semi")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .as("rev"))
      chan("A").unionByName(chan("N")).unionByName(chan("R"))
        .groupBy(col("p_brand"))
        .agg(sum(col("rev")).cast("double").as("total_rev"),
          count(lit(1)).as("n_channels"))
        .orderBy(col("total_rev").desc, col("p_brand"))
    },

    "c22_customer_retention_setops" -> { (s, dir) =>
      // q38/q87 shape (`benchmarks/queries-tpcds/q38.sql`, `q87.sql`):
      // COUNT over a chain of set operations on DISTINCT customer keys
      // across three consecutive years — INTERSECT for the three-year
      // loyal set (q38), EXCEPT for the churned set (q87). Set ops on the
      // key only: three distincts + semi/anti merges, each one shuffle of
      // |customers| keys, then two 1-row aggregates cross-joined.
      val o = Tables.load(s, dir, "orders")
      def custs(yr: Int): DataFrame =
        o.filter(year(col("o_orderdate")) === yr)
          .select(col("o_custkey")).distinct()
      val loyal = custs(1996).intersect(custs(1997)).intersect(custs(1998))
        .agg(count(lit(1)).as("n_all_three"))
      val churned = custs(1996).except(custs(1997)).except(custs(1998))
        .agg(count(lit(1)).as("n_churned_96"))
      loyal.crossJoin(churned)
    },

    "c23_buy_return_resell" -> { (s, dir) =>
      // q17/q29 shape (`benchmarks/queries-tpcds/q17.sql`, `q29.sql`):
      // the buy → return → re-sell funnel — (customer, part) pairs where
      // the customer bought (period 1) AND returned the same part
      // (period 1), restricted to parts the market re-absorbed (sold
      // again to anyone in period 2 — q29's cross-channel re-purchase
      // step at the item grain, since the synthetic corpus has no
      // same-customer 3-step chains). Each step aggregates the fact to
      // its join grain BEFORE the chain joins (the same no-fan-out rule
      // as c12); quantities stay decimal until the final per-brand sums.
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val p = Tables.load(s, dir, "part")
      val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("yr", year(col("o_orderdate")))
      def custStep(flag: String, ck: String, pk: String,
                   q: String): DataFrame =
        lo.filter(col("yr") <= 1996 && col("l_returnflag") === flag)
          .groupBy(col("o_custkey").as(ck), col("l_partkey").as(pk))
          .agg(sum(dec(col("l_quantity"))).as(q))
      val bought = custStep("N", "ck1", "pk1", "q_bought")
      val returned = custStep("R", "ck2", "pk2", "q_ret")
      val resold = lo.filter(col("yr") >= 1997 && col("l_returnflag") === "N")
        .groupBy(col("l_partkey").as("pk3"))
        .agg(sum(dec(col("l_quantity"))).as("q_resold"))
      bought
        .join(returned, col("ck1") === col("ck2") && col("pk1") === col("pk2"))
        .join(resold, col("pk1") === col("pk3"))
        .join(p, col("pk1") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("q_bought")).cast("double").as("bought_qty"),
          sum(col("q_ret")).cast("double").as("ret_qty"),
          sum(col("q_resold")).cast("double").as("resold_qty"))
        .orderBy(col("p_brand"))
    },

    "c24_rollup_rank_within_parent" -> { (s, dir) =>
      // q36 shape (`benchmarks/queries-tpcds/q36.sql`): gross-margin
      // ROLLUP over a (nation, brand) hierarchy with RANK computed
      // WITHIN each grouping level, partitioned so each subtotal ranks
      // among its siblings (rank-within-parent). A window over the
      // Expand/aggregate output — the one shape combining grouping sets
      // with post-aggregation windows. Margin ties are broken by the
      // dimension values so the rank is fully deterministic.
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val p = Tables.load(s, dir, "part")
      val base = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .filter(year(col("o_orderdate")) === 1996)
      val agg = base.rollup(col("n_name"), col("p_brand"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("rev"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"),
          (grouping(col("n_name")) + grouping(col("p_brand")))
            .cast("long").as("lochierarchy"),
          grouping(col("p_brand")).cast("long").as("g_brand"))
        .withColumn("margin", col("qty") / col("rev"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lochierarchy"),
          when(col("g_brand") === 0, col("n_name")))
        .orderBy(col("margin").desc,
          col("n_name").asc_nulls_first, col("p_brand").asc_nulls_first)
      agg.withColumn("rank_within_parent", rank().over(w).cast("long"))
        .select(col("n_name"), col("p_brand"), col("rev"), col("margin"),
          col("lochierarchy"), col("rank_within_parent"))
        .orderBy(col("lochierarchy").desc,
          col("n_name").asc_nulls_first, col("p_brand").asc_nulls_first)
    },

    "c25_monthly_pivot_report" -> { (s, dir) =>
      // q66 shape (`benchmarks/queries-tpcds/q66.sql`): two channel
      // slices UNION ALL'd, then per warehouse-analog (supplier) the
      // year's revenue pivoted into 12 month columns by conditional
      // aggregation, plus the total. One union (no row growth beyond
      // the inputs), one shuffle on the supplier key; 12 conditional
      // decimal sums ride the same aggregate. Months with no sales are
      // reported as exact 0 (like q66's SUM(CASE ... ELSE 0)).
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      def slice(flag: String): DataFrame =
        l.filter(col("l_returnflag") === flag)
          .select(col("l_suppkey"), month(col("l_shipdate")).as("mth"),
            discounted(col("l_extendedprice"), col("l_discount")).as("rev"))
      val z = lit(BigDecimal(0)).cast("decimal(21,4)")
      val monthCols = (1 to 12).map(m =>
        sum(when(col("mth") === m, col("rev")).otherwise(z))
          .cast("double").as(f"rev_m$m%02d"))
      val aggs = monthCols :+ sum(col("rev")).cast("double").as("rev_total")
      slice("N").unionByName(slice("A"))
        .groupBy(col("l_suppkey"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("l_suppkey"))
    },

    "c28_colocated_frequent_best" -> { (s, dir) =>
      // The CO-LOCATION production shape the sf1 scale leg motivates:
      // c09 (q23's frequent-items × best-customers report) makes THREE
      // lineitem ⋈ orders passes, and past the broadcast threshold each
      // one pays a full sort-merge shuffle. Bucketing both facts on the
      // order key at write time ([[ensureBucketedFacts]], a one-time
      // materialized artifact like d21/v18's indexes) makes every pass
      // an exchange-free SMJ over bucket-aligned, pre-sorted splits —
      // the analogue of the reference pre-partitioning stages on the
      // join key ahead of SortMergeJoinExec. Same rows as c09 (same
      // oracle); the plan golden pins bucketed scans and the
      // shuffle-free joins. The merge hint keeps the plan on SMJ even
      // where the graded SF would broadcast, so the frozen plan IS the
      // at-scale plan.
      val (l, o) = ensureBucketedFacts(s, dir)
      colocFrequentBest(l, o)
    },

    "c28r_rebucketed_join" -> { (s, dir) =>
      // c28 OVER THE RE-BUCKETED (32 → 128) warehouse — the graded
      // proof that [[ensureRebucketedFacts]]'s artifact-to-artifact
      // rewrite preserves the co-location contract: the identical
      // report body runs exchange-free on the new bucket count (plan
      // pins in PlanShapeSpec assert zero fact-side Exchange and
      // 128-bucket scans), and the oracle is c28's verbatim — the
      // rewrite is physical layout only. At 100 TB this is the
      // nightly answer to per-bucket split growth: re-bucket at one
      // shuffle's cost instead of living with 32 ever-fatter buckets.
      val (l, o) = ensureRebucketedFacts(s, dir)
      colocFrequentBest(l, o)
    },

    "c30r_rebucketed_window" -> { (s, dir) =>
      // c30's exchange-free window, re-graded on the 128-bucket
      // layout (oracle verbatim — see c28r).
      colocWindow(ensureRebucketedFacts(s, dir)._1)
    },

    "c31r_rebucketed_lookup" -> { (s, dir) =>
      // c31's bucket-pruned lookup, re-graded on the 128-bucket
      // layout: the same 4 keys now prune to ≤4 of 128 buckets —
      // pruning selectivity IMPROVES with the re-bucket while the
      // result stays bit-identical (oracle verbatim — see c28r).
      bucketLookup(ensureRebucketedFacts(s, dir)._1)
    },

    "c26_sales_returns_rollup" -> { (s, dir) =>
      // q5's report shape (`benchmarks/queries-tpcds/q5.sql`): two
      // DIFFERENTLY-SHAPED money flows — every shipped line as a sale,
      // every returned ('R') line as a return — zero-padded into one
      // row shape, UNION ALL'd, dimension-joined, then ROLLUP'd over
      // (channel, nation) so per-cell sales/returns/net, the channel
      // subtotals, and the grand total come from ONE pass. Scale
      // shape: the union adds rows but no second scan pattern (both
      // legs prune to the same columns), the rollup's Expand feeds a
      // single hash aggregate (one shuffle), every money sum is exact
      // decimal, and the nation dim joins broadcast.
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      val z = lit(BigDecimal(0)).cast("decimal(21,4)")
      val salesLeg = l.select(col("l_orderkey"),
        discounted(col("l_extendedprice"), col("l_discount"))
          .as("sales_amt"),
        z.as("return_amt"))
      val retLeg = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          z.as("sales_amt"),
          dec(col("l_extendedprice")).cast("decimal(21,4)")
            .as("return_amt"))
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val channel =
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
          .when(col("o_orderpriority") === "3-MEDIUM", "medium")
          .otherwise("standard")
      salesLeg.unionByName(retLeg)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("channel", channel)
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .rollup(col("channel"), col("n_name"))
        .agg(sum(col("sales_amt")).cast("double").as("sales"),
          sum(col("return_amt")).cast("double").as("returns"),
          (sum(col("sales_amt")) - sum(col("return_amt")))
            .cast("double").as("net"),
          count(lit(1)).as("n_rows"),
          grouping(col("channel")).cast("long").as("g_channel"),
          grouping(col("n_name")).cast("long").as("g_nation"))
        .orderBy(col("channel").asc_nulls_first,
          col("n_name").asc_nulls_first)
    },

    "c27_deep_rollup" -> { (s, dir) =>
      // q22's DEEP-ROLLUP report shape (`benchmarks/queries-tpcds/
      // q22.sql`: avg inventory over ROLLUP of 4 item dims, ordered by
      // the average, LIMIT 100): average shipped quantity over
      // lineitem ⋈ part, ROLLUP(p_mfgr, p_brand, p_type, p_container)
      // — all 5 grouping prefixes from ONE Expand + hash-aggregate
      // pass (one shuffle; Expand×5 rides map-side partials), never 5
      // separate aggregations. The average is exact-decimal sum over
      // count with ONE double division, so the sort key is
      // bit-identical across engines; group columns tiebreak the
      // LIMIT boundary (q22's own ORDER BY discipline).
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      val p = Tables.load(s, dir, "part")
        // q22's item hierarchy mapped to the synthetic part dims:
        // type (6) → brand (25) → size decade (6) → size (50).
        .withColumn("sz_bucket", expr("CAST(p_size div 10 AS BIGINT)"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .rollup(col("p_type"), col("p_brand"), col("sz_bucket"),
          col("p_size"))
        .agg((sum(dec(col("l_quantity"))).cast("double") /
            count(lit(1)).cast("double")).as("qoh"),
          count(lit(1)).as("n"))
        .orderBy(col("qoh"), col("p_type").asc_nulls_first,
          col("p_brand").asc_nulls_first, col("sz_bucket").asc_nulls_first,
          col("p_size").asc_nulls_first)
        .limit(100)
    },

    "c29_zorder_layout" -> { (s, dir) =>
      // Z-ORDER layout audit — the multi-dimensional data-clustering
      // decision (Delta/Iceberg `OPTIMIZE ... ZORDER BY`) as a graded,
      // data-visible fact: lineitem rows are laid out two ways into 32
      // equal files — sorted by l_partkey alone vs by the bit-INTERLEAVED
      // z-value of (l_partkey, l_suppkey) — and the audit reports each
      // file's (min, max) bounding box on BOTH keys. Per-file key spans
      // are exactly what parquet min/max file skipping prunes on: the
      // 1-d sort gives tight partkey spans but full-range suppkey spans
      // (a suppkey predicate scans every file); the z-order gives
      // bounded spans on BOTH, which is the whole point of the curve.
      // The keys are RANGE-NORMALIZED to a common 10-bit space from
      // column min/max stats before interleaving — the step every real
      // Z-ORDER implementation performs, and it is load-bearing: raw
      // interleave lets the wider key's high bits dominate (partkey has
      // ~4 bits on suppkey here) and degenerates to a 1-d sort with
      // full-range spans on the narrow key (measured: avg sk_span 99 =
      // the whole suppkey range at sf0.01 without normalization).
      // Scale: the z-value is a pure 21-bit/k shift-or projection
      // (codegen, no shuffle); the 32-file assignment replicates
      // ntile's exact tile boundaries from a GLOBAL ROW NUMBER built
      // with the t17/d13 two-grain prefix-sum trick (coarse key-prefix
      // buckets → bounded cumulative window → within-bucket
      // row_number), so no corpus-wide single-partition window exists —
      // in production this assignment IS the repartitionByRange write;
      // the audit aggregate is 64 rows. The span-product column makes
      // the comparison one ORDER BY away.
      zorderExactAudit(zorderNormalized(s, dir))
    },

    "c29c_zorder_exact_sampled" -> { (s, dir) =>
      // c29's EXACT ntile audit, bounded (round 16): the full-corpus
      // exact leg is an expensive oracle at scale (152.5 s and a
      // 48 GiB heap at sf10, for an audit whose production path c29b
      // answers at 37.7 s on the default heap) — so the exact-regime
      // audit a scale leg runs is this one: the identical two-grain
      // prefix-sum ntile machinery over a DETERMINISTIC md5-elected
      // ~1/8 row subset (the d29b coin discipline — both engines
      // recompute the same coin, so the report stays hash-exact, not
      // a seeded sample). The filter applies BEFORE the stats pass:
      // normalization, tile boundaries and bounding boxes all derive
      // from the sampled sub-corpus, so the audit is self-contained
      // and its layout conclusions (1-d sort leaves full-range
      // suppkey spans; z-order bounds both) read the same. The
      // full-corpus exact leg (c29) stays the ≤sf1 audit; c29b stays
      // the production path with its full-corpus oracle.
      val coin = conv(substring(md5(concat(
        col("l_orderkey").cast("string"), lit(":"),
        col("l_linenumber").cast("string"), lit(":zs1"))
        .cast("binary")), 1, 15), 16, 10).cast("long") % 8 === 0
      zorderExactAudit(zorderNormalized(s, dir, Some(coin)))
    },

    "c29b_zorder_sketch_cuts" -> { (s, dir) =>
      // c29's layout audit with the file-cut boundaries derived from a
      // KLL SKETCH instead of the exact two-grain global row number —
      // the reference's own runtime-stats mechanism (a per-partition
      // sketch merged into range cuts,
      // `core/src/execution_plans/runtime_stats.rs:877`; our
      // ParallelWindow already feeds its range cuts the same way).
      // Shape: per leg ONE kll_sketch aggregation (mergeable, one input
      // pass, driver holds <= capacity doubles — the footprint class of
      // RangePartitioner's sample), then assignment is a pure PROJECTION
      // against the 31 driver-literal cuts — no window of ANY kind, no
      // prefix-sum machinery; at 100 TB this is strictly cheaper than
      // c29's exact leg and is what a real repartitionByRange write
      // does. The trade the audit makes gradeable: a sketch cut cannot
      // split a run of equal keys, so repeated keys skew file sizes
      // (n_rows) where exact ntile stays balanced — span tightness vs
      // file balance, side by side with c29's rows.
      // Determinism: capacity 2^20 exceeds the graded-SF row counts, so
      // the sketch never compacts (rankErr == 0) and every cut is the
      // EXACT ceil(q*N)-th smallest value — order-independent and
      // DuckDB-replicable; beyond ~1M rows (sf1+, bench-only) cuts are
      // approximate within the KLL rank bound. 1023-normalized keys and
      // 20-bit z-values are exactly representable as doubles, so the
      // sketch's double domain loses nothing.
      val l = zorderNormalized(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def leg(name: String, key: org.apache.spark.sql.Column): DataFrame = {
        val keyed = l.withColumn("k", key)
        val skBytes = keyed
          .agg(expr(s"kll_sketch(k, ${1 << 20})").as("__sk"))
          .head().getAs[Array[Byte]](0)
        val st = graft.functions.KllState.deserialize(skBytes)
        val cuts = st.quantiles((1 until 32).map(_ / 32.0))
        val f = cuts.foldLeft(lit(1)) { (acc, c) =>
          acc + when(col("k") > c, 1).otherwise(0)
        }.cast("long")
        keyed.withColumn("f", f)
          .groupBy(col("f"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("pk_min"),
            max(col("l_partkey")).as("pk_max"),
            min(col("l_suppkey")).as("sk_min"),
            max(col("l_suppkey")).as("sk_max"))
          .withColumn("layout", lit(name))
          // Dx rule as in c29 (exact DECIMAL product, double close).
          // Sketch cuts cannot split an equal-key run, so a skewed
          // file can span the FULL key range — the long product
          // overflowed here first (sf10, ANSI ARITHMETIC_OVERFLOW)
          // before c29's balanced files did.
          .withColumn("span_product", expr(
            "CAST(CAST(pk_max - pk_min AS DECIMAL(19,0))" +
              " * CAST(sk_max - sk_min AS DECIMAL(19,0)) AS DOUBLE)"))
      }
      leg("pk_sort", col("l_partkey"))
        .unionByName(leg("zorder", zval(col("npk"), col("nsk"))))
        .select(col("layout"), col("f"), col("n_rows"),
          col("pk_min"), col("pk_max"), col("sk_min"), col("sk_max"),
          col("span_product"))
        .orderBy(col("layout"), col("f"))
    },

    "c30_colocated_window" -> { (s, dir) =>
      // Co-location for SORT-BASED operators — c28's claim extended
      // from joins to WINDOWS: a window partitioned on the bucket key
      // of a bucketed+sorted fact needs NO Exchange (the scan's
      // HashPartitioning(l_orderkey, 32) already satisfies the window's
      // clustered distribution; only the cheap local secondary sort
      // remains). Per-order line sequencing + running order amount —
      // the order-book shape every co-located fact table serves without
      // shuffling a single row; the plan golden pins the bucketed scan
      // with zero Exchange below the Window. Exact decimal running sum
      // (the Dx rule), one closing double cast.
      colocWindow(ensureBucketedFacts(s, dir)._1)
    },

    "c31_bucket_pruned_lookup" -> { (s, dir) =>
      // BUCKET PRUNING — the third payoff of the bucketed layout after
      // c28 (exchange-free joins) and c30 (exchange-free windows): an
      // equality/IN predicate on the bucket column prunes the SCAN to
      // the buckets those keys can hash into — the plan golden pins
      // `SelectedBucketsCount: ≤4 out of 32`, i.e. a point lookup reads
      // ≤1/8 of the table's files before a single row is filtered. At
      // 100 TB this is the difference between a point query touching
      // ~N/32 file bytes and touching all of them: scan work scales
      // with the key count, not the table, and the same pruning
      // composes with the zero-Exchange join/window shapes on the same
      // layout. The aggregate itself is a bounded per-order summary
      // (the Dx decimal rule for the money sums).
      bucketLookup(ensureBucketedFacts(s, dir)._1)
    },

    "c32_dpp_prune" -> { (s, dir) =>
      // DYNAMIC PARTITION PRUNING — the runtime twin of SourcesSpec's
      // static partition pruning and the fourth layout payoff (after
      // c28/c30/c31): the fact copy is directory-partitioned by ship
      // month, the dim side (distinct active months from a filtered
      // orders scan) is only known at RUN time, and Catalyst injects
      // the dim's build-side values into the fact scan as a
      // dynamicpruningexpression — the scan reads only the ~3 month
      // directories the dim can produce, without any static literal
      // in the query. At 100 TB this is THE mechanism that keeps
      // star-join scans proportional to the dim selection (partition
      // elimination at the source list, before any I/O), composing
      // with AQE and broadcast reuse; the golden pins the
      // dynamicpruningexpression in the fact scan's PartitionFilters.
      val f = ensurePartitionedFact(s, dir)
      val dim = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1996-04-01"))
        .select((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).cast("int").as("dmonth"))
        .distinct()
      f.join(dim, col("ship_month") === col("dmonth"))
        .groupBy(col("ship_month"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("ship_month"))
    },

    "c32b_dpp_all_months" -> { (s, dir) =>
      // c32's NEGATIVE CONTROL: the identical star shape but the dim
      // is UNFILTERED (every order month) — there is no selective
      // predicate for the planner to propagate, so it must NOT inject
      // a dynamicpruning subquery (the golden pins its absence: DPP
      // firing here would run a pointless broadcast-and-filter pass
      // over the partition listing to keep 100% of directories), and
      // correctness must be unchanged — the graded rows hash against
      // the same oracle family whether or not pruning fires. Together
      // with c32 this pins BOTH edges of the planner's decision.
      val f = ensurePartitionedFact(s, dir)
      val dim = Tables.load(s, dir, "orders")
        .select((year(col("o_orderdate")) * 100 +
          month(col("o_orderdate"))).cast("int").as("dmonth"))
        .distinct()
      f.join(dim, col("ship_month") === col("dmonth"))
        .groupBy(col("ship_month"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("ship_month"))
    }
  )

  /** One-time SHIP-MONTH-PARTITIONED lineitem copy — c32's layout
    * artifact (directory partitioning, the complement of
    * [[ensureBucketedFacts]]'s bucketing): ~25 month directories at
    * any SF, each a pruning unit for static (SourcesSpec) and dynamic
    * (c32) partition elimination. Session-catalog table, built once
    * per (session, sfDir). */
  private def ensurePartitionedFact(s: SparkSession,
                                    dir: String): DataFrame =
    CatalogPublish.partitioned(s,
      table = s"graft_l_pmonth_${dir.replaceAll("[^A-Za-z0-9]", "_")}",
      src = new java.io.File(s"$dir/lineitem.parquet"),
      family = "graft_l_pmonth",
      df = Tables.load(s, dir, "lineitem")
        .withColumn("ship_month", (year(col("l_shipdate")) * 100 +
          month(col("l_shipdate"))).cast("int")),
      partCol = "ship_month")

  def oracle: Map[String, String] = Map(
    "c32_dpp_prune" ->
      """WITH dim AS (
        | SELECT DISTINCT CAST(year(o_orderdate) * 100 +
        |   month(o_orderdate) AS INT) AS dmonth
        | FROM orders
        | WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |   AND o_orderdate < TIMESTAMP '1996-04-01'),
        |f AS (
        | SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)
        |   AS ship_month, l_quantity, l_extendedprice
        | FROM lineitem)
        |SELECT ship_month, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |   AS sum_price
        |FROM f JOIN dim ON ship_month = dmonth
        |GROUP BY ship_month ORDER BY ship_month""".stripMargin,

    "c32b_dpp_all_months" ->
      """WITH dim AS (
        | SELECT DISTINCT CAST(year(o_orderdate) * 100 +
        |   month(o_orderdate) AS INT) AS dmonth
        | FROM orders),
        |f AS (
        | SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INT)
        |   AS ship_month, l_quantity, l_extendedprice
        | FROM lineitem)
        |SELECT ship_month, COUNT(*) AS n_lines,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |   AS sum_price
        |FROM f JOIN dim ON ship_month = dmonth
        |GROUP BY ship_month ORDER BY ship_month""".stripMargin,

    "c01_channel_rollup" ->
      """WITH sales AS (
        | SELECT l_orderkey,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS rev,
        |  'y1996' AS channel
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | UNION ALL
        | SELECT l_orderkey,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS rev,
        |  'y1997' AS channel
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01')
        |SELECT n_name, channel,
        | CAST(SUM(rev) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_sales,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nation
        |FROM sales, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, channel)
        |ORDER BY n_name ASC NULLS FIRST, channel ASC NULLS FIRST""".stripMargin,

    "c02_windowed_topk" ->
      """WITH agg AS (
        | SELECT p_brand, CAST(month(l_shipdate) AS BIGINT) AS mth,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY 1, 2)
        |SELECT p_brand, mth, qty, rnk FROM (
        | SELECT p_brand, mth, qty,
        |  CAST(row_number() OVER (PARTITION BY p_brand ORDER BY qty DESC, mth) AS BIGINT) AS rnk
        | FROM agg) t
        |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,

    "c03_exists_chain" ->
      """SELECT c_nationkey AS nk, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        |FROM customer
        |WHERE EXISTS (
        |   SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey
        |     AND o_orderdate >= TIMESTAMP '1996-01-01'
        |     AND EXISTS (SELECT 1 FROM lineitem
        |                 WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'))
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY nk""".stripMargin,

    "c04_multi_count" ->
      """SELECT
        | (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 10 AND l_discount < 0.02) AS n_small_disc,
        | (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 20 AND 30 AND l_returnflag = 'R') AS n_mid_returned,
        | (SELECT COUNT(*) FROM lineitem WHERE l_quantity > 40 AND l_linestatus = 'F') AS n_big_finished,
        | (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice > 50000) AS n_pricey""".stripMargin,

    "c05_yoy_growth" ->
      """WITH r96 AS (
        | SELECT CAST(month(l_shipdate) AS BIGINT) AS mth,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev1996
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | GROUP BY 1),
        |r97 AS (
        | SELECT CAST(month(l_shipdate) AS BIGINT) AS mth,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS rev1997
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1)
        |SELECT r96.mth, rev1996, rev1997, rev1997 / rev1996 AS growth
        |FROM r96 JOIN r97 ON r96.mth = r97.mth
        |ORDER BY r96.mth""".stripMargin,

    "c06_channel_intersect" ->
      """WITH chan AS (
        | SELECT l_partkey, l_extendedprice, l_discount, 'y1996' AS channel
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | UNION ALL
        | SELECT l_partkey, l_extendedprice, l_discount, 'y1997' AS channel
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | UNION ALL
        | SELECT l_partkey, l_extendedprice, l_discount, 'returned' AS channel
        | FROM lineitem WHERE l_returnflag = 'R'),
        |cross_parts AS (
        | SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | INTERSECT
        | SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | INTERSECT
        | SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |SELECT channel, p_brand,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS rev,
        | COUNT(*) AS n_sales
        |FROM chan JOIN part ON l_partkey = p_partkey
        |WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
        |GROUP BY channel, p_brand
        |ORDER BY channel, p_brand""".stripMargin,

    "c07_cumulative_compare" ->
      """WITH l2 AS (
        | SELECT * FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'),
        |a AS (
        | SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_r
        | FROM l2 WHERE l_returnflag = 'R' GROUP BY 1),
        |b AS (
        | SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS ym,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev_n
        | FROM l2 WHERE l_returnflag = 'N' GROUP BY 1),
        |j AS (
        | SELECT COALESCE(a.ym, b.ym) AS ym,
        |  COALESCE(rev_r, CAST(0 AS DECIMAL(12,2))) AS rev_r,
        |  COALESCE(rev_n, CAST(0 AS DECIMAL(12,2))) AS rev_n
        | FROM a FULL OUTER JOIN b ON a.ym = b.ym),
        |cum AS (
        | SELECT ym, rev_r, rev_n,
        |  SUM(rev_r) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_r,
        |  SUM(rev_n) OVER (ORDER BY ym ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        | FROM j)
        |SELECT ym, CAST(rev_r AS DOUBLE) AS rev_r, CAST(rev_n AS DOUBLE) AS rev_n,
        | CAST(cum_r AS DOUBLE) AS cum_r, CAST(cum_n AS DOUBLE) AS cum_n
        |FROM cum WHERE cum_r > cum_n ORDER BY ym""".stripMargin,

    "c08_deep_report" ->
      """WITH yearly AS (
        | SELECT CAST(year(l_shipdate) AS INT) AS yr,
        |  cn.n_name AS cust_nation, p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS rev,
        |  COUNT(*) AS n
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1, 2, 3)
        |SELECT y96.cust_nation, y96.p_brand,
        | y96.rev AS rev96, y96.n AS n96, y97.rev AS rev97, y97.n AS n97
        |FROM yearly y96 JOIN yearly y97
        |  ON y96.cust_nation = y97.cust_nation AND y96.p_brand = y97.p_brand
        | AND y96.yr = 1996 AND y97.yr = 1997
        |WHERE y97.rev <= y96.rev
        |ORDER BY y96.cust_nation, y96.p_brand""".stripMargin,

    "c09_frequent_best" ->
      """WITH lo AS (
        | SELECT l_partkey, o_custkey, o_orderdate,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS rev
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |freq AS (
        | SELECT l_partkey FROM lo WHERE year(o_orderdate) = 1996
        | GROUP BY l_partkey HAVING COUNT(*) > 4),
        |spend AS (
        | SELECT o_custkey, SUM(rev) AS spend FROM lo GROUP BY o_custkey),
        |best AS (
        | SELECT o_custkey FROM spend
        | WHERE CAST(spend AS DOUBLE) > (SELECT CAST(MAX(spend) AS DOUBLE) / 2 FROM spend))
        |SELECT CAST(month(o_orderdate) AS BIGINT) AS mth,
        | CAST(SUM(rev) AS DOUBLE) AS rev, COUNT(*) AS n
        |FROM lo
        |WHERE year(o_orderdate) = 1997
        |  AND l_partkey IN (SELECT l_partkey FROM freq)
        |  AND o_custkey IN (SELECT o_custkey FROM best)
        |GROUP BY 1 ORDER BY mth""".stripMargin,

    // c28 computes exactly c09's report (bucketing is physical layout,
    // not semantics) — its oracle is c09's SQL verbatim; c28r/c30r/
    // c31r (the 128-bucket re-graded rows) share the IDENTICAL
    // strings, because the re-bucket must change nothing but layout.
    "c28_colocated_frequent_best" -> colocFrequentBestSql,
    "c28r_rebucketed_join" -> colocFrequentBestSql,
    "c30r_rebucketed_window" -> colocWindowSql,
    "c31r_rebucketed_lookup" -> bucketLookupSql,

    "c10_having_count" ->
      """SELECT c_custkey, c_name, c_mktsegment, cnt
        |FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders
        |      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      GROUP BY o_custkey HAVING COUNT(*) BETWEEN 2 AND 5) t
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY cnt DESC, c_custkey""".stripMargin,

    "c11_channel_ratio" ->
      """WITH kept AS (
        | SELECT l_partkey,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS rev_kept
        | FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey),
        |ret AS (
        | SELECT l_partkey AS pk2,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS rev_ret
        | FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
        |SELECT l_partkey,
        | CAST(rev_kept AS DOUBLE) AS rev_kept,
        | COALESCE(CAST(rev_ret AS DOUBLE), 0.0) AS rev_ret,
        | COALESCE(CAST(rev_ret AS DOUBLE), 0.0) / CAST(rev_kept AS DOUBLE) AS ret_ratio
        |FROM kept LEFT JOIN ret ON l_partkey = pk2
        |ORDER BY l_partkey""".stripMargin,

    "c12_net_returns" ->
      """WITH sold AS (
        | SELECT l_orderkey, l_partkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sold_qty
        | FROM lineitem WHERE l_returnflag <> 'R'
        | GROUP BY l_orderkey, l_partkey),
        |ret AS (
        | SELECT l_orderkey AS ro, l_partkey AS rp,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS ret_qty
        | FROM lineitem WHERE l_returnflag = 'R'
        | GROUP BY l_orderkey, l_partkey)
        |SELECT l_orderkey, l_partkey, sold_qty,
        | COALESCE(ret_qty, 0.0) AS ret_qty,
        | sold_qty - COALESCE(ret_qty, 0.0) AS net_qty
        |FROM sold LEFT JOIN ret ON l_orderkey = ro AND l_partkey = rp
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "c13_monthly_deviation" ->
      """WITH monthly AS (
        | SELECT l_returnflag,
        |  CAST(year(l_shipdate) AS BIGINT) AS yr,
        |  CAST(month(l_shipdate) AS BIGINT) AS mth,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_dec
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1, 2, 3),
        |v1 AS (
        | SELECT l_returnflag, yr, mth,
        |  CAST(sum_dec AS DOUBLE) AS sum_sales,
        |  CAST(SUM(sum_dec) OVER (PARTITION BY l_returnflag, yr) AS DOUBLE)
        |    / COUNT(*) OVER (PARTITION BY l_returnflag, yr) AS avg_monthly,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY yr, mth) AS BIGINT) AS rn
        | FROM monthly)
        |SELECT v1.l_returnflag, v1.yr, v1.mth, v1.sum_sales,
        | v1.avg_monthly, v1_lag.sum_sales AS psum, v1_lead.sum_sales AS nsum
        |FROM v1, v1 v1_lag, v1 v1_lead
        |WHERE v1.l_returnflag = v1_lag.l_returnflag
        |  AND v1.l_returnflag = v1_lead.l_returnflag
        |  AND v1.rn = v1_lag.rn + 1 AND v1.rn = v1_lead.rn - 1
        |  AND v1.yr = 1997 AND v1.avg_monthly > 0
        |  AND abs(v1.sum_sales - v1.avg_monthly) / v1.avg_monthly > 0.1
        |ORDER BY v1.l_returnflag, v1.mth""".stripMargin,

    "c14_channel_topn_union" ->
      """WITH board AS (
        | SELECT l_returnflag AS flag, l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS rev
        | FROM lineitem WHERE l_returnflag IN ('R', 'N')
        | GROUP BY 1, 2),
        |ranked AS (
        | SELECT flag, l_partkey, rev,
        |  CAST(row_number() OVER (PARTITION BY flag ORDER BY rev DESC, l_partkey) AS BIGINT) AS rnk
        | FROM board)
        |SELECT CASE WHEN flag = 'R' THEN 'returned' ELSE 'kept' END AS channel,
        | rnk, l_partkey, rev
        |FROM ranked WHERE rnk <= 10
        |ORDER BY channel, rnk""".stripMargin,

    "c15_channel_profit_rollup" ->
      """WITH block AS (
        | SELECT CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' THEN 'y1996'
        |             WHEN l_shipdate < TIMESTAMP '1998-01-01' THEN 'y1997'
        |             ELSE 'y1998' END AS channel,
        |  l_suppkey, l_returnflag, l_extendedprice, l_discount
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1999-01-01'),
        |sales AS (
        | SELECT channel, l_suppkey AS id,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sales,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS profit
        | FROM block WHERE l_returnflag <> 'R' GROUP BY 1, 2),
        |rets AS (
        | SELECT channel, l_suppkey AS rid,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS returns,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS loss
        | FROM block WHERE l_returnflag = 'R' GROUP BY 1, 2),
        |joined AS (
        | SELECT sales.channel, id,
        |  sales,
        |  COALESCE(returns, CAST(0 AS DECIMAL(22,2))) AS returns,
        |  profit - COALESCE(loss, CAST(0 AS DECIMAL(31,4))) AS profit
        | FROM sales LEFT JOIN rets
        |   ON sales.channel = rets.channel AND id = rid)
        |SELECT channel, id,
        | CAST(SUM(sales) AS DOUBLE) AS sales,
        | CAST(SUM(returns) AS DOUBLE) AS returns,
        | CAST(SUM(profit) AS DOUBLE) AS profit
        |FROM joined
        |GROUP BY ROLLUP (channel, id)
        |ORDER BY channel ASC NULLS FIRST, id ASC NULLS FIRST""".stripMargin,

    "c16_multi_supplier_returns" ->
      """WITH multi AS (
        | SELECT l_orderkey FROM lineitem
        | GROUP BY 1 HAVING COUNT(DISTINCT l_suppkey) > 1)
        |SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS order_cnt,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(8,2))) AS DOUBLE) AS ship_cost,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS net_profit
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-05-01'
        |  AND l_shipdate < TIMESTAMP '1996-07-01'
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                                          WHERE n_name = 'NATION_3'))
        |  AND l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 0)
        |  AND l_orderkey IN (SELECT l_orderkey FROM multi)
        |  AND l_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     WHERE l_returnflag = 'R'
        |                       AND l_orderkey IN (SELECT l_orderkey FROM multi))""".stripMargin,

    "c17_cross_channel_tolerance" ->
      """WITH a AS (
        | SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS a_rev
        | FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
        |n AS (
        | SELECT l_partkey AS pk2,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS n_rev
        | FROM lineitem WHERE l_returnflag = 'N' GROUP BY 1),
        |r AS (
        | SELECT l_partkey AS pk3,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS r_rev
        | FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
        |SELECT l_partkey,
        | a_rev, a_rev / ((a_rev + n_rev + r_rev) / 3) * 100 AS a_dev,
        | n_rev, n_rev / ((a_rev + n_rev + r_rev) / 3) * 100 AS n_dev,
        | r_rev, r_rev / ((a_rev + n_rev + r_rev) / 3) * 100 AS r_dev,
        | (a_rev + n_rev + r_rev) / 3 AS average
        |FROM a JOIN n ON l_partkey = pk2 JOIN r ON l_partkey = pk3
        |WHERE a_rev BETWEEN 0.9 * n_rev AND 1.1 * n_rev
        |  AND a_rev BETWEEN 0.9 * r_rev AND 1.1 * r_rev
        |  AND n_rev BETWEEN 0.9 * a_rev AND 1.1 * a_rev
        |  AND n_rev BETWEEN 0.9 * r_rev AND 1.1 * r_rev
        |  AND r_rev BETWEEN 0.9 * a_rev AND 1.1 * a_rev
        |  AND r_rev BETWEEN 0.9 * n_rev AND 1.1 * n_rev
        |ORDER BY l_partkey""".stripMargin,

    "c18_weekly_dow_ratio" -> {
      val sums = (0 until 7).map(j =>
        s"SUM(CASE WHEN dow = $j THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS s$j")
        .mkString(",\n        |  ")
      val ratios = (0 until 7).map(j =>
        s"CAST(y2.s$j AS DOUBLE) / CAST(y1.s$j AS DOUBLE) AS r$j")
        .mkString(",\n        | ")
      val present = (0 until 7).map(j =>
        s"y1.s$j IS NOT NULL AND y2.s$j IS NOT NULL").mkString(" AND ")
      s"""WITH base AS (
        | SELECT DATE_DIFF('day', DATE '1994-12-26', CAST(o_orderdate AS DATE)) AS d,
        |  o_totalprice FROM orders),
        |weekly AS (
        | SELECT CAST(FLOOR(d / 7) AS BIGINT) AS wk,
        |  $sums
        | FROM (SELECT d, d % 7 AS dow, o_totalprice FROM base)
        | GROUP BY 1)
        |SELECT y1.wk,
        | $ratios
        |FROM weekly y1 JOIN weekly y2 ON y1.wk + 52 = y2.wk
        |WHERE $present
        |ORDER BY y1.wk""".stripMargin
    },

    "c19_channel_overlap" ->
      """WITH p96 AS (
        | SELECT DISTINCT o_custkey AS ck1, l_partkey AS pk1
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE year(o_orderdate) = 1996),
        |p97 AS (
        | SELECT DISTINCT o_custkey AS ck2, l_partkey AS pk2
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE year(o_orderdate) = 1997)
        |SELECT
        | CAST(SUM(CASE WHEN ck1 IS NOT NULL AND ck2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1996,
        | CAST(SUM(CASE WHEN ck1 IS NULL AND ck2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS only_1997,
        | CAST(SUM(CASE WHEN ck1 IS NOT NULL AND ck2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_years
        |FROM p96 FULL OUTER JOIN p97 ON ck1 = ck2 AND pk1 = pk2""".stripMargin,

    "c20_growth_compare" ->
      """WITH g AS (
        | SELECT o_custkey,
        |  SUM(CASE WHEN year(o_orderdate) = 1996 AND l_returnflag = 'N'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) END) AS s96n,
        |  SUM(CASE WHEN year(o_orderdate) = 1997 AND l_returnflag = 'N'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) END) AS s97n,
        |  SUM(CASE WHEN year(o_orderdate) = 1996 AND l_returnflag = 'R'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) END) AS s96r,
        |  SUM(CASE WHEN year(o_orderdate) = 1997 AND l_returnflag = 'R'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) END) AS s97r
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | GROUP BY o_custkey
        | HAVING s96n IS NOT NULL AND s97n IS NOT NULL
        |    AND s96r IS NOT NULL AND s97r IS NOT NULL)
        |SELECT o_custkey,
        | CAST(s96n AS DOUBLE) AS s96n, CAST(s97n AS DOUBLE) AS s97n,
        | CAST(s96r AS DOUBLE) AS s96r, CAST(s97r AS DOUBLE) AS s97r,
        | CAST(s97r AS DOUBLE) / CAST(s96r AS DOUBLE) AS growth_r,
        | CAST(s97n AS DOUBLE) / CAST(s96n AS DOUBLE) AS growth_n
        |FROM g
        |WHERE CAST(s97r AS DOUBLE) / CAST(s96r AS DOUBLE)
        |    > CAST(s97n AS DOUBLE) / CAST(s96n AS DOUBLE)
        |ORDER BY o_custkey""".stripMargin,

    "c21_restricted_channel_total" ->
      """WITH chan AS (
        | SELECT l_returnflag AS flag, p_brand,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS rev
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |   AND l_returnflag IN ('A', 'N', 'R')
        |   AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size < 10)
        | GROUP BY 1, 2)
        |SELECT p_brand,
        | CAST(SUM(rev) AS DOUBLE) AS total_rev,
        | COUNT(*) AS n_channels
        |FROM chan
        |GROUP BY p_brand
        |ORDER BY total_rev DESC, p_brand""".stripMargin,

    "c22_customer_retention_setops" ->
      """SELECT
        | (SELECT COUNT(*) FROM (
        |   SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |   INTERSECT
        |   SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |   INTERSECT
        |   SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)) AS n_all_three,
        | (SELECT COUNT(*) FROM (
        |   SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |   EXCEPT
        |   SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |   EXCEPT
        |   SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1998)) AS n_churned_96""".stripMargin,

    "c23_buy_return_resell" ->
      """WITH lo AS (
        | SELECT o_custkey AS ck, l_partkey AS pk, l_returnflag AS flag,
        |  year(o_orderdate) AS yr, l_quantity
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |bought AS (
        | SELECT ck, pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q_bought
        | FROM lo WHERE yr <= 1996 AND flag = 'N' GROUP BY 1, 2),
        |returned AS (
        | SELECT ck, pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q_ret
        | FROM lo WHERE yr <= 1996 AND flag = 'R' GROUP BY 1, 2),
        |resold AS (
        | SELECT pk, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q_resold
        | FROM lo WHERE yr >= 1997 AND flag = 'N' GROUP BY 1)
        |SELECT p_brand,
        | COUNT(*) AS n_pairs,
        | CAST(SUM(q_bought) AS DOUBLE) AS bought_qty,
        | CAST(SUM(q_ret) AS DOUBLE) AS ret_qty,
        | CAST(SUM(q_resold) AS DOUBLE) AS resold_qty
        |FROM bought
        | JOIN returned USING (ck, pk)
        | JOIN resold USING (pk)
        | JOIN part ON pk = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "c24_rollup_rank_within_parent" ->
      """WITH agg AS (
        | SELECT n_name, p_brand,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS rev,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
        |  CAST(GROUPING(n_name) + GROUPING(p_brand) AS BIGINT) AS lochierarchy,
        |  CAST(GROUPING(p_brand) AS BIGINT) AS g_brand
        | FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN part ON l_partkey = p_partkey
        | WHERE year(o_orderdate) = 1996
        | GROUP BY ROLLUP (n_name, p_brand)),
        |m AS (SELECT *, qty / rev AS margin FROM agg)
        |SELECT n_name, p_brand, rev, margin, lochierarchy,
        | CAST(rank() OVER (
        |   PARTITION BY lochierarchy,
        |     CASE WHEN g_brand = 0 THEN n_name END
        |   ORDER BY margin DESC, n_name ASC NULLS FIRST,
        |     p_brand ASC NULLS FIRST) AS BIGINT) AS rank_within_parent
        |FROM m
        |ORDER BY lochierarchy DESC, n_name ASC NULLS FIRST,
        | p_brand ASC NULLS FIRST""".stripMargin,

    "c25_monthly_pivot_report" -> {
      val months = (1 to 12).map(m =>
        f"CAST(SUM(CASE WHEN mth = $m THEN rev ELSE CAST(0 AS DECIMAL(21,4)) END) AS DOUBLE) AS rev_m$m%02d")
        .mkString(",\n        | ")
      s"""WITH sliced AS (
        | SELECT l_suppkey, month(l_shipdate) AS mth,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |   AND l_returnflag IN ('N', 'A'))
        |SELECT l_suppkey,
        | $months,
        | CAST(SUM(rev) AS DOUBLE) AS rev_total
        |FROM sliced
        |GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin
    },

    "c26_sales_returns_rollup" ->
      """WITH flows AS (
        | SELECT l_orderkey,
        |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS sales_amt,
        |  CAST(0 AS DECIMAL(21,4)) AS return_amt
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        | UNION ALL
        | SELECT l_orderkey,
        |  CAST(0 AS DECIMAL(21,4)) AS sales_amt,
        |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(21,4)) AS return_amt
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-01-01'
        |   AND l_returnflag = 'R'),
        |j AS (
        | SELECT
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'expedite'
        |       WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
        |       ELSE 'standard' END AS channel,
        |  n_name, sales_amt, return_amt
        | FROM flows, orders, customer, nation
        | WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |   AND c_nationkey = n_nationkey)
        |SELECT channel, n_name,
        | CAST(SUM(sales_amt) AS DOUBLE) AS sales,
        | CAST(SUM(return_amt) AS DOUBLE) AS returns,
        | CAST(SUM(sales_amt) - SUM(return_amt) AS DOUBLE) AS net,
        | COUNT(*) AS n_rows,
        | CAST(GROUPING(channel) AS BIGINT) AS g_channel,
        | CAST(GROUPING(n_name) AS BIGINT) AS g_nation
        |FROM j
        |GROUP BY ROLLUP (channel, n_name)
        |ORDER BY channel ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "c27_deep_rollup" ->
      """WITH pd AS (
        | SELECT p_partkey, p_type, p_brand,
        |  CAST(p_size // 10 AS BIGINT) AS sz_bucket, p_size
        | FROM part)
        |SELECT p_type, p_brand, sz_bucket, p_size,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
        |   / CAST(COUNT(*) AS DOUBLE) AS qoh,
        | COUNT(*) AS n
        |FROM lineitem JOIN pd ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY ROLLUP (p_type, p_brand, sz_bucket, p_size)
        |ORDER BY qoh, p_type ASC NULLS FIRST, p_brand ASC NULLS FIRST,
        | sz_bucket ASC NULLS FIRST, p_size ASC NULLS FIRST
        |LIMIT 100""".stripMargin,

    "c29_zorder_layout" -> zorderExactAuditSql("lineitem"),

    // c29c: the identical exact-audit SQL over the md5-elected ~1/8
    // row subset — the coin applies BEFORE the stats pass on both
    // engines, so the sampled audit is self-contained (see the Spark
    // side's rationale).
    "c29c_zorder_exact_sampled" -> zorderExactAuditSql(
      "(SELECT * FROM lineitem WHERE ('0x' || " +
        "substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || " +
        "CAST(l_linenumber AS VARCHAR) || ':zs1'), 1, 15))::BIGINT " +
        "% 8 = 0) li"),

    "c29b_zorder_sketch_cuts" -> {
      val z = (0 until 10).map(i =>
        s"(((npk >> $i) & 1) << ${2 * i + 1})" +
          s" + (((nsk >> $i) & 1) << ${2 * i})")
        .mkString("\n    + ")
      // Twin of the EXACT-regime sketch: below capacity the KLL cut at
      // q = i/32 is the smallest value whose rank reaches
      // max(1, ceil(q*N)) — replicated here with a rank scan; the
      // assignment (1 + number of cuts strictly below the key) is the
      // same fold the Spark side projects.
      def leg(name: String, key: String): String =
        s"""SELECT '$name' AS layout, f, COUNT(*) AS n_rows,
           |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
           |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max,
           |  CAST(CAST(MAX(l_partkey) - MIN(l_partkey) AS HUGEINT)
           |    * (MAX(l_suppkey) - MIN(l_suppkey)) AS DOUBLE)
           |   AS span_product
           | FROM (
           |  SELECT z.l_partkey, z.l_suppkey,
           |   CAST(1 + COUNT(c.c) AS BIGINT) AS f
           |  FROM zl z
           |  LEFT JOIN (
           |   SELECT MIN(r.$key) AS c
           |   FROM (SELECT range AS i FROM range(1, 32)) i
           |   JOIN (SELECT $key,
           |          row_number() OVER (ORDER BY $key) AS rn,
           |          COUNT(*) OVER () AS n
           |         FROM zl) r
           |     ON r.rn >= GREATEST(1,
           |          CAST(CEIL(i.i / 32.0 * r.n) AS BIGINT))
           |   GROUP BY i.i) c
           |    ON z.$key > c.c
           |  GROUP BY z.l_orderkey, z.l_linenumber,
           |           z.l_partkey, z.l_suppkey)
           | GROUP BY f""".stripMargin
      s"""WITH stats AS (
         | SELECT MIN(l_partkey) AS pkmn, MAX(l_partkey) AS pkmx,
         |  MIN(l_suppkey) AS skmn, MAX(l_suppkey) AS skmx
         | FROM lineitem),
         |nl AS (
         | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  CASE WHEN pkmx = pkmn THEN CAST(0 AS BIGINT)
         |   ELSE ((l_partkey - pkmn) * 1023) // (pkmx - pkmn) END AS npk,
         |  CASE WHEN skmx = skmn THEN CAST(0 AS BIGINT)
         |   ELSE ((l_suppkey - skmn) * 1023) // (skmx - skmn) END AS nsk
         | FROM lineitem CROSS JOIN stats),
         |zl AS (
         | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |  ($z) AS zk
         | FROM nl)
         |${leg("pk_sort", "l_partkey")}
         |UNION ALL
         |${leg("zorder", "zk")}
         |ORDER BY layout, f""".stripMargin
    },

    "c30_colocated_window" -> colocWindowSql,

    // Bucketing is physical layout only — the pruned scan must return
    // exactly what the plain parquet scan returns.
    "c31_bucket_pruned_lookup" -> bucketLookupSql
  )

  /** c29's exact-ntile audit SQL over a parameterized row source —
    * `src` is either `lineitem` (c29) or the md5-coin-filtered
    * subquery (c29c); everything downstream (stats, normalization,
    * z-interleave, exact tile math, bounding boxes) derives from the
    * same source on both engines. */
  private def zorderExactAuditSql(src: String): String = {
    val z = (0 until 10).map(i =>
      s"(((npk >> $i) & 1) << ${2 * i + 1})" +
        s" + (((nsk >> $i) & 1) << ${2 * i})")
      .mkString("\n    + ")
    def leg(name: String, key: String): String =
      s"""SELECT '$name' AS layout, f, COUNT(*) AS n_rows,
         |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
         |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max,
         |  CAST(CAST(MAX(l_partkey) - MIN(l_partkey) AS HUGEINT)
         |    * (MAX(l_suppkey) - MIN(l_suppkey)) AS DOUBLE)
         |   AS span_product
         | FROM (
         |  SELECT l_partkey, l_suppkey,
         |   CAST(CASE WHEN rn <= rem * (base + 1)
         |     THEN (rn - 1) // (base + 1) + 1
         |     ELSE rem + (rn - rem * (base + 1) - 1) // base + 1 END
         |    AS BIGINT) AS f
         |  FROM (
         |   SELECT l_partkey, l_suppkey,
         |    row_number() OVER
         |      (ORDER BY $key, l_orderkey, l_linenumber) AS rn,
         |    COUNT(*) OVER () // 32 AS base,
         |    COUNT(*) OVER () % 32 AS rem
         |   FROM zl))
         | GROUP BY f""".stripMargin
    s"""WITH stats AS (
       | SELECT MIN(l_partkey) AS pkmn, MAX(l_partkey) AS pkmx,
       |  MIN(l_suppkey) AS skmn, MAX(l_suppkey) AS skmx
       | FROM $src),
       |nl AS (
       | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  CASE WHEN pkmx = pkmn THEN CAST(0 AS BIGINT)
       |   ELSE ((l_partkey - pkmn) * 1023) // (pkmx - pkmn) END AS npk,
       |  CASE WHEN skmx = skmn THEN CAST(0 AS BIGINT)
       |   ELSE ((l_suppkey - skmn) * 1023) // (skmx - skmn) END AS nsk
       | FROM $src CROSS JOIN stats),
       |zl AS (
       | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |  ($z) AS zk
       | FROM nl)
       |${leg("pk_sort", "l_partkey")}
       |UNION ALL
       |${leg("zorder", "zk")}
       |ORDER BY layout, f""".stripMargin
  }

  /** Shared oracle SQL for the bucketed family, used verbatim by both
    * the 32-bucket graded rows (c28/c30/c31) and their 128-bucket
    * re-graded twins (c28r/c30r/c31r): bucket layout may never change
    * a row. */
  private val colocFrequentBestSql =
    """WITH lo AS (
      | SELECT l_partkey, o_custkey, o_orderdate,
      |  CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS rev
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |freq AS (
      | SELECT l_partkey FROM lo WHERE year(o_orderdate) = 1996
      | GROUP BY l_partkey HAVING COUNT(*) > 4),
      |spend AS (
      | SELECT o_custkey, SUM(rev) AS spend FROM lo GROUP BY o_custkey),
      |best AS (
      | SELECT o_custkey FROM spend
      | WHERE CAST(spend AS DOUBLE) > (SELECT CAST(MAX(spend) AS DOUBLE) / 2 FROM spend))
      |SELECT CAST(month(o_orderdate) AS BIGINT) AS mth,
      | CAST(SUM(rev) AS DOUBLE) AS rev, COUNT(*) AS n
      |FROM lo
      |WHERE year(o_orderdate) = 1997
      |  AND l_partkey IN (SELECT l_partkey FROM freq)
      |  AND o_custkey IN (SELECT o_custkey FROM best)
      |GROUP BY 1 ORDER BY mth""".stripMargin

  private val colocWindowSql =
    """SELECT l_orderkey, l_linenumber,
      | CAST(row_number() OVER w AS BIGINT) AS line_seq,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) OVER
      |   (PARTITION BY l_orderkey ORDER BY l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |   AS DOUBLE) AS run_amount
      |FROM lineitem WHERE l_orderkey <= 2000
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  private val bucketLookupSql =
    """SELECT l_orderkey, COUNT(*) AS n_lines,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |   AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |   AS sum_price
      |FROM lineitem WHERE l_orderkey IN (1, 7, 33, 129)
      |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin
}
