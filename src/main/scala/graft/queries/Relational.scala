package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dx._

/** Relational core — TPC-H-shaped queries adapted to the driver's synthetic
  * star schema (TESTDATA.md; fewer columns than spec TPC-H, no partsupp).
  *
  * Parity target: the reference runs TPC-H 22/22 with a differential oracle
  * (`benchmarks/src/bin/tpch.rs:552-692`); we mirror the same spine with
  * DuckDB as the oracle. Each query exercises a row of SURVEY.md §2B:
  * scan+filter+two-phase agg (q1), SMJ join + TopK (q3), 6-way join (q5),
  * selective filter agg (q6), join with derived grouping (q7), multi-join
  * agg (q9), outer join + distribution (q13), conditional agg (q14),
  * correlated-subquery-as-join (q17), HAVING semi-join (q18), disjunctive
  * predicates (q19), anti join + scalar subquery (q22).
  *
  * Every double aggregate routes through [[Dx]] decimal math so results are
  * order-independent and hash-match the oracle bit-for-bit; every query ends
  * in a deterministic ORDER BY with a unique tiebreaker.
  */
object Relational {

  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Derived `partsupp` — the driver's synthetic schema ships no
    * partsupp table, which blocked the last four TPC-H adaptations
    * (q2/q11/q16/q20). One row per distinct (l_partkey, l_suppkey)
    * supplying pair actually observed in lineitem; availqty and
    * supplycost are md5-derived from the pair key into the TPC-H value
    * ranges (1..9999 and 1.00..1000.99). Every arithmetic step is
    * integer-exact and mirrored verbatim in the oracle CTE
    * [[partsuppCte]], so both engines derive the identical table — the
    * derivation replaces dbgen, not the query shapes. ≙ the reference
    * registering partsupp like any other listing table
    * (`benchmarks/src/bin/tpch.rs` TABLES). */
  private def derivePartsupp(s: SparkSession, dir: String): DataFrame = {
    val key = concat(col("ps_partkey").cast("string"), lit(":"),
      col("ps_suppkey").cast("string"))
    def h(c: Column): Column =
      conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
    Tables.load(s, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty", h(key) % 9999L + 1L)
      .withColumn("ps_supplycost",
        (h(concat(key, lit(":sc"))) % 100000L).cast("double") / 100.0 + 1.0)
  }

  /** The derivation MATERIALIZED as a real catalog table, bucketed on
    * ps_partkey (32 buckets, the session parallelism — c28's
    * discipline), built once per (session, sfDir) and read by all four
    * consumers. ≙ the reference registering partsupp as a listing
    * table next to the dbgen eight (`context_checks.rs:381-408`,
    * `benchmarks/src/bin/tpch.rs` TABLES): queries see a TABLE SCAN,
    * not a per-query distinct-over-lineitem subplan, and the
    * ps_partkey bucketing means q2/q16/q20's part ⋈ partsupp probes
    * shuffle only the (smaller) part side — at 100 TB the derivation
    * cost is paid once per corpus version, not once per query. The
    * oracle CTE [[partsuppCte]] recomputes the identical rows, so
    * hashes are unchanged. */
  private def partsupp(s: SparkSession, dir: String): DataFrame =
    CatalogPublish.bucketed(s,
      table = s"graft_ps_bkt_${dir.replaceAll("[^A-Za-z0-9]", "_")}",
      src = new java.io.File(s"$dir/lineitem.parquet"),
      family = "graft_ps_bkt",
      df = derivePartsupp(s, dir), buckets = 32, key = "ps_partkey")

  /** DuckDB twin of [[partsupp]] (prepend under WITH). */
  private val partsuppCte: String =
    """partsupp AS (
      | SELECT ps_partkey, ps_suppkey,
      |  (('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || ':' ||
      |     CAST(ps_suppkey AS VARCHAR)), 1, 15))::BIGINT % 9999 + 1)
      |    AS ps_availqty,
      |  ((('0x' || substr(md5(CAST(ps_partkey AS VARCHAR) || ':' ||
      |     CAST(ps_suppkey AS VARCHAR) || ':sc'), 1, 15))::BIGINT % 100000)
      |    / 100.0 + 1.0) AS ps_supplycost
      | FROM (SELECT DISTINCT l_partkey AS ps_partkey,
      |        l_suppkey AS ps_suppkey FROM lineitem))""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= ts("2000-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(charged(col("l_extendedprice"), col("l_discount"), col("l_tax")))
            .cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    "q3_topk" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < ts("1998-07-01"))
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") > ts("1998-07-01"))
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    "q5_join6" -> { (s, dir) =>
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
                col("o_orderdate") < ts("1997-01-01"))
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      r.join(n, col("r_regionkey") === col("n_regionkey"))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
                   col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    "q6_filter_agg" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1997-01-01") &&
                col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
                col("l_quantity") < 25)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"), 8))
          .cast("double").as("revenue"))
    },

    "q7_volume" -> { (s, dir) =>
      val sup = Tables.load(s, dir, "supplier")
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
                col("l_shipdate") < ts("1998-01-01"))
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n1 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      sup.join(l, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("volume"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    "q9_profit" -> { (s, dir) =>
      val p = Tables.load(s, dir, "part").filter(col("p_name").contains("gear"))
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      val o = Tables.load(s, dir, "orders")
      val n = Tables.load(s, dir, "nation")
      p.join(l, col("p_partkey") === col("l_partkey"))
        .join(sup, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    "q10_returns" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("1996-10-01") &&
                col("o_orderdate") < ts("1997-01-01"))
      val l = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = Tables.load(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    "q12_late_ship" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
            .otherwise(0L)).as("late_count"),
          sum(when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
            .otherwise(0L)).as("ontime_count"))
        .orderBy(col("o_orderpriority"))
    },

    "q13_custdist" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") =!= "P")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    "q14_promo" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-03-01") &&
                col("l_shipdate") < ts("1996-04-01"))
      val p = Tables.load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) * sum(when(col("p_type") === "PROMO",
              discounted(col("l_extendedprice"), col("l_discount")))
              .otherwise(dec(lit(0)))).cast("double")
            / sum(discounted(col("l_extendedprice"), col("l_discount")))
              .cast("double")).as("promo_revenue"))
    },

    "q17_small_qty" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part").filter(col("p_brand") === "Brand#3")
      val avgQty = l.groupBy(col("l_partkey").as("a_partkey"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    "q18_large_orders" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey").as("b_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("b_qty"))
        .filter(col("b_qty") > 150)
        .select(col("b_orderkey"))
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("b_orderkey"), "left_semi")
        .join(Tables.load(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    "q19_disjunctive" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("l_quantity") >= 1 &&
          col("l_quantity") <= 11 && col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#2" && col("l_quantity") >= 10 &&
          col("l_quantity") <= 20 && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#3" && col("l_quantity") >= 20 &&
          col("l_quantity") <= 30 && col("p_size").between(1, 15))))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
    },

    "q22_anti" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= ts("2000-01-01"))
      val posAvg = c.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("pos_avg"))
      c.crossJoin(posAvg)
        .filter(col("c_acctbal") > col("pos_avg"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntry"))
    },

    "q2_min_cost_supplier" -> { (s, dir) =>
      // TPC-H q2 shape over the derived partsupp: min-cost-supplier
      // correlated subquery, decorrelated as a per-part MIN over the
      // EUROPE supplying pairs joined back on (part, cost) equality.
      // Cost equality is safe across engines: both derive the identical
      // double from the same integer hash. Adapted filters (synthetic
      // schema): p_type LIKE '%RGE' ≙ '%BRASS', output drops the
      // columns the schema lacks (p_mfgr, s_address, s_phone,
      // s_comment).
      val ps = partsupp(s, dir)
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
        .filter(col("r_name") === "EUROPE")
      val p = Tables.load(s, dir, "part")
        .filter(col("p_size") === 15 && col("p_type").like("%RGE"))
      // EUROPE supplying pairs — shared by the min and the join-back.
      val eur = ps.join(sup, col("ps_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
        .join(reg, col("n_regionkey") === col("r_regionkey"))
      val minCost = eur.groupBy(col("ps_partkey").as("m_partkey"))
        .agg(min(col("ps_supplycost")).as("min_cost"))
      eur.join(p, col("p_partkey") === col("ps_partkey"))
        .join(minCost, col("p_partkey") === col("m_partkey") &&
          col("ps_supplycost") === col("min_cost"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    "q11_important_stock" -> { (s, dir) =>
      // TPC-H q11 shape: per-part inventory value in one nation,
      // HAVING a share-of-total threshold. Decimal discipline end to
      // end; the 0.0001 share test is the integer-exact equivalent
      // `value * 10000 > total` in BOTH engines (no float threshold).
      val ps = partsupp(s, dir)
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
        .filter(col("n_name") === "NATION_7")
      val joined = ps.join(sup, col("ps_suppkey") === col("s_suppkey"))
        .join(nat, col("s_nationkey") === col("n_nationkey"))
      val value = sum(dec(col("ps_supplycost")) * col("ps_availqty"))
      val perPart = joined.groupBy(col("ps_partkey")).agg(value.as("vdec"))
      val total = joined.agg(value.as("tdec"))
      perPart.crossJoin(total)
        .filter(col("vdec") * 10000 > col("tdec"))
        .select(col("ps_partkey"), col("vdec").cast("double").as("value"))
        .orderBy(col("value").desc, col("ps_partkey"))
    },

    "q16_supplier_cnt" -> { (s, dir) =>
      // TPC-H q16 shape: supplier counts per (brand, type, size) with a
      // NOT IN supplier exclusion. s_suppkey is non-nullable, so NOT IN
      // ≡ anti join (the null-aware NOT IN path is exercised by
      // j05–j07 / NotInRewrite); exclusion predicate adapted to the
      // synthetic schema (s_acctbal < 500 ≙ the comment LIKE).
      val ps = partsupp(s, dir)
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#4" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9))
      val excl = Tables.load(s, dir, "supplier")
        .filter(col("s_acctbal") < 500.0).select(col("s_suppkey"))
      ps.join(p, col("p_partkey") === col("ps_partkey"))
        .join(excl, col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    "q20_potential_promo" -> { (s, dir) =>
      // TPC-H q20 shape: the semi-join chain (supplier IN … partsupp
      // IN … part) with the correlated half-of-shipped-quantity test,
      // decorrelated as a grouped lineitem aggregate joined on the
      // (part, supplier) pair. The 0.5 factor is the integer-exact
      // `2 * availqty > sum(qty)` in BOTH engines; pairs with no 1996
      // shipments drop in both (NULL comparison ≡ inner join).
      val ps = partsupp(s, dir)
      val promoParts = Tables.load(s, dir, "part")
        .filter(col("p_name").like("small%")).select(col("p_partkey"))
      val shipped = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
      val qualified = ps
        .join(promoParts, col("ps_partkey") === col("p_partkey"),
          "left_semi")
        .join(shipped, col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
        .filter(col("ps_availqty") * 2 > col("qty_dec"))
        .select(col("ps_suppkey"))
      Tables.load(s, dir, "supplier")
        .join(qualified, col("s_suppkey") === col("ps_suppkey"),
          "left_semi")
        .join(Tables.load(s, dir, "nation")
          .filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }
  )

  /** DuckDB equivalents — identical decimal routing and aliases. */
  def oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) * CAST(1 + l_tax AS DECIMAL(8,2))) AS DOUBLE) AS sum_charge,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey, o_orderdate,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_join6" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM region, nation, customer, orders, lineitem, supplier
        |WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
        |  AND n_nationkey = c_nationkey AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = c_nationkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_filter_agg" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 25""".stripMargin,

    "q7_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(SUM(volume) AS DOUBLE) AS volume
        |FROM (
        | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |   year(l_shipdate) AS l_year,
        |   CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2)) AS volume
        | FROM supplier, lineitem, orders, customer, nation n1, nation n2
        | WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |   AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |   AND c_nationkey = n2.n_nationkey
        |   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |   AND l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1998-01-01') t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q9_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_profit
        |FROM part, lineitem, supplier, orders, nation
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |  AND p_name LIKE '%gear%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q10_returns" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_late_ship" ->
      """SELECT o_orderpriority,
        | CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
        | CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS ontime_count
        |FROM orders, lineitem WHERE o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders
        |   ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        | GROUP BY c_custkey) a
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q14_promo" ->
      """SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
        |   THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
        |   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        | / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q17_small_qty" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#3'
        |JOIN (SELECT l_partkey AS a_partkey,
        |        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a ON l_partkey = a_partkey
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |   SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |   HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q19_disjunctive" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey AND (
        |  (p_brand = 'Brand#1' AND l_quantity >= 1 AND l_quantity <= 11 AND p_size BETWEEN 1 AND 5)
        |  OR (p_brand = 'Brand#2' AND l_quantity >= 10 AND l_quantity <= 20 AND p_size BETWEEN 1 AND 10)
        |  OR (p_brand = 'Brand#3' AND l_quantity >= 20 AND l_quantity <= 30 AND p_size BETWEEN 1 AND 15))""".stripMargin,

    "q22_anti" ->
      """SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |   SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        |   FROM customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY cntry""".stripMargin,

    "q2_min_cost_supplier" ->
      s"""WITH $partsuppCte
         |SELECT s_acctbal, s_name, n_name, p_partkey
         |FROM part, supplier, partsupp, nation, region
         |WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
         |  AND p_size = 15 AND p_type LIKE '%RGE'
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'EUROPE'
         |  AND ps_supplycost = (
         |    SELECT min(ps2.ps_supplycost)
         |    FROM partsupp ps2, supplier s2, nation n2, region r2
         |    WHERE p_partkey = ps2.ps_partkey
         |      AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey
         |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH $partsuppCte,
         |filt AS (
         | SELECT ps_partkey, ps_supplycost, ps_availqty
         | FROM partsupp, supplier, nation
         | WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |   AND n_name = 'NATION_7')
         |SELECT ps_partkey,
         | CAST(SUM(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty)
         |   AS DOUBLE) AS value
         |FROM filt
         |GROUP BY ps_partkey
         |HAVING SUM(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty)
         |   * 10000 >
         |  (SELECT SUM(CAST(ps_supplycost AS DECIMAL(12,2)) * ps_availqty)
         |   FROM filt)
         |ORDER BY value DESC, ps_partkey""".stripMargin,

    "q16_supplier_cnt" ->
      s"""WITH $partsuppCte
         |SELECT p_brand, p_type, p_size,
         | COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp, part
         |WHERE p_partkey = ps_partkey AND p_brand <> 'Brand#4'
         |  AND p_type NOT LIKE 'MEDIUM%'
         |  AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
         |  AND ps_suppkey NOT IN (
         |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 500.0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q20_potential_promo" ->
      s"""WITH $partsuppCte
         |SELECT s_name, s_acctbal
         |FROM supplier, nation
         |WHERE s_suppkey IN (
         |  SELECT ps_suppkey FROM partsupp
         |  WHERE ps_partkey IN (
         |     SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
         |    AND 2 * ps_availqty > (
         |      SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
         |      FROM lineitem
         |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |        AND l_shipdate >= TIMESTAMP '1996-01-01'
         |        AND l_shipdate < TIMESTAMP '1997-01-01'))
         |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
         |ORDER BY s_name""".stripMargin
  )
}
