package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dx._

/** TPC-DS-class composite shapes — the reference's TPC-DS corpus leans on
  * channel-union + ROLLUP reports (q5/q77/q80), windowed top-k over joined
  * aggregates (q67), and EXISTS/NOT-EXISTS chains (q10/q35)
  * (`benchmarks/queries-tpcds/`). Re-expressed on the synthetic schema,
  * each combining several §2B rows in one plan.
  */
object Composite {

  private def ts(s: String) = lit(s).cast("timestamp")

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
    }
  )

  def oracle: Map[String, String] = Map(
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
        |ORDER BY r96.mth""".stripMargin
  )
}
