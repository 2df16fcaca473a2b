package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dx._

/** Subquery / join-shape breadth:
  *  - EXISTS / NOT EXISTS (TPC-H q4/q21 shapes — semi/anti with non-equi
  *    conditions; reference runs them via DataFusion decorrelation,
  *    `benchmarks/queries/q4.sql`, `q21.sql`);
  *  - null-aware NOT IN — the reference's only custom logical rewrite
  *    (`core/src/optimizer.rs:73-90`) with its regression suite
  *    (`ballista/client/tests/null_aware.rs:144-149`). Spark plans the
  *    single-column case as a null-aware anti join natively; both the
  *    NULL-present and NULL-free cases are pinned here;
  *  - theta (non-equi) joins → BroadcastNestedLoopJoin
  *    (`NestedLoopJoinExec`, TPC-H q22 census ×2) and a pure cross join;
  *  - remaining expressible TPC-H: q4, q8, q15 adapted to the synthetic
  *    schema (q21 is the j02 NOT EXISTS).
  *
  * The NOT IN cases run through `spark.sql` so the analyzer exercises the
  * actual null-aware-anti-join planning path.
  */
object Subqueries {

  private def view(s: SparkSession, dir: String, t: String): Unit =
    Tables.load(s, dir, t).createOrReplaceTempView(t)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q4 shape: EXISTS correlated subquery with extra non-equi condition.
    "j01_exists_q4" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = Tables.load(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    // q21 shape: semi on other-supplier lineitem, anti on later-shipping
    // other-supplier lineitem.
    "j02_not_exists_q21" -> { (s, dir) =>
      val sup = Tables.load(s, dir, "supplier")
      val l1 = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val l2 = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("l2_orderkey"),
          col("l_suppkey").as("l2_suppkey"))
      val l3 = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("l3_orderkey"),
          col("l_suppkey").as("l3_suppkey"),
          col("l_shipdate").as("l3_shipdate"))
      sup.join(l1, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(l2, col("l2_orderkey") === col("l_orderkey") &&
          col("l2_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("l3_orderkey") === col("l_orderkey") &&
          col("l3_suppkey") =!= col("l_suppkey") &&
          col("l3_shipdate") > col("l_shipdate"), "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },

    // q8 shape: market share of one supplier nation within a region.
    "j03_mktshare_q8" -> { (s, dir) =>
      val r = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
      val nCust = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
      val nSupp = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      r.join(nCust, col("r_regionkey") === col("n_regionkey"))
        .join(c, col("c_nationkey") === col("cn_key"))
        .join(o, col("o_custkey") === col("c_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("s_suppkey") === col("l_suppkey"))
        .join(nSupp, col("s_nationkey") === col("sn_key"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy(col("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_1",
            discounted(col("l_extendedprice"), col("l_discount")))
            .otherwise(dec(lit(0)))).cast("double") /
          sum(discounted(col("l_extendedprice"), col("l_discount")))
            .cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },

    // q15 shape: top supplier(s) by revenue — agg-of-agg via exact decimal
    // equality against the max.
    "j04_top_supplier_q15" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      val rev = l.groupBy(col("l_suppkey"))
        .agg(sum(discounted(col("l_extendedprice"), col("l_discount")))
          .as("total_rev"))
      val maxRev = rev.agg(max(col("total_rev")).as("max_rev"))
      val sup = Tables.load(s, dir, "supplier")
      sup.join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(maxRev, col("total_rev") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    "j05_notin_clean" -> { (s, dir) =>
      // NOT IN, subquery side has no NULLs -> plain anti join.
      view(s, dir, "customer"); view(s, dir, "orders")
      s.sql("""
        SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY c_nationkey ORDER BY nk
      """)
    },

    "j06_notin_nulls" -> { (s, dir) =>
      // NOT IN, subquery side CONTAINS NULLs -> three-valued logic: no row
      // qualifies; both engines must return the single count 0.
      view(s, dir, "customer"); view(s, dir, "orders")
      s.sql("""
        SELECT COUNT(*) AS n_cust
        FROM customer
        WHERE c_custkey NOT IN
          (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
           FROM orders WHERE o_totalprice > 300000)
      """)
    },

    "j11_notin_rewrite_clean" -> { (s, dir) =>
      // Reference NotInSubqueryRewrite shape (core/src/optimizer.rs:73-90)
      // — must return exactly what the native NOT IN (j05 oracle) returns.
      val c = Tables.load(s, dir, "customer")
      val sub = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      graft.operators.NotInRewrite.notIn(c, col("c_custkey"), sub)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("nk"))
    },

    "j12_notin_rewrite_nulls" -> { (s, dir) =>
      // NULL on the subquery side: three-valued logic must yield zero rows.
      val c = Tables.load(s, dir, "customer")
      val sub = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 300000)
        .select(when(col("o_orderkey") % 97 === 0, lit(null))
          .otherwise(col("o_custkey")).as("o_custkey"))
      graft.operators.NotInRewrite.notIn(c, col("c_custkey"), sub)
        .agg(count(lit(1)).as("n_cust"))
    },

    "j07_in_subquery" -> { (s, dir) =>
      view(s, dir, "customer"); view(s, dir, "orders")
      s.sql("""
        SELECT c_mktsegment, COUNT(*) AS n_cust
        FROM customer
        WHERE c_custkey IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment ORDER BY c_mktsegment
      """)
    },

    "j08_theta_nlj" -> { (s, dir) =>
      // Pure non-equi self join -> BroadcastNestedLoopJoin
      // (reference NestedLoopJoinExec).
      val a = Tables.load(s, dir, "supplier")
        .select(col("s_suppkey").as("a_key"), col("s_acctbal").as("a_bal"),
          col("s_nationkey").as("a_nk"))
      val b = Tables.load(s, dir, "supplier")
        .select(col("s_acctbal").as("b_bal"))
      a.join(b, col("a_bal") < col("b_bal"))
        .groupBy(col("a_nk"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("a_nk"))
    },

    "j09_cross_join" -> { (s, dir) =>
      val sup = Tables.load(s, dir, "supplier")
      val r = Tables.load(s, dir, "region")
      sup.crossJoin(r)
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("bal_sum"))
        .orderBy(col("r_name"))
    },

    "j10_scalar_subquery" -> { (s, dir) =>
      view(s, dir, "orders")
      s.sql("""
        SELECT o_orderpriority, COUNT(*) AS n_above
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                                     / COUNT(*) FROM orders)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
      """)
    },

    "j13_lateral_topn" -> { (s, dir) =>
      // Correlated LATERAL subquery with per-row LIMIT (the reference's
      // NestedLoopJoin census row exercised through the SQL front-end):
      // top-2 orders per customer. Spark decorrelates this into a ranked
      // join — same rows as the window top-N, expressed the SQL-standard
      // LATERAL way. Identical text runs on DuckDB.
      view(s, dir, "customer"); view(s, dir, "orders")
      s.sql(sqlLateral)
    },

    "j14_correlated_scalar" -> { (s, dir) =>
      // CORRELATED scalar subqueries (the TPC-DS q1 shape: rows above
      // their own group's average — ≙ `benchmarks/queries/` decorrelation
      // coverage): customers whose returned revenue exceeds 1.2× their
      // nation's average. Catalyst decorrelates both correlated
      // aggregates into one grouped join — no per-row re-execution. The
      // comparison cross-multiplies in exact DECIMAL/integer arithmetic
      // (10·ret·cnt > 12·sum ⇔ ret > 1.2·avg) so no float average
      // decides a row. Identical text runs on DuckDB.
      view(s, dir, "customer"); view(s, dir, "orders")
      view(s, dir, "lineitem")
      s.sql(sqlCorrelatedScalar)
    }
  )

  private val sqlLateral =
    """SELECT c_custkey, t.o_orderkey,
      | CAST(t.o_totalprice AS DOUBLE) AS o_totalprice
      |FROM customer,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |         WHERE o_custkey = c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey < 200
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  private val sqlCorrelatedScalar =
    """WITH percust AS (
      | SELECT c_custkey, c_nationkey,
      |  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS ret
      | FROM customer
      |  JOIN orders ON o_custkey = c_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      | WHERE l_returnflag = 'R'
      | GROUP BY c_custkey, c_nationkey)
      |SELECT c_custkey, c_nationkey, CAST(ret AS DOUBLE) AS returned
      |FROM percust p1
      |WHERE 10 * ret * (SELECT COUNT(*) FROM percust p2
      |                  WHERE p2.c_nationkey = p1.c_nationkey)
      |    > 12 * (SELECT SUM(ret) FROM percust p2
      |            WHERE p2.c_nationkey = p1.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  def oracle: Map[String, String] = Map(
    "j01_exists_q4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j02_not_exists_q21" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "j03_mktshare_q8" ->
      """SELECT year(o_orderdate) AS o_year,
        | CAST(SUM(CASE WHEN n2.n_name = 'NATION_1'
        |   THEN CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))
        |   ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE)
        |  AS mkt_share
        |FROM region, nation n1, customer, orders, lineitem, supplier, nation n2
        |WHERE r_name = 'ASIA' AND r_regionkey = n1.n_regionkey
        |  AND c_nationkey = n1.n_nationkey AND o_custkey = c_custkey
        |  AND l_orderkey = o_orderkey AND s_suppkey = l_suppkey
        |  AND s_nationkey = n2.n_nationkey
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "j04_top_supplier_q15" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |   AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "j05_notin_clean" ->
      """SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY c_nationkey ORDER BY nk""".stripMargin,

    "j06_notin_nulls" ->
      """SELECT COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
        |   FROM orders WHERE o_totalprice > 300000)""".stripMargin,

    "j11_notin_rewrite_clean" ->
      """SELECT c_nationkey AS nk, COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |GROUP BY c_nationkey ORDER BY nk""".stripMargin,

    "j12_notin_rewrite_nulls" ->
      """SELECT COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
        |   FROM orders WHERE o_totalprice > 300000)""".stripMargin,

    "j07_in_subquery" ->
      """SELECT c_mktsegment, COUNT(*) AS n_cust
        |FROM customer
        |WHERE c_custkey IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "j08_theta_nlj" ->
      """SELECT a.s_nationkey AS a_nk, COUNT(*) AS n_pairs
        |FROM supplier a JOIN supplier b ON a.s_acctbal < b.s_acctbal
        |GROUP BY a.s_nationkey ORDER BY a_nk""".stripMargin,

    "j09_cross_join" ->
      """SELECT r_name, COUNT(*) AS n,
        | CAST(SUM(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal_sum
        |FROM supplier, region
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "j10_scalar_subquery" ->
      """SELECT o_orderpriority, COUNT(*) AS n_above
        |FROM orders
        |WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |                             / COUNT(*) FROM orders)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j13_lateral_topn" -> sqlLateral,
    "j14_correlated_scalar" -> sqlCorrelatedScalar
  )
}
