package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Set operations — reference surface: UNION/UNION ALL
  * (`ballista/client/tests/context_basic.rs:171`, union stage splitting
  * `scheduler/src/planner.rs:218-237`); INTERSECT/EXCEPT lower to semi/anti
  * joins in DataFusion's logical optimizer — Spark plans them the same way
  * (LeftSemi/LeftAnti with distinct), including the ALL variants.
  */
object SetOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_union_all" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val b = o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"))
      a.unionAll(b).orderBy(col("o_orderkey"), col("o_orderstatus"))
    },

    "s02_union_distinct" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    },

    "s03_intersect" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    },

    "s04_except" -> { (s, dir) =>
      val c = Tables.load(s, dir, "customer").select(col("c_custkey"))
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      c.except(o).orderBy(col("c_custkey"))
    },

    "s05_intersect_all" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersectAll(b).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("o_custkey"))
    },

    "s06_except_all" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.exceptAll(b).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy(col("o_custkey"))
    },

    "s07_union_by_name" -> { (s, dir) =>
      // Schema-aligned union with null-fill for missing columns —
      // Spark's unionByName(allowMissingColumns) == DuckDB's
      // UNION ALL BY NAME. The mixed-schema append every multi-source
      // ingest hits (one source lacks a column).
      val o = Tables.load(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice").cast("double").as("price"))
      val b = o.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_custkey")) // no price column
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("o_orderkey"),
          col("price").asc_nulls_first)
    }
  )

  def oracle: Map[String, String] = Map(
    "s01_union_all" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey, o_orderstatus""".stripMargin,

    "s02_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "s03_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin,

    "s04_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY c_custkey""".stripMargin,

    "s05_intersect_all" ->
      """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        | SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        | INTERSECT ALL
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "s06_except_all" ->
      """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        | SELECT o_custkey FROM orders WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        | EXCEPT ALL
        | SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "s07_union_by_name" ->
      """SELECT * FROM (
        | SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
        | FROM orders WHERE o_orderpriority = '1-URGENT'
        | UNION ALL BY NAME
        | SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY o_orderkey, price NULLS FIRST""".stripMargin
  )
}
