package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Operational surface — EXPLAIN / EXPLAIN ANALYZE / SET-SHOW analogues
  * (reference: `DistributedExplainAnalyzeExec` result table
  * `context_checks.rs:1129`, EXPLAIN `context_checks.rs:1072`, config
  * SET/SHOW `context_checks.rs:239-336`).
  *
  * These results are engine-specific by nature (operator names, metric
  * names, config keys), so there is no DuckDB oracle — the driver records
  * its rows-only check. The scalatest suite pins the semantics.
  */
object Ops {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x01_explain_analyze" -> { (s, dir) =>
      // Per-operator metrics of an executed aggregation — EXPLAIN ANALYZE.
      val df = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      graft.plans.ExplainAnalyze.run(s, df)
        .filter(col("metric") === "numOutputRows")
        .orderBy(col("node_id"))
    },

    "x02_explain_plan" -> { (s, dir) =>
      // EXPLAIN as a result set: the physical plan rows of a join query.
      val df = Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
      import s.implicits._
      df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        .replaceAll("#\\d+", "#N")           // expression ids vary per
        .replaceAll("plan_id=\\d+", "plan_id=N") // session — normalize
        .linesIterator.toSeq.zipWithIndex
        .map { case (l, i) => (i.toLong, l) }
        .toDF("line_no", "plan_line")
    },

    "x03_set_show" -> { (s, dir) =>
      // SET -v style config listing, filtered to the profile's knobs.
      s.sql("SET")
        .filter(col("key").startsWith("spark.sql.adaptive") ||
          col("key") === "spark.sql.autoBroadcastJoinThreshold")
        .orderBy(col("key"))
    },

    "x05_sql_front" -> { (s, dir) =>
      // The reference's PRIMARY interface is SQL text over registered
      // tables (SessionContext::sql everywhere in its client tests);
      // every other graded query here uses the DataFrame API, so this one
      // goes through `spark.sql` end-to-end on a registered catalog —
      // same ANSI text the DuckDB oracle runs, TPC-H q1 shape.
      Tables.registerAll(s, dir)
      s.sql(sqlQ1)
    },

    "x04_show_tables" -> { (s, dir) =>
      // Catalog listing (reference: should_execute_show_tables /
      // test_ballista_show_tables) over the registered source tables.
      Tables.registerAll(s, dir)
      s.sql("SHOW TABLES")
        .select(col("tableName"), col("isTemporary"))
        .filter(col("tableName").isin(Tables.names: _*))
        .orderBy(col("tableName"))
    }
  )

  /** ANSI SQL that parses identically in Spark SQL and DuckDB: decimal
    * routing per Dx rules, unique ORDER BY keys. */
  private val sqlQ1 =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** x01–x04 are engine-specific (rows-only gate); x05 is the SQL
    * front-end twin, graded hash-exact with the SAME text as the oracle. */
  def oracle: Map[String, String] = Map(
    "x05_sql_front" -> sqlQ1)
}
