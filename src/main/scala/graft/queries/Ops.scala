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

  /** Engine-specific outputs — no DuckDB oracle (rows-only gate). */
  def oracle: Map[String, String] = Map.empty
}
