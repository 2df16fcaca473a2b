package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dx._

/** Window-function surface — the port of the reference's h2o window suite
  * (`benchmarks/queries/h2o/window.sql`, 17 cases) and its window registry
  * (`core/src/registry.rs:23`: row_number, rank, dense_rank, percent_rank,
  * cume_dist, ntile, lag, lead, first_value, last_value, nth_value) onto the
  * driver's `events` table.
  *
  * Determinism rules (driver hash-compares vs DuckDB):
  *  - every OVER clause orders by (ts|value, event_id) — unique tiebreaker;
  *  - windowed SUM/AVG routes through DECIMAL (exact, order-independent)
  *    because DuckDB's segment-tree and Spark's streaming frame evaluation
  *    would otherwise differ in final-ulp double summation order;
  *  - ranking functions cast to long (DuckDB emits BIGINT);
  *  - timestamps are never emitted (events.ts is ns in parquet, which Spark
  *    truncates to us — ordering by it is safe, outputting it is not).
  *
  * Scale notes: all partitions are per-user/per-type (bounded, ~rows/150),
  * so WindowExec never sees a giant single partition except w11/w12 which
  * deliberately exercise the reference's no-PARTITION-BY single-partition
  * case (`PartitionedBoundedWindowAggExec`,
  * `core/src/execution_plans/partitioned_bounded_window_agg.rs:18-60`) on a
  * filtered subset. w10 is the top-N-per-group shape Spark rewrites to
  * WindowGroupLimit.
  */
object Windows {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  private val byTs = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w01_row_number" -> { (s, dir) =>
      ev(s, dir).filter(col("user_id") < 50)
        .select(col("event_id"), col("user_id"),
          row_number().over(byTs).cast("long").as("rn"))
        .orderBy(col("event_id"))
    },

    "w02_rank_dense" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"), col("event_type"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy(col("event_id"))
    },

    "w03_lag_lead" -> { (s, dir) =>
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"), col("value"),
          lag(col("value"), 1).over(byTs).as("lag1"),
          lead(col("value"), 1).over(byTs).as("lead1"),
          lag(col("value"), 2, 0.0).over(byTs).as("lag2_dflt"),
          lead(col("value"), 2, -1.0).over(byTs).as("lead2_dflt"))
        .orderBy(col("event_id"))
    },

    "w04_moving_avg" -> { (s, dir) =>
      val w = byTs.rowsBetween(-3, 0)
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"),
          (sum(dec(col("value"))).over(w).cast("double") /
            count(col("value")).over(w)).as("mov_avg"))
        .orderBy(col("event_id"))
    },

    "w05_rolling_sum" -> { (s, dir) =>
      val w = byTs.rowsBetween(Window.unboundedPreceding, 0)
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"),
          sum(dec(col("value"))).over(w).cast("double").as("rsum"))
        .orderBy(col("event_id"))
    },

    "w06_range_frame" -> { (s, dir) =>
      // RANGE frame over an exact integer key (value in cents).
      val base = ev(s, dir).filter(col("user_id") < 30)
        .withColumn("v100", round(col("value") * 100).cast("long"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("v100"))
        .rangeBetween(-500, 0)
      base.select(col("event_id"), col("v100"),
          sum(dec(col("value"))).over(w).cast("double").as("range_sum"))
        .orderBy(col("event_id"))
    },

    "w07_ntile" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).cast("long").as("tile"))
        .orderBy(col("event_id"))
    },

    "w08_first_last_nth" -> { (s, dir) =>
      val wFull = byTs.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"),
          first(col("value")).over(byTs).as("fv"),
          last(col("value")).over(wFull).as("lv"),
          nth_value(col("value"), 2).over(wFull).as("nv2"))
        .orderBy(col("event_id"))
    },

    "w09_percent_cume" -> { (s, dir) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      ev(s, dir).filter(col("user_id") < 30)
        .select(col("event_id"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("event_id"))
    },

    "w10_topn_per_group" -> { (s, dir) =>
      // top-3 per user by value — Spark plans WindowGroupLimit.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("value"), col("rn"))
        .orderBy(col("user_id"), col("rn"))
    },

    "w11_global_rolling" -> { (s, dir) =>
      // No PARTITION BY: the single-partition window case
      // (reference: partitioned_bounded_window_agg.rs) on a small subset.
      val w = Window.orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      ev(s, dir).filter(col("user_id") < 5)
        .select(col("event_id"),
          sum(dec(col("value"))).over(w).cast("double").as("rsum"))
        .orderBy(col("event_id"))
    },

    "w12_share_of_total" -> { (s, dir) =>
      // OVER () — whole-relation window aggregate.
      val w = Window.partitionBy()
      ev(s, dir).filter(col("user_id") < 20)
        .select(col("event_id"),
          (col("value") / sum(dec(col("value"))).over(w).cast("double"))
            .as("share"))
        .orderBy(col("event_id"))
    },

    "w13_parallel_global" -> { (s, dir) =>
      // Global bounded window executed in PARALLEL via range buckets +
      // halo rows (graft.operators.ParallelWindow — the reference's
      // PartitionedBoundedWindowAggExec capability). The oracle is the
      // plain serial OVER (ORDER BY), proving row-identical results.
      graft.operators.ParallelWindow.rollingAgg(
          ev(s, dir), orderCol = "ts", tieCol = "event_id",
          agg = sum(dec(col("value"))), preceding = 10, nBuckets = 8,
          out = "rsum")
        .select(col("event_id"), col("rsum").cast("double").as("rsum"))
        .orderBy(col("event_id"))
    },

    "w14_topn_sweep" -> { (s, dir) =>
      // The h2o window suite's top-N partition-cardinality sweep
      // (BASELINE.md: "100 -> 100,000 partitions"): the same top-2-per-
      // partition query at three grain levels — 3 / ~100 / ~100k
      // partitions. Few huge partitions stress per-partition sort volume;
      // many tiny ones stress partition bookkeeping. WindowGroupLimit
      // keeps only 2 rows/partition alive past each exchange.
      val l = Tables.load(s, dir, "lineitem")
      def top2(keyExpr: Column, grain: String): DataFrame = {
        val w = Window.partitionBy(col("k"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
        l.withColumn("k", keyExpr.cast("string"))
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 2)
          .select(lit(grain).as("grain"), col("k"),
            col("l_extendedprice").as("price"), col("rn"))
      }
      top2(col("l_returnflag"), "lo")
        .unionAll(top2(col("l_suppkey"), "mid"))
        .unionAll(top2(col("l_orderkey"), "hi"))
        .orderBy(col("grain"), col("k"), col("rn"))
    },

    "w15_udaf_window" -> { (s, dir) =>
      // Custom aggregate AS a window function — the reference registers
      // scalar/aggregate/window UDFs through one registry
      // (`BallistaFunctionRegistry`, core/src/registry.rs:38-48); Spark's
      // analogue is a typed Aggregator running inside an OVER clause.
      // sumsq_cents is integer arithmetic → exact in both engines.
      ev(s, dir).filter(col("user_id") < 20)
        .select(col("event_id"),
          expr("""sumsq_cents(value) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")
            .as("running_sumsq"))
        .orderBy(col("event_id"))
    },

    "w16_tumbling" -> { (s, dir) =>
      // Batch tumbling time window — the batch twin of the streaming
      // windowedAgg (StreamOps): per (hour-bucket, event_type) counts and
      // sums. events.ts is long nanos under the profile; Spark's window()
      // needs a timestamp, so bucket on micros; the DuckDB twin is
      // time_bucket. At scale this is one partial-agg shuffle keyed by
      // (bucket, type) — the canonical time-series rollup.
      val tsCol = timestamp_micros(expr("ts div 1000"))
      Tables.load(s, dir, "events")
        .groupBy(window(tsCol, "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_micros(col("w.start")).as("bucket_us"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("bucket_us"), col("event_type"))
    }
  )

  def oracle: Map[String, String] = Map(
    "w01_row_number" ->
      """SELECT event_id, user_id,
        | CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
        |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin,

    "w02_rank_dense" ->
      """SELECT event_id, event_type,
        | CAST(rank() OVER w AS BIGINT) AS rnk,
        | CAST(dense_rank() OVER w AS BIGINT) AS drnk
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
        |ORDER BY event_id""".stripMargin,

    "w03_lag_lead" ->
      """SELECT event_id, value,
        | lag(value, 1) OVER w AS lag1,
        | lead(value, 1) OVER w AS lead1,
        | lag(value, 2, 0.0) OVER w AS lag2_dflt,
        | lead(value, 2, -1.0) OVER w AS lead2_dflt
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "w04_moving_avg" ->
      """SELECT event_id,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
        |   / COUNT(value) OVER w AS mov_avg
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "w05_rolling_sum" ->
      """SELECT event_id,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS rsum
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "w06_range_frame" ->
      """SELECT event_id, v100,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS range_sum
        |FROM (SELECT *, CAST(round(value * 100) AS BIGINT) AS v100
        |      FROM events WHERE user_id < 30) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY v100
        |             RANGE BETWEEN 500 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "w07_ntile" ->
      """SELECT event_id, event_type,
        | CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS tile
        |FROM events WHERE user_id < 30 ORDER BY event_id""".stripMargin,

    "w08_first_last_nth" ->
      """SELECT event_id,
        | first_value(value) OVER w AS fv,
        | last_value(value) OVER wf AS lv,
        | nth_value(value, 2) OVER wf AS nv2
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |       wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,

    "w09_percent_cume" ->
      """SELECT event_id,
        | percent_rank() OVER w AS prnk,
        | cume_dist() OVER w AS cdist
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,

    "w10_topn_per_group" ->
      """SELECT user_id, event_id, value, rn FROM (
        | SELECT user_id, event_id, value,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn
        | FROM events) t
        |WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,

    "w11_global_rolling" ->
      """SELECT event_id,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS rsum
        |FROM events WHERE user_id < 5
        |WINDOW w AS (ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "w12_share_of_total" ->
      """SELECT event_id,
        | value / CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER () AS DOUBLE) AS share
        |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin,

    "w13_parallel_global" ->
      """SELECT event_id,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (ORDER BY ts, event_id
        |   ROWS BETWEEN 10 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rsum
        |FROM events ORDER BY event_id""".stripMargin,

    "w14_topn_sweep" ->
      """WITH t2 AS (
        | SELECT grain, k, price, rn FROM (
        |  SELECT 'lo' AS grain, CAST(l_returnflag AS VARCHAR) AS k,
        |   l_extendedprice AS price,
        |   CAST(row_number() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rn
        |  FROM lineitem) x WHERE rn <= 2
        | UNION ALL
        | SELECT grain, k, price, rn FROM (
        |  SELECT 'mid' AS grain, CAST(l_suppkey AS VARCHAR) AS k,
        |   l_extendedprice AS price,
        |   CAST(row_number() OVER (PARTITION BY l_suppkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rn
        |  FROM lineitem) y WHERE rn <= 2
        | UNION ALL
        | SELECT grain, k, price, rn FROM (
        |  SELECT 'hi' AS grain, CAST(l_orderkey AS VARCHAR) AS k,
        |   l_extendedprice AS price,
        |   CAST(row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey) AS BIGINT) AS rn
        |  FROM lineitem) z WHERE rn <= 2)
        |SELECT grain, k, price, rn FROM t2 ORDER BY grain, k, rn""".stripMargin,

    "w15_udaf_window" ->
      """SELECT event_id,
        | CAST(SUM(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT))
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_sumsq
        |FROM events WHERE user_id < 20 ORDER BY event_id""".stripMargin,

    "w16_tumbling" ->
      """SELECT CAST(epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS bucket_us,
        | event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_us, event_type""".stripMargin
  )
}
