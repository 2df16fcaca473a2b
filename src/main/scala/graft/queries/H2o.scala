package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.Dx._

/** The reference's h2o groupby + join suites
  * (`benchmarks/queries/h2o/groupby.sql` — 10 aggregation shapes over table
  * `x(id1..id6, v1..v3)`; `benchmarks/queries/h2o/join.sql` — 5 join shapes
  * x⋈{small,medium,large}; harness `.github/workflows/h2o.yml:125-174`),
  * adapted to the synthetic schema: x=lineitem (id1=l_returnflag,
  * id2=l_linestatus, id3=l_suppkey, id4=l_linenumber, id5=l_partkey mod
  * 1000 in h10 / mod 10 in h06 (the coarser grain keeps h06's per-group
  * median populations meaningful), id6=l_orderkey; v1=l_quantity,
  * v2=l_extendedprice, v3=l_discount), small=supplier (broadcasts),
  * medium=part / customer, large=orders. h08's top-2 partitions by id3
  * (suppkey) rather than id6: per-order groups have <=7 rows, which
  * would make "top 2 per group" nearly the identity.
  *
  * Scale notes (the h2o suite is exactly a scale stress):
  *  - h05/h10 are high-cardinality groupbys — hash partial→final on the
  *    group keys, no row explosion, the canonical 100 TB-safe shape;
  *  - h08 is top-N per group — WindowGroupLimit pushes the rank filter
  *    below the shuffle, so only 2 rows/group survive the exchange;
  *  - h11 broadcasts the small build side; h15 is the large-large SMJ.
  * Determinism: money/qty sums route through DECIMAL ([[Dx]]); every
  * query ORDER BYs a unique key set.
  */
object H2o {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // g1: SUM(v1) by low-cardinality id1.
    "h01_sum_by_id1" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity")).as("v1"))
        .orderBy(col("l_returnflag"))
    },

    // g2: SUM(v1) by id1, id2.
    "h02_sum_by_id1_id2" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("v1"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // g3: SUM + AVG by mid-cardinality id3.
    "h03_sum_avg_by_id3" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("v1"),
          davg(col("l_discount")).as("v3"))
        .orderBy(col("l_suppkey"))
    },

    // g4: AVG of three measures by id4.
    "h04_avg3_by_id4" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_linenumber"))
        .agg(davg(col("l_quantity")).as("v1"),
          davg(col("l_extendedprice")).as("v2"),
          davg(col("l_discount")).as("v3"))
        .orderBy(col("l_linenumber"))
    },

    // g5: SUM of three measures by high-cardinality id6 (one row per
    // order — the partial agg already collapses before the shuffle).
    "h05_sum3_by_id6" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("v1"),
          dsum(col("l_extendedprice")).as("v2"),
          dsum(col("l_discount")).as("v3"))
        .orderBy(col("l_orderkey"))
    },

    // g6: MEDIAN + STDDEV by id4, id5 (stddev via exact power sums —
    // see Aggregates.a06 for the determinism argument).
    "h06_median_sd_by_id45" -> { (s, dir) =>
      val q = dec(col("l_quantity"))
      Tables.load(s, dir, "lineitem")
        .withColumn("id5", (col("l_partkey") % 10).cast("long"))
        .groupBy(col("l_linenumber"), col("id5"))
        .agg(median(col("l_quantity").cast("long")).as("median_v3"),
          sum(q).cast("double").as("sx"),
          sum(q * q).cast("double").as("sxx"),
          count(col("l_quantity")).cast("double").as("n"))
        .select(col("l_linenumber"), col("id5"), col("median_v3"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
            (col("n") - 1)).as("sd_v3"))
        .orderBy(col("l_linenumber"), col("id5"))
    },

    // g7: MAX(v1) - MIN(v2) by id3 (min/max pick existing exact values —
    // no decimal routing needed).
    "h07_range_by_id3" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg((max(col("l_quantity")) - min(col("l_discount")))
          .as("range_v1_v2"))
        .orderBy(col("l_suppkey"))
    },

    // g8: top-2 per group via ROW_NUMBER, partitioned by id3/suppkey (see
    // header note; WindowGroupLimit pushes the rank<=2 filter below the
    // exchange). Unique tie-break keys keep the row set deterministic;
    // rank cast to long (DuckDB ROW_NUMBER is BIGINT, Spark's is int).
    "h08_top2_by_id6" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_extendedprice").isNotNull)
        .withColumn("order_v3", row_number().over(w).cast("long"))
        .filter(col("order_v3") <= 2)
        .select(col("l_suppkey"), col("l_extendedprice").as("largest2_v3"),
          col("order_v3"))
        .orderBy(col("l_suppkey"), col("order_v3"))
    },

    // g9: POWER(CORR(v1,v2),2) by id2, id4 — power-sum corr over integer
    // CENTS (corr is scale-invariant, so scaling both variables by 100
    // changes nothing semantically). Cents at DECIMAL scale 0 keep every
    // power sum exact AND overflow-proof to 1e38 (an int64 sum of price²
    // cents would overflow ~6x beyond the bench SF), while the ->double
    // conversion stays a SINGLE rounding in both engines — scale-0
    // decimals convert integer->double directly, unlike DECIMAL(p,2)
    // whose DuckDB cast rounds twice (int128 then /10^scale).
    "h09_r2_by_id24" -> { (s, dir) =>
      val x = round(col("l_quantity") * 100).cast("decimal(18,0)")
      val y = round(col("l_extendedprice") * 100).cast("decimal(18,0)")
      val agg = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_linestatus"), col("l_linenumber"))
        .agg(sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"),
          sum(x * y).cast("double").as("sxy"),
          count(lit(1)).cast("double").as("n"))
      val corr = (col("sxy") - col("sx") * col("sy") / col("n")) /
        (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
          sqrt(col("syy") - col("sy") * col("sy") / col("n")))
      // Square by self-multiplication, not pow(): Math.pow and DuckDB's
      // std::pow can differ in the last ulp even for exponent 2.
      agg.select(col("l_linestatus"), col("l_linenumber"), corr.as("c"))
        .select(col("l_linestatus"), col("l_linenumber"),
          (col("c") * col("c")).as("r2"))
        .orderBy(col("l_linestatus"), col("l_linenumber"))
    },

    // g10: SUM + COUNT grouped by all six ids — the near-unique-group
    // stress (group count ~ row count; partial agg barely collapses, the
    // shuffle carries every group exactly once).
    "h10_sum_count_by_all" -> { (s, dir) =>
      Tables.load(s, dir, "lineitem")
        .withColumn("id5", (col("l_partkey") % 1000).cast("long"))
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          col("l_suppkey"), col("l_linenumber"), col("id5"),
          col("l_orderkey"))
        .agg(dsum(col("l_discount")).as("v3"), count(lit(1)).as("count"))
        .orderBy(col("l_returnflag"), col("l_linestatus"),
          col("l_suppkey"), col("l_linenumber"), col("id5"),
          col("l_orderkey"))
    },

    // j1: x ⋈ small — supplier is far below the broadcast threshold.
    "h11_join_small" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      l.join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("s_name"), col("l_quantity").as("v1"),
          col("s_acctbal").as("v2"))
        // (orderkey, linenumber) alone is NOT unique in the synthetic
        // lineitem; (ok, ln, pk, sk) is — sort on the full unique key so
        // the row order is engine-independent.
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
    },

    // j2: x ⋈ medium (inner, on the natural key).
    "h12_join_medium" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("p_name"), col("p_retailprice").as("v2"),
          col("l_quantity").as("v1"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
    },

    // j3: x LEFT JOIN medium — same shape, outer semantics.
    "h13_join_medium_left" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part").filter(col("p_partkey") % 2 === 0)
      l.join(p, col("l_partkey") === col("p_partkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("p_name"), col("p_retailprice").as("v2"),
          col("l_quantity").as("v1"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
    },

    // j4: join on the OTHER key of the pair (orders ⋈ customer on
    // custkey rather than lineitem's orderkey path).
    "h14_join_other_key" -> { (s, dir) =>
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_acctbal").as("v2"), col("o_totalprice").as("v1"))
        .orderBy(col("o_orderkey"))
    },

    // j5: x ⋈ big — the large-large sort-merge join.
    "h15_join_big" -> { (s, dir) =>
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").as("v2"), col("l_quantity").as("v1"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "h01_sum_by_id1" ->
      """SELECT l_returnflag,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS v1
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "h02_sum_by_id1_id2" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS v1
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "h03_sum_avg_by_id3" ->
      """SELECT l_suppkey,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS v1,
        | CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS v3
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "h04_avg3_by_id4" ->
      """SELECT l_linenumber,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS v1,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS v2,
        | CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS v3
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,

    "h05_sum3_by_id6" ->
      """SELECT l_orderkey,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS v1,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS v2,
        | CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS v3
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "h06_median_sd_by_id45" ->
      """WITH t AS (
        | SELECT l_linenumber, CAST(l_partkey % 10 AS BIGINT) AS id5,
        |  median(CAST(l_quantity AS BIGINT)) AS median_v3,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |  CAST(COUNT(l_quantity) AS DOUBLE) AS n
        | FROM lineitem GROUP BY 1, 2)
        |SELECT l_linenumber, id5, median_v3,
        | sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_v3
        |FROM t ORDER BY l_linenumber, id5""".stripMargin,

    "h07_range_by_id3" ->
      """SELECT l_suppkey, MAX(l_quantity) - MIN(l_discount) AS range_v1_v2
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "h08_top2_by_id6" ->
      """SELECT l_suppkey, largest2_v3, order_v3 FROM (
        | SELECT l_suppkey, l_extendedprice AS largest2_v3,
        |  ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey) AS order_v3
        | FROM lineitem WHERE l_extendedprice IS NOT NULL) sub
        |WHERE order_v3 <= 2 ORDER BY l_suppkey, order_v3""".stripMargin,

    "h09_r2_by_id24" ->
      """WITH b AS (
        | SELECT l_linestatus, l_linenumber,
        |  CAST(round(l_quantity * 100) AS DECIMAL(18,0)) AS x,
        |  CAST(round(l_extendedprice * 100) AS DECIMAL(18,0)) AS y
        | FROM lineitem),
        |t AS (
        | SELECT l_linestatus, l_linenumber,
        |  CAST(SUM(x) AS DOUBLE) AS sx,
        |  CAST(SUM(y) AS DOUBLE) AS sy,
        |  CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |  CAST(SUM(y * y) AS DOUBLE) AS syy,
        |  CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |  CAST(COUNT(*) AS DOUBLE) AS n
        | FROM b GROUP BY l_linestatus, l_linenumber),
        |c AS (
        | SELECT l_linestatus, l_linenumber,
        |  (sxy - sx * sy / n) /
        |    (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS c
        | FROM t)
        |SELECT l_linestatus, l_linenumber, c * c AS r2
        |FROM c ORDER BY l_linestatus, l_linenumber""".stripMargin,

    "h10_sum_count_by_all" ->
      """SELECT l_returnflag, l_linestatus, l_suppkey, l_linenumber,
        | CAST(l_partkey % 1000 AS BIGINT) AS id5, l_orderkey,
        | CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS v3,
        | COUNT(*) AS count
        |FROM lineitem GROUP BY 1, 2, 3, 4, 5, 6
        |ORDER BY 1, 2, 3, 4, 5, 6""".stripMargin,

    "h11_join_small" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, s_name,
        | l_quantity AS v1, s_acctbal AS v2
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "h12_join_medium" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, p_name,
        | p_retailprice AS v2, l_quantity AS v1
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "h13_join_medium_left" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, p_name,
        | p_retailprice AS v2, l_quantity AS v1
        |FROM lineitem LEFT JOIN (SELECT * FROM part WHERE p_partkey % 2 = 0) p
        | ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "h14_join_other_key" ->
      """SELECT o_orderkey, o_custkey, c_name,
        | c_acctbal AS v2, o_totalprice AS v1
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "h15_join_big" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, o_custkey,
        | o_orderstatus, o_totalprice AS v2, l_quantity AS v1
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin
  )
}
