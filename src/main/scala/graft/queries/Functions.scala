package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function breadth — the reference registers DataFusion's entire
  * default function registry plus higher-order/nested functions
  * (`core/src/registry.rs:20-22,52-57`) and even ships a Spark-compat pack
  * (`docs/source/user-guide/spark-compatible-functions.md`), making Spark
  * semantics the target by definition. One query per family: string, regex,
  * date/time, math, conditional, array/lambda (higher-order), struct/map.
  *
  * Cross-engine determinism: math stays on IEEE-exact ops (sqrt, abs,
  * round, mod) or integer-derived values; date outputs format to strings
  * (engines disagree on date/timestamp physical types, not values); libm
  * functions (ln/exp/pow) are rounded to 6 decimals.
  */
object Functions {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "f01_string" -> { (s, dir) =>
      Tables.load(s, dir, "customer").filter(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          substring(col("c_name"), 10, 5).as("sub"),
          length(col("c_name")).cast("long").as("len"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("repl"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
          trim(lit("  x  ")).as("trimmed"),
          split(col("c_name"), "#").getItem(0).as("first_part"))
        .orderBy(col("c_custkey"))
    },

    "f02_regex" -> { (s, dir) =>
      Tables.load(s, dir, "part").filter(col("p_partkey") <= 200)
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("no_vowels"),
          col("p_name").rlike("^[a-z]+ ").as("starts_word"),
          regexp_extract(col("p_type"), "([A-Z]+)", 1).as("type_caps"))
        .orderBy(col("p_partkey"))
    },

    "f03_datetime" -> { (s, dir) =>
      Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("d"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          date_format(col("o_orderdate") + expr("INTERVAL 45 DAYS"),
            "yyyy-MM-dd").as("plus45"),
          datediff(lit("2000-01-01").cast("date"),
            col("o_orderdate").cast("date")).cast("long").as("days_to_y2k"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd")
            .as("month_end"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy(col("o_orderkey"))
    },

    "f04_math" -> { (s, dir) =>
      Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          abs(col("o_totalprice") * -1).as("abs_v"),
          ceil(col("o_totalprice")).cast("double").as("ceil_v"),
          floor(col("o_totalprice")).cast("double").as("floor_v"),
          round(col("o_totalprice")).as("round_v"),
          sqrt(col("o_totalprice")).as("sqrt_v"),
          (col("o_orderkey") % 7).cast("long").as("mod_v"),
          signum(col("o_totalprice") - 200000).as("sign_v"),
          greatest(col("o_totalprice"), lit(100000.0)).as("gr_v"),
          least(col("o_totalprice"), lit(100000.0)).as("le_v"),
          round(log(col("o_totalprice")), 6).as("ln_v"),
          round(pow(col("o_totalprice"), 0.5) - sqrt(col("o_totalprice")),
            6).as("pow_sqrt_diff"))
        .orderBy(col("o_orderkey"))
    },

    "f05_conditional" -> { (s, dir) =>
      Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_x"),
          (col("o_orderstatus") === "F").cast("boolean").as("is_f"),
          nvl2(nullif(col("o_orderpriority"), lit("1-URGENT")),
            lit("normal"), lit("urgent")).as("prio_class"))
        .orderBy(col("o_orderkey"))
    },

    "f06_array_lambda" -> { (s, dir) =>
      // Higher-order functions over array<float> — the reference wires
      // DataFusion's higher-order registry (core/src/registry.rs:22).
      Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_v"),
          size(filter(col("embedding"), x => x > 0)).cast("long")
            .as("n_pos"),
          array_max(col("embedding")).cast("double").as("mx"),
          array_min(col("embedding")).cast("double").as("mn"),
          size(filter(transform(col("embedding"), x => x * 2f),
            x => x > lit(0.5f))).cast("long").as("n_big2x"),
          exists(col("embedding"), x => x > lit(0.3f)).as("has_gt03"))
        .orderBy(col("vec_id"))
    },

    "f07_struct_map" -> { (s, dir) =>
      // Struct/map construction + field access, flattened for compare.
      Tables.load(s, dir, "nation")
        .withColumn("st", struct(col("n_name").as("name"),
          col("n_regionkey").as("rk")))
        .withColumn("mp", map(lit("region"), col("n_regionkey").cast("long"),
          lit("key"), col("n_nationkey").cast("long")))
        .select(col("n_nationkey"),
          col("st.name").as("st_name"),
          col("st.rk").cast("long").as("st_rk"),
          element_at(col("mp"), "region").as("mp_region"),
          element_at(col("mp"), "key").as("mp_key"),
          map_keys(col("mp")).getItem(0).as("first_key"))
        .orderBy(col("n_nationkey"))
    },

    "f08_hash_compat" -> { (s, dir) =>
      // The reference's Spark-compat function pack (`datafusion-spark`
      // behind the `spark-compat` feature — docs/source/user-guide/
      // spark-compatible-functions.md:21-27, registry wiring
      // core/src/registry.rs:30-34): hash/codec functions where Spark IS
      // the semantics target. hex() case-normalized (Spark upper, DuckDB
      // lower).
      Tables.load(s, dir, "customer").filter(col("c_custkey") <= 100)
        .select(col("c_custkey"),
          md5(col("c_name")).as("name_md5"),
          sha2(col("c_name"), 256).as("name_sha256"),
          base64(col("c_name").cast("binary")).as("name_b64"),
          lower(hex(col("c_name"))).as("name_hex"),
          levenshtein(col("c_name"), col("c_mktsegment")).cast("long")
            .as("lev"),
          bit_count(col("c_custkey")).cast("long").as("bits"))
        .orderBy(col("c_custkey"))
    },

    "f09_json" -> { (s, dir) =>
      // JSON path extraction (registry breadth: DataFusion ships JSON
      // functions via its default registry) — both the string-path
      // extractor and the schema'd parse, aggregated per event type.
      Tables.load(s, dir, "events")
        .withColumn("k1", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("k2",
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k1")).as("sum_k"),
          count(col("k1")).as("n_k"),
          sum(when(col("k1") === col("k2"), 1L).otherwise(0L))
            .as("n_parse_agree"))
        .orderBy(col("event_type"))
    },

    "f11_date_trunc_format" -> { (s, dir) =>
      // date_trunc + string formatting + month arithmetic: each engine
      // renders with its OWN format syntax (yyyy-MM vs %Y-%m) — the
      // output strings, not the syntax, are the graded contract.
      Tables.load(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
            .as("plus3m"),
          last_day(col("o_orderdate")).cast("string").as("month_end"),
          dayofweek(col("o_orderdate")).cast("long").as("dow"))
        .orderBy(col("o_orderkey"))
    },

    "f10_generator" -> { (s, dir) =>
      // Generator/UDTF surface (SURVEY §2B UDF row: "UDTF → Generator/
      // flatMap"): a table-generating function on the graded path —
      // posexplode over a computed array, one output row per element with
      // its ordinal. The DuckDB twin is unnest + generate_subscripts.
      Tables.load(s, dir, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          posexplode(split(col("c_name"), "#")).as(Seq("pos", "part")))
        .select(col("c_custkey"), col("pos").cast("long").as("pos"),
          col("part"))
        .orderBy(col("c_custkey"), col("pos"))
    },

    "f12_bitops" -> { (s, dir) =>
      // Bitwise scalar surface (AND/OR/XOR, shifts, popcount) — exact
      // int64 semantics on both engines, no rounding concerns.
      Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
          col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
          col("l_orderkey").bitwiseOR(col("l_suppkey")).as("bor"),
          shiftleft(col("l_suppkey"), 3).as("shl"),
          shiftright(col("l_orderkey"), 2).as("shr"),
          bit_count(col("l_orderkey")).cast("long").as("popcnt"))
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
    },

    "f13_try_safe" -> { (s, dir) =>
      // Error-safe scalar evaluation — the try_* surface (ANSI-mode
      // NULL-on-error variants): divide-by-zero, casts of non-numeric
      // strings, and out-of-bounds list access all yield NULL instead of
      // failing the job. DuckDB mirrors with NULLIF-guarded division,
      // TRY_CAST, and its natively NULL-on-OOB list indexing. Every
      // expression is a single per-row op (one IEEE division at most) —
      // deterministic bits on both engines, pure codegen projection.
      Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          expr("try_divide(l_quantity, l_linenumber - 1)").as("safe_div"),
          expr("try_divide(l_quantity, CAST(NULL AS DOUBLE))")
            .as("null_div"),
          expr("try_cast(l_returnflag AS BIGINT)").as("bad_int"),
          expr("try_cast(CAST(l_partkey AS STRING) AS BIGINT)")
            .as("good_int"),
          expr("try_element_at(split(concat(l_returnflag, ' ', " +
            "l_linestatus), ' '), 5)").as("oob"),
          expr("try_element_at(split(concat(l_returnflag, ' ', " +
            "l_linestatus), ' '), 1)").as("first_tok"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    "f14_variant" -> { (s, dir) =>
      // Spark 4's VARIANT semi-structured type — the modern replacement
      // for string-JSON round-tripping (and the engine-native analogue
      // of DataFusion's JSON registry surface f09 covers): `parse_json`
      // builds the binary variant once, `variant_get` extracts typed
      // paths without re-parsing, and `try_parse_json` degrades
      // malformed input to NULL instead of failing the query. The
      // malformed leg is DETERMINISTIC (every event_id % 10 == 0 row is
      // TRUNCATED by one character — a dangling object both parsers
      // reject; a trailing-garbage suffix would NOT do: Spark's
      // try_parse_json stops after the first complete JSON value while
      // DuckDB's json_valid rejects the suffix, and the engines would
      // disagree), so both engines agree on which rows parse. Scale: a
      // pure codegen projection + one bounded groupBy —
      // at 100 TB the win VARIANT represents is parse-once-read-many,
      // which this plan shape preserves (one parse_json feeding two
      // variant_gets).
      Tables.load(s, dir, "events")
        .withColumn("v", expr("parse_json(props)"))
        .withColumn("corrupt",
          when(col("event_id") % 10 === 0,
            expr("substring(props, 1, length(props) - 1)"))
            .otherwise(col("props")))
        .withColumn("tv", expr("try_parse_json(corrupt)"))
        .groupBy(col("event_type"))
        .agg(
          sum(expr("variant_get(v, '$.k', 'long')")).as("sum_k"),
          count(expr("variant_get(v, '$.k', 'long')")).as("n_k"),
          sum(when(expr("variant_get(v, '$.missing', 'long')").isNull,
            1L).otherwise(0L)).as("n_missing_null"),
          sum(when(col("tv").isNull, 1L).otherwise(0L)).as("n_malformed"),
          sum(expr("variant_get(tv, '$.k', 'long')")).as("sum_k_surviving"))
        .orderBy(col("event_type"))
    }
  )

  def oracle: Map[String, String] = Map(
    "f01_string" ->
      """SELECT c_custkey,
        | upper(c_name) AS up,
        | lower(c_mktsegment) AS lo,
        | substring(c_name, 10, 5) AS sub,
        | CAST(length(c_name) AS BIGINT) AS len,
        | concat(c_name, '-', c_mktsegment) AS cat,
        | replace(c_name, 'Customer', 'Cust') AS repl,
        | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        | trim('  x  ') AS trimmed,
        | string_split(c_name, '#')[1] AS first_part
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,

    "f02_regex" ->
      """SELECT p_partkey,
        | regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
        | regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
        | regexp_matches(p_name, '^[a-z]+ ') AS starts_word,
        | regexp_extract(p_type, '([A-Z]+)', 1) AS type_caps
        |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin,

    "f03_datetime" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(day(o_orderdate) AS BIGINT) AS d,
        | CAST(quarter(o_orderdate) AS BIGINT) AS q,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d') AS plus45,
        | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
        | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
        | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "f04_math" ->
      """SELECT o_orderkey,
        | abs(o_totalprice * -1) AS abs_v,
        | CAST(ceil(o_totalprice) AS DOUBLE) AS ceil_v,
        | CAST(floor(o_totalprice) AS DOUBLE) AS floor_v,
        | round(o_totalprice) AS round_v,
        | sqrt(o_totalprice) AS sqrt_v,
        | CAST(o_orderkey % 7 AS BIGINT) AS mod_v,
        | CAST(sign(o_totalprice - 200000) AS DOUBLE) AS sign_v,
        | greatest(o_totalprice, 100000.0) AS gr_v,
        | least(o_totalprice, 100000.0) AS le_v,
        | round(ln(o_totalprice), 6) AS ln_v,
        | round(pow(o_totalprice, 0.5) - sqrt(o_totalprice), 6) AS pow_sqrt_diff
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "f05_conditional" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 300000 THEN 'big'
        |      WHEN o_totalprice > 150000 THEN 'mid'
        |      ELSE 'small' END AS bucket,
        | coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x,
        | o_orderstatus = 'F' AS is_f,
        | CASE WHEN nullif(o_orderpriority, '1-URGENT') IS NOT NULL
        |      THEN 'normal' ELSE 'urgent' END AS prio_class
        |FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""".stripMargin,

    "f06_array_lambda" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS BIGINT) AS dim,
        | CAST(embedding[1] AS DOUBLE) AS first_v,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
        | CAST(list_max(embedding) AS DOUBLE) AS mx,
        | CAST(list_min(embedding) AS DOUBLE) AS mn,
        | CAST(len(list_filter(list_transform(embedding, x -> x * CAST(2 AS FLOAT)),
        |   x -> x > CAST(0.5 AS FLOAT))) AS BIGINT) AS n_big2x,
        | len(list_filter(embedding, x -> x > CAST(0.3 AS FLOAT))) > 0 AS has_gt03
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin,

    "f07_struct_map" ->
      """SELECT n_nationkey,
        | n_name AS st_name,
        | CAST(n_regionkey AS BIGINT) AS st_rk,
        | CAST(n_regionkey AS BIGINT) AS mp_region,
        | CAST(n_nationkey AS BIGINT) AS mp_key,
        | 'region' AS first_key
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "f08_hash_compat" ->
      """SELECT c_custkey,
        | md5(c_name) AS name_md5,
        | sha256(c_name) AS name_sha256,
        | base64(CAST(c_name AS BLOB)) AS name_b64,
        | lower(hex(c_name)) AS name_hex,
        | CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev,
        | CAST(bit_count(c_custkey) AS BIGINT) AS bits
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,

    "f09_json" ->
      """SELECT event_type,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | COUNT(json_extract(props, '$.k')) AS n_k,
        | CAST(SUM(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT)
        |                    = CAST(json_extract(props, '$.k') AS BIGINT)
        |          THEN 1 ELSE 0 END) AS BIGINT) AS n_parse_agree
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "f11_date_trunc_format" ->
      """SELECT o_orderkey,
        | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        | strftime(o_orderdate, '%Y-%m') AS ym,
        | strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        | CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
        | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,

    "f10_generator" ->
      """SELECT c_custkey,
        | CAST(generate_subscripts(string_split(c_name, '#'), 1) - 1 AS BIGINT) AS pos,
        | unnest(string_split(c_name, '#')) AS part
        |FROM customer WHERE c_custkey < 100
        |ORDER BY c_custkey, pos""".stripMargin,

    "f12_bitops" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | xor(l_orderkey, l_partkey) AS bxor,
        | l_orderkey & l_partkey AS band,
        | l_orderkey | l_suppkey AS bor,
        | l_suppkey << 3 AS shl,
        | l_orderkey >> 2 AS shr,
        | CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "f13_try_safe" ->
      """SELECT l_orderkey, l_linenumber,
        | l_quantity / NULLIF(l_linenumber - 1, 0) AS safe_div,
        | l_quantity / CAST(NULL AS DOUBLE) AS null_div,
        | TRY_CAST(l_returnflag AS BIGINT) AS bad_int,
        | TRY_CAST(CAST(l_partkey AS VARCHAR) AS BIGINT) AS good_int,
        | string_split(l_returnflag || ' ' || l_linestatus, ' ')[5] AS oob,
        | string_split(l_returnflag || ' ' || l_linestatus, ' ')[1] AS first_tok
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f14_variant" ->
      """WITH e AS (
        | SELECT event_type, props,
        |  CASE WHEN event_id % 10 = 0
        |   THEN substr(props, 1, length(props) - 1) ELSE props END
        |    AS corrupt
        | FROM events)
        |SELECT event_type,
        | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |   AS sum_k,
        | COUNT(json_extract(props, '$.k')) AS n_k,
        | CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_null,
        | CAST(SUM(CASE WHEN NOT json_valid(corrupt) THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_malformed,
        | CAST(SUM(CASE WHEN json_valid(corrupt)
        |   THEN CAST(json_extract(corrupt, '$.k') AS BIGINT) END)
        |   AS BIGINT) AS sum_k_surviving
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
