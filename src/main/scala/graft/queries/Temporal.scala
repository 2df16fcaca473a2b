package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin
import graft.queries.Dx._

/** Temporal join shapes over `events`: as-of (point-in-time) join,
  * banded range join, sessionization, and event-sequence transition
  * analysis — operators the reference lacks (bounded-relational only),
  * composed Spark-first (no custom physical operator: one shuffle +
  * sort via window / SMJ). DuckDB's native ASOF JOIN is the oracle for
  * the as-of case.
  */
object Temporal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_asof_join" -> { (s, dir) =>
      // For each purchase, the most recent prior (or simultaneous) click
      // by the same user.
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"),
          col("ts").as("click_ts"))
      AsOfJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
          rightCols = Seq("click_ts", "click_value"))
        .filter(col("asof_click_ts").isNotNull)
        // ns -> us (integer div): DuckDB's ASOF pipeline carries us precision
        .select(col("event_id"), col("user_id"), col("value"),
          expr("asof_click_ts div 1000").as("asof_click_us"),
          col("asof_click_value"))
        .orderBy(col("event_id"))
    },

    "p06_asof_forward" -> { (s, dir) =>
      // Forward direction: for each click, the NEXT purchase (at or
      // after) by the same user — the attribution-window primitive.
      val ev = Tables.load(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value").as("p_value"),
          col("ts").as("p_ts"))
      AsOfJoin.forward(clicks, purchases, key = "user_id", ts = "ts",
          rightCols = Seq("p_ts", "p_value"))
        .filter(col("asof_p_ts").isNotNull)
        .select(col("event_id"), col("user_id"),
          expr("asof_p_ts div 1000").as("next_purchase_us"),
          col("asof_p_value"))
        .orderBy(col("event_id"))
    },

    "p19_asof_nearest" -> { (s, dir) =>
      // NEAREST direction — for each purchase, the click closest in
      // time EITHER way (ties resolve backward): the sensor-alignment /
      // quote-matching semantic pandas ships as
      // merge_asof(direction='nearest') that neither backward (p01) nor
      // forward (p06) alone expresses. Both direction passes ride ONE
      // user_id exchange (operators/AsOfJoin.nearest); asof_dir_back
      // grades which side won per row, so the pick rule itself is
      // oracle-checked, not just the carried values.
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").as("click_value"), col("ts").as("click_ts"))
      AsOfJoin.nearest(purchases, clicks, key = "user_id", ts = "ts",
          rightCols = Seq("click_ts", "click_value"))
        .filter(col("asof_click_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("asof_click_ts div 1000").as("near_click_us"),
          col("asof_click_value"), col("asof_dir_back"))
        .orderBy(col("event_id"))
    },

    "p07_session_window" -> { (s, dir) =>
      // Spark's NATIVE session_window in batch — the built-in twin of
      // p03's manual lag+running-sum sessionization. Interval semantics:
      // [ts, ts+gap) windows merge iff the next event starts strictly
      // inside, so a gap of EXACTLY 30 min opens a new session (the
      // oracle's `>=`). events.ts is long nanos under the profile →
      // convert to micros timestamps for the window, emit unix micros.
      val ev = Tables.load(s, dir, "events").filter(col("user_id") < 40)
      val tsCol = timestamp_micros(expr("ts div 1000"))
      ev.groupBy(col("user_id"),
          session_window(tsCol, "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("session_start_us"),
          col("n_events"), col("session_value"))
        .orderBy(col("user_id"), col("session_start_us"))
    },

    "p02_range_join" -> { (s, dir) =>
      // Banded range join: lineitems shipped within 30 days of their
      // order's date (equi key + range predicate -> SMJ, no explosion).
      val o = Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
      val l = Tables.load(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_within_30d"))
        .orderBy(col("o_orderkey"))
    },

    "p03_sessionize" -> { (s, dir) =>
      // Session assignment: a new session starts after a >30-minute gap —
      // the classic event-stream sessionization via window lag + running
      // sum (one shuffle on user_id).
      val ev = Tables.load(s, dir, "events").filter(col("user_id") < 40)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      ev.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > gapNs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("session_value"))
        .orderBy(col("user_id"), col("session_id"))
    },

    "p05_asof_tolerance" -> { (s, dir) =>
      // As-of join with a staleness bound: matches older than 2 h are
      // nulled (kept as rows — the match existed, it is just too stale
      // to use), the standard point-in-time-feature-store semantic.
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"),
          col("ts").as("click_ts"))
      val tolNs = 2L * 3600 * 1000 * 1000 * 1000 // ts is long nanos
      val fresh = col("asof_click_ts") >= col("ts") - tolNs
      AsOfJoin.backward(purchases, clicks, key = "user_id", ts = "ts",
          rightCols = Seq("click_ts", "click_value"))
        .filter(col("asof_click_ts").isNotNull) // inner ASOF semantics
        .select(col("event_id"), col("user_id"), col("value"),
          when(fresh, expr("asof_click_ts div 1000")).as("asof_click_us"),
          when(fresh, col("asof_click_value")).as("asof_click_value"))
        .orderBy(col("event_id"))
    },

    "p04_salted_join" -> { (s, dir) =>
      // Skew-mitigated join (graft.operators.SaltedJoin): lineitem's
      // suppkey spread over 8 salts, supplier replicated 8x. The result
      // is row-identical to the plain join — which IS the oracle.
      val l = Tables.load(s, dir, "lineitem")
      val sup = Tables.load(s, dir, "supplier")
      graft.operators.SaltedJoin.inner(
          l, sup, keyL = "l_suppkey", keyR = "s_suppkey",
          saltSource = col("l_orderkey"), nSalts = 8)
        .groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy(col("nk"))
    },

    "p08_event_transitions" -> { (s, dir) =>
      // Event-sequence TRANSITION matrix — the product-analytics "what
      // happens next" report: per user, each event paired with its
      // successor via lead(), transitions counted per (type, next_type)
      // with total/mean gap. One shuffle on user_id for the window,
      // then a bounded groupBy (|types|² rows at any corpus size). Gaps
      // are exact integer microseconds: ts is long NANOS under the
      // profile while DuckDB reads the parquet timestamp at µs, so both
      // ordering and arithmetic run on the µs-truncated value (truncate
      // FIRST, then diff — diff-then-divide rounds differently).
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("next_us", lead(col("ts_us"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .withColumn("gap_us", col("next_us") - col("ts_us"))
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("gap_us")).as("total_gap_us"),
          (sum(col("gap_us")).cast("double") / count(lit(1)))
            .as("avg_gap_us"))
        .orderBy(col("event_type"), col("next_type"))
    },

    "p09_funnel" -> { (s, dir) =>
      // Ordered event FUNNEL with a conversion window — the product-
      // analytics step sequence (view -> click -> purchase within 7
      // days of the first view), per-user stage reached plus exact
      // integer step latencies. Each step is a groupBy(user) min over
      // an inequality-filtered equi-join on user_id: three shuffles,
      // all on the SAME key, so at scale the exchanges reuse one
      // partitioning (no recluster between steps). All comparisons run
      // on µs-truncated timestamps (the p08 rule: DuckDB's parquet
      // reader sees µs) and latencies are sums of exact int64 µs.
      val wUs = 7L * 86400 * 1000 * 1000 // 7-day window, µs
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("v_us"))
      val firstClick = views
        .join(ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts")), "user_id")
        .filter(col("c_ts") > col("v_us") &&
          col("c_ts") <= col("v_us") + wUs)
        .groupBy(col("user_id"), col("v_us"))
        .agg(min(col("c_ts")).as("c_us"))
      val firstPurchase = firstClick
        .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("p_ts")), "user_id")
        .filter(col("p_ts") > col("c_us") &&
          col("p_ts") <= col("v_us") + wUs)
        .groupBy(col("user_id"))
        .agg(min(col("p_ts")).as("p_us"))
      views
        .join(firstClick.select(col("user_id"), col("c_us")),
          Seq("user_id"), "left_outer")
        .join(firstPurchase, Seq("user_id"), "left_outer")
        .withColumn("stage",
          lit(1L) + when(col("c_us").isNotNull, 1L).otherwise(0L)
            + when(col("p_us").isNotNull, 1L).otherwise(0L))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("c_us") - col("v_us")).as("total_click_lag_us"),
          sum(col("p_us") - col("c_us")).as("total_purchase_lag_us"))
        .orderBy(col("stage"))
    },

    "p10_retention_cohorts" -> { (s, dir) =>
      // Retention COHORT matrix — the growth-analytics staple: users
      // bucketed by first-seen week (cohort), then counted as active in
      // each later week, as (cohort_week, week_offset) → distinct
      // users. Week buckets are exact integer µs divisions (the p08
      // rule: truncate to µs FIRST, then all arithmetic in int64).
      // Two shuffles, BOTH on user_id — the first-seen aggregate and
      // the re-attach join cluster on the same key, so at scale the
      // second exchange reuses the first's partitioning — then a
      // bounded (|weeks|²) matrix aggregate. No window needed: min()
      // beats a row_number pass when only the first event matters.
      val weekUs = 7L * 86400 * 1000 * 1000
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("first_us"))
      ev.join(first, "user_id")
        .select(col("user_id"),
          expr(s"first_us div $weekUs").as("cohort_week"),
          (expr(s"ts_us div $weekUs") - expr(s"first_us div $weekUs"))
            .as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },

    "p11_rolling_anomaly" -> { (s, dir) =>
      // Rolling-baseline ANOMALY flags — the monitoring query a pipeline
      // runs over its own event volume: per (event_type, day), the daily
      // value total vs the trailing-7-day average, flagging days that
      // exceed 2× their own baseline. Day buckets are exact integer µs
      // divisions; daily sums are exact DECIMAL (the Dx rule — a double
      // fold would flake the gate); and the spike test cross-multiplies
      // (n·day > 2·trail_sum) so the COMPARISON is exact integer/decimal
      // arithmetic too — doubles appear only in the reported columns.
      // Shape: one groupBy to the (type, day) grain — tiny after
      // aggregation — then a RANGE window per type: the window input is
      // days, not events, so the sort is negligible at any corpus size.
      val dayUs = 86400L * 1000 * 1000
      val daily = Tables.load(s, dir, "events")
        .withColumn("day", expr(s"(ts div 1000) div $dayUs"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_events"), sum(dec(col("value"))).as("dv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rangeBetween(-7, -1)
      daily
        .withColumn("tsum", sum(col("dv")).over(w))
        .withColumn("tn", count(col("dv")).over(w))
        .select(col("event_type"), col("day"), col("n_events"),
          col("dv").cast("double").as("day_value"),
          (col("tsum").cast("double") / col("tn")).as("trail_avg"),
          when(col("tn") > 0 &&
            col("tn") * col("dv") > lit(2) * col("tsum"), 1L)
            .otherwise(0L).as("is_spike"))
        .orderBy(col("event_type"), col("day"))
    },

    "p12_asof_tolerance" -> { (s, dir) =>
      // As-of join with a TOLERANCE bound (pandas merge_asof tolerance= /
      // kdb wj): each purchase attaches its most recent prior click only
      // if that click is within 10 minutes — staler matches are nulled,
      // the purchase row is kept. Same one-shuffle union+window plan as
      // p01 (the matched ts rides the running window, so the bound costs
      // nothing); the gap test runs on µs-TRUNCATED values (truncate
      // first, then diff — the p08 rule) so DuckDB's µs reader computes
      // the identical keep set.
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value").as("click_value"),
          col("ts").as("click_ts"))
      AsOfJoin.backwardWithin(purchases, clicks, key = "user_id", ts = "ts",
          rightCols = Seq("click_ts", "click_value"),
          tolerance = 600L * 1000 * 1000, truncateTo = 1000L)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("asof_click_ts div 1000").as("asof_click_us"),
          col("asof_click_value"))
        .orderBy(col("event_id"))
    },

    "p13_twap" -> { (s, dir) =>
      // TIME-WEIGHTED average value per user — the TWAP shape (each
      // observation weighted by how long it was the latest one, i.e.
      // the gap to the next event): Σ(value·gap) / Σ(gap). Values go
      // through exact cents, gaps are exact integer µs, and each
      // cents·gap product (≤ ~10¹⁶) sums in DECIMAL(38,0) — immune to
      // int64 overflow at any event count, order-independent, identical
      // in both engines; the single closing division is the only double
      // op. One shuffle on user_id for the lead() window, then a
      // per-user aggregate on the same key (the exchange is reused).
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("cents", (dec(col("value")) * 100).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      ev.withColumn("next_us", lead(col("ts_us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("gap_us", col("next_us") - col("ts_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("gap_us")).as("total_gap_us"),
          sum((col("cents") * col("gap_us"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("wsum"))
        .select(col("user_id"), col("n_intervals"), col("total_gap_us"),
          (col("wsum").cast("double") / col("total_gap_us") / 100.0)
            .as("twap"))
        .orderBy(col("user_id"))
    },

    "p15_interval_islands" -> { (s, dir) =>
      // Gaps-and-ISLANDS interval consolidation — each event opens a
      // 10-minute validity interval [ts, ts+10m); overlapping or touching
      // intervals per user merge into one island (coverage span). The
      // classic cumulative-max trick: an island starts where the event's
      // start exceeds the max end of ALL preceding intervals (not just
      // the previous one — intervals can nest under a long predecessor).
      // Scale: ONE shuffle + ONE sort on (user_id, ts, event_id) feed
      // both Window operators (the island-id running sum necessarily
      // chains after the cummax it consumes, but shares its partition/
      // order spec, so no second exchange or sort appears — pinned in
      // the plan golden). Micros everywhere (exact integers — no
      // doubles to disagree on).
      val winUs = 10L * 60 * 1000 * 1000
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("end_us", col("ts_us") + winUs)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val uPre = org.apache.spark.sql.expressions.Window.unboundedPreceding
      ev.withColumn("max_prev_end", max(col("end_us")).over(
          w.rowsBetween(uPre, -1)))
        .withColumn("new_island",
          when(col("max_prev_end").isNull ||
            col("ts_us") > col("max_prev_end"), 1L).otherwise(0L))
        .withColumn("island", sum(col("new_island")).over(
          w.rowsBetween(uPre, 0)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("ts_us")).as("island_start_us"),
          max(col("end_us")).as("island_end_us"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("island"))
    },

    "p16_gap_fill" -> { (s, dir) =>
      // GAP-FILL / RESAMPLE — the time-series regularization every
      // feature pipeline runs before training: per user, an HOURLY grid
      // spanning [first event, last event], each grid point carrying
      // last-observation-carried-forward (LOCF) and LINEAR-INTERPOLATED
      // value. Shape: grid rows (sequence+explode — |hours| per user,
      // never corpus-sized) UNION the events, then ONE shuffle + sort on
      // (user_id, t) feeds BOTH ignore-nulls windows (prev = running
      // last, next = first over the following frame — same partition/
      // order spec, no second exchange). This beats the as-of-join
      // formulation by one full join. Arithmetic discipline: cents are
      // exact ints, the interpolation numerator cents·gap_us stays in
      // int64 (≤ 1e5 · 2.6e12 ≈ 2.6e17 per term, two terms < 9.2e18),
      // and the ONLY doubles are the two closing casts — int64→double
      // and the division round identically (IEEE nearest) in both
      // engines. Grid rows sort AFTER a same-instant event (is_grid 1 >
      // 0), so an exact-hit grid point takes that event as prev (gap 0
      // ⇒ interp == locf exactly) and strictly-later events as next —
      // denominators are never zero by construction.
      val hourUs = 3600L * 1000 * 1000
      val ev = Tables.load(s, dir, "events").filter(col("user_id") < 10)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("cents", (dec(col("value")) * 100).cast("long"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(expr(s"ts_us div $hourUs")).as("h0"),
          max(expr(s"ts_us div $hourUs")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("h"))
        .select(col("user_id"), (col("h") * hourUs).as("t_us"),
          lit(1).as("is_grid"), lit(-1L).as("ek"),
          lit(null).cast("long").as("cents"))
      val pts = ev.select(col("user_id"), col("ts_us").as("t_us"),
          lit(0).as("is_grid"), col("event_id").as("ek"), col("cents"))
        .unionByName(grid)
        .withColumn("pv", when(col("is_grid") === 0,
          struct(col("t_us").as("pts"), col("cents").as("pc"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("t_us"), col("is_grid"), col("ek"))
      val uPre = org.apache.spark.sql.expressions.Window.unboundedPreceding
      val uFol = org.apache.spark.sql.expressions.Window.unboundedFollowing
      val filled = pts
        .withColumn("prev", last(col("pv"), ignoreNulls = true)
          .over(w.rowsBetween(uPre, 0)))
        .withColumn("nxt", first(col("pv"), ignoreNulls = true)
          .over(w.rowsBetween(1, uFol)))
        .filter(col("is_grid") === 1)
      val pc = col("prev").getField("pc")
      val pt = col("prev").getField("pts")
      val nc = col("nxt").getField("pc")
      val nt = col("nxt").getField("pts")
      filled.select(col("user_id"), col("t_us"),
          (pc.cast("double") / 100.0).as("locf"),
          when(col("prev").isNotNull && col("nxt").isNotNull,
            (pc * (nt - col("t_us")) + nc * (col("t_us") - pt))
              .cast("double") / (nt - pt).cast("double") / 100.0)
            .as("interp"))
        .orderBy(col("user_id"), col("t_us"))
    },

    "p17_ewma" -> { (s, dir) =>
      // Bounded-window EWMA (α = 3/4 decay over the last 16
      // observations) — the smoothing primitive behind monitoring
      // baselines and feature decay. The recursive definition doesn't
      // distribute; the BOUNDED form is a 16-term lag combination, i.e.
      // ONE window pass over one shuffle on user_id — no self-join, no
      // fan-out, scale = the p03 sessionize shape. Exactness: the
      // rational weights (3/4)^k are cleared to INTEGERS w_k =
      // 3^k·4^(15-k) (num and denom both scale by 4^15, which
      // cancels); every cents·w_k term and both sums stay under 2^53
      // (≤ 1e5·4^15·Σ(3/4)^k ≈ 4.3e14), so the closing int64→double
      // casts are EXACT — not merely identically rounded — in both
      // engines (a 10^15-scaled 0.9-decay variant fails the gate by one
      // ulp: DuckDB's hugeint→double cast is not correctly rounded past
      // 2^53). The normalizing denominator sums only the weights whose
      // lag exists, so the leading-edge partial window stays exact
      // instead of zero-padded. One closing double division.
      val W = 16
      val weights: Seq[Long] = (0 until W).map(k =>
        (BigInt(3).pow(k) * BigInt(4).pow(W - 1 - k)).toLong)
      val ev = Tables.load(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("cents", (dec(col("value")) * 100).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val num = weights.zipWithIndex.map { case (wk, k) =>
        val lk = if (k == 0) col("cents") else lag(col("cents"), k).over(w)
        when(lk.isNotNull, lk * lit(wk)).otherwise(lit(0L))
      }.reduce(_ + _)
      val den = weights.zipWithIndex.map { case (wk, k) =>
        val lk = if (k == 0) col("cents") else lag(col("cents"), k).over(w)
        when(lk.isNotNull, lit(wk)).otherwise(lit(0L))
      }.reduce(_ + _)
      ev.withColumn("n_terms",
          least(row_number().over(w).cast("long"), lit(W.toLong)))
        .withColumn("ewma",
          num.cast("double") / den.cast("double") / 100.0)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("n_terms"), col("ewma"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    },

    "p18_scd2_history" -> { (s, dir) =>
      // SCD TYPE-2 history build — the warehouse-dimension staple: per
      // user, consecutive events with the SAME event_type collapse into
      // one validity interval [valid_from, valid_to), the last run left
      // open (is_current). The gaps-and-islands run-id trick (lag +
      // running sum — p03's machinery on attribute CHANGE instead of
      // time gaps), then lead() over the run grain fills each interval's
      // close from the next run's open — so the whole build is TWO
      // window passes and one groupBy, all on the same user_id
      // partitioning (one shuffle, reused). Exact integer micros
      // everywhere; at 100 TB this is the standard incremental-dimension
      // backfill shape (runs per user ≪ events per user).
      val ev = Tables.load(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("ts_us", expr("ts div 1000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val uPre = org.apache.spark.sql.expressions.Window.unboundedPreceding
      val runs = ev
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .withColumn("chg",
          when(col("prev_type").isNull ||
            col("prev_type") =!= col("event_type"), 1L).otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(w.rowsBetween(uPre, 0)))
        .groupBy(col("user_id"), col("run_id"), col("event_type"))
        .agg(min(col("ts_us")).as("valid_from"),
          count(lit(1)).as("n_events"))
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("run_id"))
      runs
        .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
        .withColumn("is_current",
          when(col("valid_to").isNull, 1L).otherwise(0L))
        .select(col("user_id"), col("run_id"), col("event_type"),
          col("valid_from"), col("valid_to"), col("n_events"),
          col("is_current"))
        .orderBy(col("user_id"), col("run_id"))
    },

    "p14_daily_bars" -> { (s, dir) =>
      // OHLC daily BARS per user — open/high/low/close of the event
      // value stream: open and close are the first/last value by the
      // (ts, event_id) total order, carried by MIN/MAX over a
      // (ts, event_id, cents) STRUCT (lexicographic struct ordering is
      // identical in both engines — the d10 arg-min trick), so the whole
      // bar is ONE partial-aggregated groupBy: no window, no second
      // shuffle, first/last/high/low all ride the same map-side combine.
      // The textbook at-scale shape for per-key-per-bucket summaries.
      val dayUs = 86400L * 1000 * 1000
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("cents", (dec(col("value")) * 100).cast("long"))
        .withColumn("day", expr(s"ts_us div $dayUs"))
        .withColumn("key",
          struct(col("ts_us"), col("event_id"), col("cents")))
      ev.groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          (min(col("key")).getField("cents").cast("double") / 100)
            .as("open"),
          (max(col("cents")).cast("double") / 100).as("high"),
          (min(col("cents")).cast("double") / 100).as("low"),
          (max(col("key")).getField("cents").cast("double") / 100)
            .as("close"))
        .filter(col("user_id") < 50)
        .orderBy(col("user_id"), col("day"))
    },

    "p20_interval_overlap" -> { (s, dir) =>
      // KEYLESS interval-overlap join, BINNED — p02 has an equi key
      // (the order) to hang its band on; this one has none: every
      // promo window vs every in-flight shipment ("how many shipments
      // were in transit during each promotion"). Declared naively
      // that is a cartesian theta join — O(N·M) and the #1 interval
      // anti-pattern at 100 TB. The scale form (the genomics/Hail
      // bin-join): explode each interval onto the coarse time buckets
      // it covers (fanout = span/bucket ≈ 1–2 here, bounded by the
      // max interval length), equi-join on the bucket — temporal
      // locality restored, shuffle keyed and prunable — and count
      // each overlapping pair EXACTLY ONCE by crediting only the
      // bucket containing the later of the two starts (that date lies
      // in both intervals, so both sides exploded it), which kills
      // the post-join distinct a naive bin-join needs (no second
      // corpus-sized shuffle). Core in operators/IntervalJoin.scala
      // (property-pinned == brute force by IntervalJoinPropSpec); the
      // oracle is the brute-force theta join — same semantics, the
      // shape this one exists to avoid.
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") <= 800)
        .select(col("o_orderkey"), col("o_orderdate").as("p_start"))
        .withColumn("p_end", expr("p_start + INTERVAL 7 DAYS"))
      // The testdata lineitem carries no receipt date; transit time is
      // derived deterministically from the line number (5..29 days —
      // under one bucket width, so the explode fanout stays ≤ 2).
      val l2 = Tables.load(s, dir, "lineitem")
        .filter(col("l_partkey") < 1000)
        .select(col("l_shipdate").as("s_start"),
          expr("l_shipdate + (1 + l_linenumber * 4) * INTERVAL 1 DAY")
            .as("s_end"))
      graft.operators.IntervalJoin
        .overlap(o, l2, "p_start", "p_end", "s_start", "s_end", 30)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_inflight"),
          sum(datediff(col("s_end"), col("s_start")).cast("long"))
            .as("transit_days"))
        .orderBy(col("o_orderkey"))
    },

    "p21_concurrency" -> { (s, dir) =>
      // Interval SWEEP-LINE per key — peak overlap depth and union
      // coverage, the two interval aggregates p15/p20 don't answer:
      // "how many shipments were in transit AT ONCE per supplier, and
      // how many distinct days had anything in transit". The classic
      // single-pass form: each interval becomes a +1 event at its
      // start and a -1 at its (exclusive) end; sorted by (ts, delta)
      // the running sum IS the concurrency curve, and its max the
      // peak (-1 sorts before +1, so back-to-back intervals — one
      // ending exactly when the next starts — are never counted as
      // concurrent, matching p20's half-open overlap). Coverage rides
      // the p15 islands trick on the raw intervals: a new island
      // starts where st exceeds the running max of prior ends
      // (touching spans merge — union length is identical either
      // way). Scale: both passes are windows PARTITIONed BY the key —
      // per-key sorted sweeps distribute across executors exactly like
      // any keyed window; no cross-key traffic, no driver state. Peak
      // determinism under sort ties: within an equal-(ts,delta) run
      // the intermediate running sums depend on tie order, but the
      // MAX is always attained at the end of a +1 run, which every
      // order reaches with the same value — and the oracle sweeps the
      // same events. Bounded to suppkey ≤ 100 only to keep graded
      // output stable across SFs.
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_suppkey") <= 100)
        .select(col("l_suppkey").as("k"),
          col("l_shipdate").as("st"),
          expr("l_shipdate + (1 + l_linenumber * 4) * INTERVAL 1 DAY")
            .as("en"))
      sweepSummary(l)
        .select(col("k").as("l_suppkey"), col("n_intervals"),
          col("peak_concurrency"), col("n_islands"), col("covered_days"))
        .orderBy(col("l_suppkey"))
    }
  )

  /** p21's core over any (k, st: date, en: date) frame with half-open
    * intervals [st, en): per key, interval count, peak overlap depth,
    * merged-island count (touching spans merge) and union coverage in
    * days. Exposed for `SweepLinePropSpec`'s brute-force equivalence. */
  private[graft] def sweepSummary(l: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val ev = l.select(col("k"), col("st").as("ts"), lit(1L).as("delta"))
      .unionAll(l.select(col("k"), col("en").as("ts"),
        lit(-1L).as("delta")))
    val wSweep = W.partitionBy(col("k")).orderBy(col("ts"), col("delta"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val peak = ev.withColumn("depth", sum(col("delta")).over(wSweep))
      .groupBy(col("k")).agg(max(col("depth")).as("peak_concurrency"))
    val wIsl = W.partitionBy(col("k")).orderBy(col("st"), col("en"))
    val cov = l
      .withColumn("prev_max_en",
        max(col("en")).over(wIsl.rowsBetween(W.unboundedPreceding, -1)))
      .withColumn("new_isl",
        when(col("prev_max_en").isNull ||
          col("st") > col("prev_max_en"), 1L).otherwise(0L))
      .withColumn("isl_id", sum(col("new_isl"))
        .over(wIsl.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy(col("k"), col("isl_id"))
      .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_islands"),
        sum(datediff(col("ien"), col("ist")).cast("long"))
          .as("covered_days"))
    l.groupBy(col("k")).agg(count(lit(1)).as("n_intervals"))
      .join(peak, "k").join(cov, "k")
  }

  def oracle: Map[String, String] = Map(
    // Same sweep: ±1 events ordered (ts, delta) so ends precede starts
    // at equal timestamps (half-open), islands by running-max-of-ends.
    "p21_concurrency" ->
      """WITH l AS (
        | SELECT l_suppkey AS k, l_shipdate AS st,
        |  l_shipdate + (1 + l_linenumber * 4) * INTERVAL 1 DAY AS en
        | FROM lineitem WHERE l_suppkey <= 100),
        |ev AS (
        | SELECT k, st AS ts, CAST(1 AS BIGINT) AS delta FROM l
        | UNION ALL
        | SELECT k, en AS ts, CAST(-1 AS BIGINT) AS delta FROM l),
        |dep AS (
        | SELECT k, SUM(delta) OVER (PARTITION BY k ORDER BY ts, delta
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
        | FROM ev),
        |pk AS (
        | SELECT k, CAST(MAX(depth) AS BIGINT) AS peak_concurrency
        | FROM dep GROUP BY k),
        |mx AS (
        | SELECT k, st, en, MAX(en) OVER (PARTITION BY k ORDER BY st, en
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |   AS prev_max_en
        | FROM l),
        |isl AS (
        | SELECT k, st, en,
        |  SUM(CASE WHEN prev_max_en IS NULL OR st > prev_max_en
        |    THEN 1 ELSE 0 END) OVER (PARTITION BY k ORDER BY st, en
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
        | FROM mx),
        |ii AS (
        | SELECT k, isl_id, MIN(st) AS ist, MAX(en) AS ien
        | FROM isl GROUP BY k, isl_id),
        |cov AS (
        | SELECT k, CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(SUM(date_diff('day', ist, ien)) AS BIGINT) AS covered_days
        | FROM ii GROUP BY k),
        |base AS (
        | SELECT k, CAST(COUNT(*) AS BIGINT) AS n_intervals
        | FROM l GROUP BY k)
        |SELECT base.k AS l_suppkey, n_intervals, peak_concurrency,
        | n_islands, covered_days
        |FROM base JOIN pk USING (k) JOIN cov USING (k)
        |ORDER BY l_suppkey""".stripMargin,

    // Brute-force keyless theta join — the O(N·M) shape p20's binned
    // Spark plan replaces; identical overlap semantics (half-open).
    "p20_interval_overlap" ->
      """WITH o AS (
        | SELECT o_orderkey, o_orderdate AS p_start,
        |  o_orderdate + INTERVAL 7 DAY AS p_end
        | FROM orders WHERE o_orderkey <= 800),
        |l AS (
        | SELECT l_shipdate AS s_start,
        |  l_shipdate + (1 + l_linenumber * 4) * INTERVAL 1 DAY AS s_end
        | FROM lineitem WHERE l_partkey < 1000)
        |SELECT o_orderkey, COUNT(*) AS n_inflight,
        | CAST(SUM(date_diff('day', s_start, s_end)) AS BIGINT)
        |   AS transit_days
        |FROM o JOIN l ON s_start < p_end AND p_start < s_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "p01_asof_join" ->
      """SELECT l.event_id, l.user_id, l.value,
        | CAST(epoch_us(r.ts) AS BIGINT) AS asof_click_us,
        | r.value AS asof_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') r
        | ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // Nearest = the closer of DuckDB's two native ASOF directions, ties
    // backward; distances compare at ns so the pick matches Spark's
    // ns-long arithmetic exactly.
    "p19_asof_nearest" ->
      """WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |r AS (SELECT * FROM events WHERE event_type = 'click'),
        |b AS (
        | SELECT l.event_id, r.ts AS bts, r.value AS bval
        | FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (
        | SELECT l.event_id, r.ts AS fts, r.value AS fval
        | FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts),
        |j AS (
        | SELECT l.event_id, l.user_id, l.value,
        |  b.bts, b.bval, f.fts, f.fval,
        |  CASE WHEN f.fts IS NULL OR (b.bts IS NOT NULL AND
        |    epoch_ns(l.ts) - epoch_ns(b.bts)
        |      <= epoch_ns(f.fts) - epoch_ns(l.ts))
        |   THEN 1 ELSE 0 END AS back
        | FROM l
        |  JOIN b ON l.event_id = b.event_id
        |  JOIN f ON l.event_id = f.event_id)
        |SELECT event_id, user_id, value,
        | CAST(epoch_us(CASE WHEN back = 1 THEN bts ELSE fts END)
        |   AS BIGINT) AS near_click_us,
        | CASE WHEN back = 1 THEN bval ELSE fval END AS asof_click_value,
        | CAST(back AS BIGINT) AS asof_dir_back
        |FROM j
        |WHERE (CASE WHEN back = 1 THEN bts ELSE fts END) IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "p08_event_transitions" ->
      """WITH t AS (
        | SELECT event_type,
        |  lead(event_type) OVER w AS next_type,
        |  epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap_us
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type, next_type, COUNT(*) AS n,
        | CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
        | CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
        |FROM t WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p09_funnel" ->
      """WITH v AS (
        | SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
        | WHERE event_type = 'view' GROUP BY user_id),
        |fc AS (
        | SELECT e.user_id, v.v_us, MIN(epoch_us(e.ts)) AS c_us
        | FROM events e JOIN v ON e.user_id = v.user_id
        | WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.v_us
        |  AND epoch_us(e.ts) <= v.v_us + 604800000000
        | GROUP BY e.user_id, v.v_us),
        |fp AS (
        | SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
        | FROM events e JOIN fc ON e.user_id = fc.user_id
        | WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fc.c_us
        |  AND epoch_us(e.ts) <= fc.v_us + 604800000000
        | GROUP BY e.user_id),
        |staged AS (
        | SELECT v.user_id, v.v_us, fc.c_us, fp.p_us,
        |  CAST(1 + CASE WHEN fc.c_us IS NOT NULL THEN 1 ELSE 0 END +
        |       CASE WHEN fp.p_us IS NOT NULL THEN 1 ELSE 0 END
        |    AS BIGINT) AS stage
        | FROM v LEFT JOIN fc ON v.user_id = fc.user_id
        |  LEFT JOIN fp ON v.user_id = fp.user_id)
        |SELECT stage, COUNT(*) AS n_users,
        | CAST(SUM(c_us - v_us) AS BIGINT) AS total_click_lag_us,
        | CAST(SUM(p_us - c_us) AS BIGINT) AS total_purchase_lag_us
        |FROM staged GROUP BY stage ORDER BY stage""".stripMargin,

    "p10_retention_cohorts" ->
      """WITH f AS (
        | SELECT user_id, MIN(epoch_us(ts)) AS first_us
        | FROM events GROUP BY user_id),
        |a AS (
        | SELECT e.user_id,
        |  f.first_us // 604800000000 AS cohort_week,
        |  epoch_us(e.ts) // 604800000000
        |    - f.first_us // 604800000000 AS week_offset
        | FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort_week, week_offset,
        | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "p11_rolling_anomaly" ->
      """WITH daily AS (
        | SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |  COUNT(*) AS n_events,
        |  SUM(CAST(value AS DECIMAL(12,2))) AS dv
        | FROM events GROUP BY 1, 2),
        |w AS (
        | SELECT event_type, day, n_events, dv,
        |  SUM(dv) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tsum,
        |  COUNT(dv) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS tn
        | FROM daily)
        |SELECT event_type, day, n_events,
        | CAST(dv AS DOUBLE) AS day_value,
        | CAST(tsum AS DOUBLE) / tn AS trail_avg,
        | CAST(CASE WHEN tn > 0 AND tn * dv > 2 * tsum
        |   THEN 1 ELSE 0 END AS BIGINT) AS is_spike
        |FROM w ORDER BY event_type, day""".stripMargin,

    "p12_asof_tolerance" ->
      """SELECT l.event_id, l.user_id, l.value,
        | CASE WHEN r.ts IS NOT NULL
        |   AND epoch_us(l.ts) - epoch_us(r.ts) <= 600000000
        |  THEN CAST(epoch_us(r.ts) AS BIGINT) END AS asof_click_us,
        | CASE WHEN r.ts IS NOT NULL
        |   AND epoch_us(l.ts) - epoch_us(r.ts) <= 600000000
        |  THEN r.value END AS asof_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        | ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "p13_twap" ->
      """WITH g AS (
        | SELECT user_id,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
        |  epoch_us(ts) AS ts_us,
        |  lead(epoch_us(ts)) OVER w AS next_us
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, COUNT(*) AS n_intervals,
        | CAST(SUM(next_us - ts_us) AS BIGINT) AS total_gap_us,
        | CAST(SUM(CAST(cents * (next_us - ts_us) AS DECIMAL(38,0)))
        |     AS DOUBLE)
        |   / CAST(SUM(next_us - ts_us) AS BIGINT) / 100.0 AS twap
        |FROM g WHERE next_us IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "p15_interval_islands" ->
      """WITH e AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  epoch_us(ts) + 600000000 AS end_us
        | FROM events),
        |m AS (
        | SELECT user_id, event_id, ts_us, end_us,
        |  MAX(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS max_prev_end
        | FROM e),
        |g AS (
        | SELECT user_id, event_id, ts_us, end_us,
        |  CASE WHEN max_prev_end IS NULL OR ts_us > max_prev_end
        |       THEN 1 ELSE 0 END AS new_island
        | FROM m),
        |isl AS (
        | SELECT user_id, ts_us, end_us,
        |  CAST(SUM(new_island) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS island
        | FROM g)
        |SELECT user_id, island,
        | CAST(MIN(ts_us) AS BIGINT) AS island_start_us,
        | CAST(MAX(end_us) AS BIGINT) AS island_end_us,
        | COUNT(*) AS n_events
        |FROM isl GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin,

    "p16_gap_fill" ->
      """WITH ev AS (
        | SELECT user_id, epoch_us(ts) AS t_us, 0 AS is_grid,
        |  event_id AS ek,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        | FROM events WHERE user_id < 10),
        |b AS (
        | SELECT user_id, MIN(t_us) // 3600000000 AS h0,
        |  MAX(t_us) // 3600000000 AS h1
        | FROM ev GROUP BY user_id),
        |grid AS (
        | SELECT user_id, unnest(range(h0, h1 + 1)) * 3600000000 AS t_us,
        |  1 AS is_grid, CAST(-1 AS BIGINT) AS ek,
        |  CAST(NULL AS BIGINT) AS cents
        | FROM b),
        |pts AS (
        | SELECT user_id, t_us, is_grid, ek, cents,
        |  CASE WHEN is_grid = 0
        |       THEN {'pts': t_us, 'pc': cents} END AS pv
        | FROM (SELECT * FROM ev UNION ALL SELECT * FROM grid)),
        |m AS (
        | SELECT user_id, t_us, is_grid,
        |  last_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY t_us, is_grid, ek
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
        |  first_value(pv IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY t_us, is_grid, ek
        |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
        | FROM pts)
        |SELECT user_id, t_us,
        | CAST((prev).pc AS DOUBLE) / 100.0 AS locf,
        | CASE WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
        |  CAST((prev).pc * ((nxt).pts - t_us)
        |       + (nxt).pc * (t_us - (prev).pts) AS DOUBLE)
        |   / CAST((nxt).pts - (prev).pts AS DOUBLE) / 100.0
        | END AS interp
        |FROM m WHERE is_grid = 1
        |ORDER BY user_id, t_us""".stripMargin,

    "p17_ewma" -> {
      val W = 16
      val weights = (0 until W).map(k =>
        (BigInt(3).pow(k) * BigInt(4).pow(W - 1 - k)).toLong)
      val num = weights.zipWithIndex.map { case (wk, k) =>
        val lk = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
        s"CASE WHEN $lk IS NOT NULL THEN CAST($lk AS BIGINT) * $wk ELSE 0 END"
      }.mkString("\n    + ")
      val den = weights.zipWithIndex.map { case (wk, k) =>
        val lk = if (k == 0) "cents" else s"lag(cents, $k) OVER w"
        s"CASE WHEN $lk IS NOT NULL THEN CAST($wk AS BIGINT) ELSE 0 END"
      }.mkString("\n    + ")
      s"""WITH ev AS (
         | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
         | FROM events WHERE user_id < 40)
         |SELECT user_id, event_id, ts_us,
         | LEAST(CAST(row_number() OVER w AS BIGINT), $W) AS n_terms,
         | CAST($num AS DOUBLE)
         |  / CAST($den AS DOUBLE) / 100.0 AS ewma
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         |ORDER BY user_id, ts_us, event_id""".stripMargin
    },

    "p18_scd2_history" ->
      """WITH ev AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
        | FROM events WHERE user_id < 40),
        |marked AS (
        | SELECT user_id, event_id, event_type, ts_us,
        |  CASE WHEN lag(event_type) OVER w IS NULL
        |        OR lag(event_type) OVER w <> event_type
        |       THEN 1 ELSE 0 END AS chg
        | FROM ev
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |runs AS (
        | SELECT user_id, event_type, ts_us,
        |  CAST(SUM(chg) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS run_id
        | FROM marked),
        |grp AS (
        | SELECT user_id, run_id, event_type,
        |  CAST(MIN(ts_us) AS BIGINT) AS valid_from,
        |  COUNT(*) AS n_events
        | FROM runs GROUP BY user_id, run_id, event_type)
        |SELECT user_id, run_id, event_type, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |   AS valid_to,
        | n_events,
        | CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
        |     ORDER BY run_id) IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |   AS is_current
        |FROM grp ORDER BY user_id, run_id""".stripMargin,

    "p14_daily_bars" ->
      """WITH e AS (
        | SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |  {'ts_us': epoch_us(ts), 'event_id': event_id,
        |   'cents': CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)}
        |    AS key,
        |  CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        | FROM events)
        |SELECT user_id, day, COUNT(*) AS n_events,
        | CAST((MIN(key)).cents AS DOUBLE) / 100 AS open,
        | CAST(MAX(cents) AS DOUBLE) / 100 AS high,
        | CAST(MIN(cents) AS DOUBLE) / 100 AS low,
        | CAST((MAX(key)).cents AS DOUBLE) / 100 AS close
        |FROM e WHERE user_id < 50
        |GROUP BY user_id, day ORDER BY user_id, day""".stripMargin,

    "p06_asof_forward" ->
      """SELECT l.event_id, l.user_id,
        | CAST(epoch_us(r.ts) AS BIGINT) AS next_purchase_us,
        | r.value AS asof_p_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') l
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        | ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "p07_session_window" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess
        | FROM events WHERE user_id < 40
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, ts, value,
        |  SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        | FROM g)
        |SELECT user_id,
        | CAST(min(epoch_us(ts)) AS BIGINT) AS session_start_us,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start_us""".stripMargin,

    "p02_range_join" ->
      """SELECT o_orderkey, COUNT(*) AS n_within_30d
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        | AND l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
        |WHERE o_orderkey <= 2000
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "p03_sessionize" ->
      """WITH g AS (
        | SELECT user_id, ts, event_id, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess
        | FROM events WHERE user_id < 40
        | WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        | SELECT user_id, event_id, value,
        |  CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM g)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "p05_asof_tolerance" ->
      """SELECT l.event_id, l.user_id, l.value,
        | CASE WHEN r.ts >= l.ts - INTERVAL 2 HOUR
        |      THEN CAST(epoch_us(r.ts) AS BIGINT) END AS asof_click_us,
        | CASE WHEN r.ts >= l.ts - INTERVAL 2 HOUR
        |      THEN r.value END AS asof_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') r
        | ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    "p04_salted_join" ->
      """SELECT s_nationkey AS nk, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY nk""".stripMargin
  )
}
