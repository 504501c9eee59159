package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational / analytical queries over the TPC-H-ish star schema and the
  * `events` stream table — the operator categories the reference lacks
  * entirely (SURVEY.md §2.1): joins of all kinds, aggregation, windows,
  * sessionization, rollup, set ops, top-k.
  *
  * Cross-engine determinism: every floating-point SUM is taken over values
  * cast to DECIMAL(28,10) first — per-row double→decimal conversion is
  * deterministic and the decimal sum is exact and order-independent, so
  * Spark and DuckDB hash-match bit-for-bit regardless of partitioning.
  * (A raw double sum is order-dependent in the last bits.)
  *
  * Output-dtype portability: aggregate RESULTS are cast back to DOUBLE (and
  * window-sum counters to BIGINT) in both engines. Left as-is, DuckDB
  * returns DECIMAL(38,10)/HUGEINT where Spark's parquet has decimal/int64 —
  * numerically equal but dtype-different, which a dtype-sensitive
  * row-hash compare flags as a mismatch. The decimal sum is exact, so the
  * final one-time cast to double is the same correctly-rounded value in
  * both engines.
  *
  * Scale notes: dimension tables (region/nation/customer/supplier/part) are
  * broadcast — no shuffle on the fact side for those joins; fact-fact joins
  * (orders⋈lineitem) shuffle on the join key once and reuse it for the
  * following aggregate where possible. AQE handles skew at 100 TB.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(28,10)")
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    if (n == "events") Tables.events(s, dir) // ns-timestamp handling
    else Tables.load(s, dir, n)

  val all: Map[String, Q] = Map(
    // TPC-H Q1 shape: scan-heavy single-pass aggregate; filter and the two
    // grouping columns push down to the parquet scan.
    "q1_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: broadcast customer dim, shuffle join orders⋈lineitem,
    // top-10 by exact decimal revenue (deterministic tiebreak on key).
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_dec"))
        // top-10 decided on the EXACT decimal (deterministic tiebreak on
        // key); only the surviving 10 rows are cast for output
        .orderBy(col("revenue_dec").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate"),
          col("revenue_dec").cast("double").as("revenue"))
    }),

    // TPC-H Q5 shape: star join — all dims broadcast, one shuffle for the
    // orders⋈lineitem fact join, aggregate by nation.
    "q5_local_supplier" -> ((s, dir) => {
      val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val nation = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val supp = t(s, dir, "supplier")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      t(s, dir, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))
    }),

    // Window ranking: top-3 suppliers by exact revenue within each nation.
    "window_supplier_rank" -> ((s, dir) => {
      val supp = t(s, dir, "supplier")
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice"))).as("revenue"))
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
      rev.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("s_nationkey"), col("s_suppkey"),
          col("revenue").cast("double").as("revenue"),
          col("rnk").cast("long").as("rnk"))
    }),

    // Sessionization (gaps-and-islands, 30-minute inactivity gap) — the
    // streaming session_window semantics expressed relationally so the
    // oracle can verify it; the streaming module reuses the same threshold.
    "events_sessionize" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
      ev.withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ms").isNull ||
            col("ts_ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("start_ms"),
          max(col("ts_ms")).as("end_ms"))
    }),

    // Bounce rate per day (the web-analytics KPI on top of the
    // sessionize kernel): sessions whose event count is 1, grouped by
    // the session's START day — same 30-minute gaps-and-islands
    // construction as events_sessionize (one definition discipline:
    // identical window arithmetic, replayed identically), plus a
    // duration mean over the non-bounce sessions. One user exchange,
    // then session- and day-grain frames.
    "events_bounce_rate" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      val sess = ev
        .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ms").isNull ||
            col("ts_ms") - col("prev_ms") > 1800000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_ms")).as("start_ms"),
          max(col("ts_ms")).as("end_ms"))
      sess
        .groupBy(date_format(
          timestamp_millis(col("start_ms")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L))
            .as("n_bounce"),
          sum(when(col("n_events") > 1L, col("end_ms") - col("start_ms"))
            .otherwise(0L)).as("dur_sum_ms"),
          sum(when(col("n_events") > 1L, 1L).otherwise(0L))
            .as("n_engaged"))
        .select(col("day"), col("n_sessions"), col("n_bounce"),
          (col("n_bounce").cast("double") /
            col("n_sessions").cast("double")).as("bounce_rate"),
          when(col("n_engaged") > 0L,
            col("dur_sum_ms").cast("double") /
              col("n_engaged").cast("double")).as("mean_engaged_ms"))
    }),

    // Rollup (grouping sets) over the event stream.
    "rollup_daily" -> ((s, dir) =>
      t(s, dir, "events")
        .rollup(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))),

    // Cube (full grouping-set lattice) over the event stream.
    "cube_daily" -> ((s, dir) =>
      t(s, dir, "events")
        .cube(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))),

    // Rolling window frame: per-user trailing sum over the last 7 events
    // (ROWS frame, deterministic order, exact decimal accumulation).
    "window_rolling_sum" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id")).rowsBetween(-6, 0)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .withColumn("rolling_sum",
          sum(dec(col("value"))).over(byUser).cast("double"))
        .select(col("event_id"), col("user_id"), col("ts_ms"),
          col("rolling_sum"))
    }),

    // Supplier scorecard (the procurement KPI table): per supplier,
    // item volume, exact revenue, return share (returnflag R), mean
    // ship latency in days (exact integer day sums — the synthetic
    // dates make some latencies negative, handled by plain BIGINT
    // arithmetic), and the share shipped more than 60 days after
    // ordering (threshold between the measured median 36 and p90).
    // One fact-fact orderkey shuffle, then a 100-key supplier rollup.
    "supplier_scorecard" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("lat", expr(
          "CAST(datediff(to_date(l_shipdate), to_date(o_orderdate))" +
            " AS BIGINT)"))
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("rev_dec"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("n_returned"),
          sum(col("lat")).as("lat_sum"),
          sum(when(col("lat") > 60L, 1L).otherwise(0L)).as("n_late"))
        .select(col("l_suppkey"), col("n_items"),
          col("rev_dec").cast("double").as("revenue"),
          (col("n_returned").cast("double") / col("n_items").cast("double"))
            .as("return_share"),
          (col("lat_sum").cast("double") / col("n_items").cast("double"))
            .as("mean_latency_days"),
          (col("n_late").cast("double") / col("n_items").cast("double"))
            .as("late_share"))),

    // Unit-price drift per brand (the Laspeyres-style price index a
    // procurement dashboard tracks): monthly Σprice/Σqty from exact
    // DECIMAL sums, indexed against the brand's FIRST month via a
    // per-brand window first_value — months sort lexically as
    // yyyy-MM-01 strings, so frame order is engine-free. The part dim
    // broadcasts; the fact-fact orderkey join is the one big shuffle
    // pair; the index window runs on the (brand × month) frame.
    "part_price_drift" -> ((s, dir) => {
      val m = t(s, dir, "lineitem")
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          date_format(date_trunc("month", col("o_orderdate")),
            "yyyy-MM-01").as("month"))
        .agg(sum(dec(col("l_extendedprice"))).as("ep_dec"),
          sum(dec(col("l_quantity"))).as("q_dec"))
        .withColumn("unit_price",
          col("ep_dec").cast("double") / col("q_dec").cast("double"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("month"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      m.withColumn("base", first(col("unit_price")).over(w))
        .select(col("p_brand"), col("month"), col("unit_price"),
          (col("unit_price") / col("base")).as("price_index"))
    }),

    // ABC inventory classification (the Pareto curve as a report):
    // parts ranked by exact revenue, classified by their cumulative
    // revenue share INCLUDING self — A up to 80%, B to 95%, C the tail
    // — then rolled up per class. The rank/cumsum windows run on the
    // PART-GRAIN frame (catalog-bounded, not fact-bounded — the 1-row
    // total and the global window are allowlisted on that basis); the
    // only fact-sized exchange is the partkey groupBy.
    "orders_abc_analysis" -> ((s, dir) => {
      val pr = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("rev_dec"))
      val tot = pr.agg(sum(col("rev_dec")).as("tot_dec"))
      val w = Window.orderBy(col("rev_dec").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pr.crossJoin(broadcast(tot))
        .withColumn("cum_share",
          sum(col("rev_dec")).over(w).cast("double") /
            col("tot_dec").cast("double"))
        .withColumn("abc_class",
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B").otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev_dec")).as("cls_dec"))
        .select(col("abc_class"), col("n_parts"),
          col("cls_dec").cast("double").as("class_revenue"))
    }),

    // RANGE window frame (value-based, vs window_rolling_sum's ROWS
    // frame): per order, the same customer's order count and revenue
    // within ±3 DAYS of it — the frame every "orders near this one"
    // audit uses. The range key is integer epoch days, so frame edges
    // are exact in both engines and the result is tie-order-free by
    // construction (RANGE frames aggregate peers together).
    "window_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("od_day")).rangeBetween(-3, 3)
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          expr("CAST(datediff(to_date(o_orderdate), DATE '1970-01-01')" +
            " AS BIGINT)").as("od_day"),
          col("o_totalprice"))
        .withColumn("n_near", count(lit(1)).over(w))
        .withColumn("near_total",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select(col("o_orderkey"), col("o_custkey"), col("od_day"),
          col("n_near"), col("near_total"))
    }),

    // Pivot (conditional aggregation onto a known column set).
    "pivot_type_day" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // Approximate aggregates (HLL++ distinct, quantile sketch) — the
    // constant-memory forms that replace exact distinct/percentile at
    // 100 TB. Sketch values are engine-specific, so the oracle-checkable
    // surface is the ERROR BOUND, not the sketch: emit the exact anchor
    // plus pass/fail booleans (HLL within 5% of exact distinct; approx
    // median between exact p45 and p55). The oracle recomputes the exact
    // anchor and asserts the booleans are true — a sketch regression in
    // either aggregate flips a boolean and fails the hash compare.
    "approx_user_stats" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id")).as("au"),
          percentile_approx(col("value"), lit(0.5), lit(10000)).as("am"),
          expr("percentile(value, 0.45)").as("p45"),
          expr("percentile(value, 0.55)").as("p55"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("au") - col("exact_users")) <=
            col("exact_users") * lit(0.05)).as("users_ok"),
          (col("am") >= col("p45") && col("am") <= col("p55"))
            .as("median_ok"))),

    // Set ops: purchasers who never hit an error / who also viewed.
    "set_except" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .distinct()
        .except(ev.filter(col("event_type") === "error")
          .select(col("user_id")).distinct())
    }),
    "set_intersect" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      ev.filter(col("event_type") === "purchase").select(col("user_id"))
        .distinct()
        .intersect(ev.filter(col("event_type") === "view")
          .select(col("user_id")).distinct())
    }),

    // Anti join: customers with no orders.
    "anti_join_customers" -> ((s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_name"))),

    // Semi join: parts that appear in some lineitem.
    "semi_join_parts" -> ((s, dir) =>
      t(s, dir, "part")
        .join(t(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"),
          "left_semi")
        .select(col("p_partkey"), col("p_brand"))),

    // Global top-k with deterministic tiebreak (TakeOrderedAndProject —
    // no global sort, per-partition heaps).
    "topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(15)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // Backward as-of join: each event enriched with the user's most recent
    // order at/before event time (graft.operators.AsofJoin — union+window,
    // one shuffle, no range join).
    "asof_join_orders" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("t_ms"))
      val ord = t(s, dir, "orders")
        .select(col("o_custkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("o_ms"),
          col("o_orderkey"), col("o_totalprice"))
      graft.operators.AsofJoin.asofBackward(
        ev, "user_id", "t_ms", "event_id",
        ord, "o_custkey", "o_ms", "o_orderkey",
        Seq("o_orderkey", "o_totalprice"))
    })
  )

  val oracles: Map[String, String] = Map(
    "approx_user_stats" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
                true AS users_ok, true AS median_ok
         FROM events GROUP BY 1""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, CAST(CAST(revenue_dec AS VARCHAR) AS DOUBLE) AS revenue
         FROM (
           SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                  sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS revenue_dec
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderdate < TIMESTAMP '1998-03-15'
             AND l_shipdate > TIMESTAMP '1998-03-15'
           GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
           ORDER BY revenue_dec DESC, l_orderkey LIMIT 10)""",
    "q5_local_supplier" ->
      """SELECT n_name,
                CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",
    "window_supplier_rank" ->
      """SELECT s_nationkey, s_suppkey, CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue, rnk
         FROM (
           SELECT s_nationkey, s_suppkey, revenue,
                  row_number() OVER (PARTITION BY s_nationkey
                    ORDER BY revenue DESC, s_suppkey) AS rnk
           FROM (
             SELECT l_suppkey AS k,
                    sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS revenue
             FROM lineitem GROUP BY l_suppkey) r
           JOIN supplier ON r.k = s_suppkey)
         WHERE rnk <= 3""",
    "events_sessionize" ->
      """SELECT user_id, sess_id, count(*) AS n_events,
                min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
         FROM (
           SELECT user_id, ts_ms,
                  CAST(sum(new_sess) OVER (PARTITION BY user_id
                    ORDER BY ts_ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
           FROM (
             SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                    CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                           ORDER BY epoch_ms(ts), event_id) IS NULL
                         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
                           > 1800000
                         THEN 1 ELSE 0 END AS new_sess
             FROM events))
         GROUP BY user_id, sess_id""",
    "events_bounce_rate" ->
      """WITH sess AS (
           SELECT user_id, sess_id, count(*) AS n_events,
                  min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
           FROM (
             SELECT user_id, ts_ms,
                    CAST(sum(new_sess) OVER (PARTITION BY user_id
                      ORDER BY ts_ms, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS sess_id
             FROM (
               SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                      CASE WHEN lag(epoch_ms(ts)) OVER (
                             PARTITION BY user_id
                             ORDER BY epoch_ms(ts), event_id) IS NULL
                           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
                             PARTITION BY user_id
                             ORDER BY epoch_ms(ts), event_id) > 1800000
                           THEN 1 ELSE 0 END AS new_sess
               FROM events))
           GROUP BY user_id, sess_id),
         g AS (
           SELECT strftime(epoch_ms(start_ms), '%Y-%m-%d') AS day,
                  count(*) AS n_sessions,
                  sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_bounce,
                  sum(CASE WHEN n_events > 1 THEN end_ms - start_ms
                    ELSE 0 END)::BIGINT AS dur_sum_ms,
                  sum(CASE WHEN n_events > 1 THEN 1 ELSE 0 END)::BIGINT
                    AS n_engaged
           FROM sess GROUP BY 1)
         SELECT day, n_sessions, n_bounce,
                CAST(n_bounce AS DOUBLE) / CAST(n_sessions AS DOUBLE)
                  AS bounce_rate,
                CASE WHEN n_engaged > 0
                  THEN CAST(dur_sum_ms AS DOUBLE) /
                       CAST(n_engaged AS DOUBLE) END AS mean_engaged_ms
         FROM g""",
    "rollup_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY ROLLUP (strftime(ts, '%Y-%m-%d'), event_type)""",
    "cube_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                count(*) AS n,
                CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
         FROM events
         GROUP BY CUBE (strftime(ts, '%Y-%m-%d'), event_type)""",
    "window_rolling_sum" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
                CAST(CAST(sum(CAST(value AS DECIMAL(28,10))) OVER (
                  PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
                  AS rolling_sum
         FROM events""",
    "supplier_scorecard" ->
      """WITH j AS (
           SELECT l_suppkey, l_extendedprice, l_discount, l_returnflag,
                  CAST(date_diff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         g AS (
           SELECT l_suppkey, count(*) AS n_items,
                  sum(CAST(l_extendedprice * (1.0 - l_discount)
                    AS DECIMAL(28,10))) AS rev_dec,
                  sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    ::BIGINT AS n_returned,
                  sum(lat)::BIGINT AS lat_sum,
                  sum(CASE WHEN lat > 60 THEN 1 ELSE 0 END)::BIGINT
                    AS n_late
           FROM j GROUP BY 1)
         SELECT l_suppkey, n_items,
                CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
                CAST(n_returned AS DOUBLE) / CAST(n_items AS DOUBLE)
                  AS return_share,
                CAST(lat_sum AS DOUBLE) / CAST(n_items AS DOUBLE)
                  AS mean_latency_days,
                CAST(n_late AS DOUBLE) / CAST(n_items AS DOUBLE)
                  AS late_share
         FROM g""",
    "part_price_drift" ->
      """WITH m AS (
           SELECT p_brand,
                  strftime(date_trunc('month', CAST(o_orderdate AS DATE)),
                    '%Y-%m-01') AS month,
                  sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS ep_dec,
                  sum(CAST(l_quantity AS DECIMAL(28,10))) AS q_dec
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN part ON l_partkey = p_partkey
           GROUP BY 1, 2),
         u AS (
           SELECT p_brand, month,
                  CAST(CAST(ep_dec AS VARCHAR) AS DOUBLE) /
                    CAST(CAST(q_dec AS VARCHAR) AS DOUBLE) AS unit_price
           FROM m)
         SELECT p_brand, month, unit_price,
                unit_price / first_value(unit_price) OVER (
                  PARTITION BY p_brand ORDER BY month
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS price_index
         FROM u""",
    "orders_abc_analysis" ->
      """WITH pr AS (
           SELECT l_partkey,
                  sum(CAST(l_extendedprice * (1.0 - l_discount)
                    AS DECIMAL(28,10))) AS rev_dec
           FROM lineitem GROUP BY 1),
         tot AS (SELECT sum(rev_dec) AS tot_dec FROM pr),
         c AS (
           SELECT l_partkey, rev_dec,
                  CAST(CAST(sum(rev_dec) OVER (
                      ORDER BY rev_dec DESC, l_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS VARCHAR) AS DOUBLE) /
                    CAST(CAST(tot_dec AS VARCHAR) AS DOUBLE) AS cum_share
           FROM pr CROSS JOIN tot)
         SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
                     WHEN cum_share <= 0.95 THEN 'B'
                     ELSE 'C' END AS abc_class,
                count(*) AS n_parts,
                CAST(CAST(sum(rev_dec) AS VARCHAR) AS DOUBLE)
                  AS class_revenue
         FROM c GROUP BY 1""",
    "window_range_frame" ->
      """SELECT o_orderkey, o_custkey,
                CAST(date_diff('day', DATE '1970-01-01',
                  CAST(o_orderdate AS DATE)) AS BIGINT) AS od_day,
                count(*) OVER w AS n_near,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10)))
                  OVER w AS VARCHAR) AS DOUBLE) AS near_total
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY CAST(date_diff('day', DATE '1970-01-01',
             CAST(o_orderdate AS DATE)) AS BIGINT)
           RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)""",
    "pivot_type_day" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
                count(*) FILTER (WHERE event_type = 'click') AS click,
                count(*) FILTER (WHERE event_type = 'error') AS error,
                count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                count(*) FILTER (WHERE event_type = 'signup') AS signup,
                count(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1""",
    "set_except" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         EXCEPT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'error'""",
    "set_intersect" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
         INTERSECT
         SELECT DISTINCT user_id FROM events WHERE event_type = 'view'""",
    "anti_join_customers" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "semi_join_parts" ->
      """SELECT p_partkey, p_brand FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""",
    "topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""",
    // carry travels as ONE struct through ONE last_value(IGNORE NULLS),
    // mirroring AsofJoin's row-atomic semantics (a right row with a NULL
    // in one carry column can never mix with fields of another right row)
    "asof_join_orders" ->
      """WITH l AS (SELECT user_id AS k, epoch_ms(ts) AS t_ms, 1 AS side,
                           event_id AS seq, event_id,
                           NULL::STRUCT(o_orderkey BIGINT,
                                        o_totalprice DOUBLE) AS c
                    FROM events),
              r AS (SELECT o_custkey AS k, epoch_ms(o_orderdate) AS t_ms,
                           0 AS side, o_orderkey AS seq, NULL::BIGINT AS event_id,
                           struct_pack(o_orderkey := o_orderkey,
                                       o_totalprice := o_totalprice) AS c
                    FROM orders),
              u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
              wv AS (SELECT k, t_ms, side, event_id,
                            last_value(c IGNORE NULLS) OVER win AS c
                     FROM u
                     WINDOW win AS (PARTITION BY k ORDER BY t_ms, side, seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, k AS user_id, t_ms,
                struct_extract(c, 'o_orderkey') AS o_orderkey,
                struct_extract(c, 'o_totalprice') AS o_totalprice
         FROM wv WHERE side = 1"""
  )
}
