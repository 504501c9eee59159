package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-4 analytical surface: the remaining classical TPC-H query shapes
  * (existential semi-join aggregates, selective-filter revenue, group-join
  * top-k, HAVING-filtered fact rollups, conditional-ratio joins), explicit
  * GROUPING SETS, lag/lead/ntile windows, exact percentile selection,
  * deterministic correlation, fixed-width histograms, and the banded
  * interval join (graft.operators.BandJoin).
  *
  * Cross-engine determinism rules are the same as RelationalQueries:
  * floating sums go through DECIMAL first (exact, order-independent),
  * aggregate OUTPUTS are cast to DOUBLE/BIGINT on both engines, and every
  * final double-valued formula is written with the identical expression
  * tree in both engines so the IEEE arithmetic matches bit-for-bit.
  */
object AnalyticQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(28,10)")
  private def dec38(c: Column): Column = c.cast("decimal(38,10)")
  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    if (n == "events") Tables.events(s, dir)
    else Tables.load(s, dir, n)

  val all: Map[String, Q] = Map(
    // TPC-H Q6 shape: selective scan + global aggregate — everything pushes
    // into the parquet scan, one partial/final agg pair, no join.
    "q6_revenue_delta" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.09) &&
          col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice") * col("l_discount")))
          .cast("double").as("revenue"))),

    // TPC-H Q4 shape: existential subquery — orders with at least one line
    // shipped after the order date, counted per priority. The EXISTS
    // becomes a left-semi hash join on the order key (the extra inequality
    // rides along as a join-side filter, no extra pass).
    "q4_late_shipping" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      ord.join(li,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20 — fact
    // join shuffles once on the order key, dims broadcast, top-k decided
    // on the exact decimal.
    "q10_returned_items" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      val nat = t(s, dir, "nation")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_dec"))
        .orderBy(col("revenue_dec").desc, col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("revenue_dec").cast("double").as("revenue"))
    }),

    // TPC-H Q18 shape: HAVING-filtered fact aggregate joined back to its
    // dimensions. The aggregate side is fact-derived (too big to hint
    // broadcast at 100 TB); it comes out of the groupBy already
    // hash-partitioned on the join key, so only orders shuffles — and AQE
    // still downgrades to broadcast at runtime when the filter leaves it
    // small.
    "q18_large_orders" -> ((s, dir) => {
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") > 150)
      val ord = t(s, dir, "orders")
      val cust = t(s, dir, "customer")
      ord.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"),
          col("qty_dec").cast("double").as("sum_qty"))
    }),

    // TPC-H Q14 shape: conditional-ratio aggregate — promo revenue share
    // per ship month. Both sums are exact decimals; the percentage is ONE
    // double division (identical expression both engines).
    "q14_promo_effect" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
        .agg(
          sum(dec(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .otherwise(lit(0.0)))).as("promo_dec"),
          sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_dec"))
        .select(col("ship_month"),
          (lit(100.0) * col("promo_dec").cast("double") /
            col("total_dec").cast("double")).as("promo_pct"))
    }),

    // Explicit GROUPING SETS — (day), (event_type), and grand total; the
    // lattice rollup/cube can't express (no (day, event_type) cell).
    "grouping_sets_day_type" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("value"))
      ev.groupingSets(
          Seq(Seq(col("day")), Seq(col("event_type")), Seq()),
          col("day"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
    }),

    // Value-offset windows: previous/next value and quartile bucket per
    // user (lag/lead copy exact doubles; ntile is pure row arithmetic).
    "window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .select(col("event_id"), col("user_id"), col("ts_ms"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"),
          ntile(4).over(w).cast("long").as("quartile"))
    }),

    // Exact percentile SELECTION (disc, lower-bound): the p50/p90 value
    // per return flag picked by deterministic rank — no floating-point
    // interpolation, so both engines return the identical source double.
    // At scale this is one sort-shuffle per group (vs a full collect for
    // naive exact percentiles); approximate duals live in
    // approx_user_stats.
    "percentile_price" -> ((s, dir) => {
      val byFlag = Window.partitionBy(col("l_returnflag"))
      val ordered = byFlag.orderBy(col("l_extendedprice"),
        col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(ordered).cast("long"))
        .withColumn("cnt", count(lit(1)).over(byFlag))
        .withColumn("i50", (floor((col("cnt") - 1) * lit(0.5)) + 1).cast("long"))
        .withColumn("i90", (floor((col("cnt") - 1) * lit(0.9)) + 1).cast("long"))
        .groupBy(col("l_returnflag"))
        .agg(
          max(when(col("rn") === col("i50"), col("l_extendedprice"))).as("p50"),
          max(when(col("rn") === col("i90"), col("l_extendedprice"))).as("p90"))
    }),

    // Pearson correlation from exact decimal co-moments: the five sums are
    // order-independent decimals; ONLY the final closed-form formula runs
    // in doubles, written with the identical expression tree in both
    // engines (a streaming corr() would be partition-order-dependent).
    "corr_qty_price" -> ((s, dir) => {
      val agg = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(dec38(col("l_quantity"))).as("sx"),
          sum(dec38(col("l_extendedprice"))).as("sy"),
          sum(dec38(col("l_quantity") * col("l_extendedprice"))).as("sxy"),
          sum(dec38(col("l_quantity") * col("l_quantity"))).as("sxx"),
          sum(dec38(col("l_extendedprice") * col("l_extendedprice"))).as("syy"))
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      agg.select(col("l_returnflag"), col("n"),
        ((n * d("sxy") - d("sx") * d("sy")) /
          (sqrt(n * d("sxx") - d("sx") * d("sx")) *
            sqrt(n * d("syy") - d("sy") * d("sy")))).as("corr_qty_price"))
    }),

    // Fixed-width histogram of the event value distribution — integer
    // bucket arithmetic, exact min/max doubles.
    "histogram_value" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(floor(col("value") / lit(50.0)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))),

    // Banded interval join: follow-up events within 2 h of each purchase
    // by the same user — BandJoin turns the inequality join into an
    // equi-join on (user, time-bucket).
    "band_join_followups" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("t_ms"), col("event_type"))
      val purchases = ev.filter(col("event_type") === "purchase")
      graft.operators.BandJoin.bandJoin(
          ev, "user_id", "t_ms",
          purchases, "user_id", "t_ms", window = 7200000L)
        .groupBy(col("anchor_event_id").as("purchase_id"))
        .agg(count(lit(1)).as("n_follow"))
    }),

    // Salted skew join (graft.operators.SkewOps): events fact ⋈ customer
    // dim on a deliberately salted key — the whale-key remedy. Salting is
    // a pure partitioning rewrite, so the oracle is the UNSALTED join:
    // result equality IS the correctness property.
    "skew_join_salted" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("value"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.SkewOps.saltedJoin(
          ev, "user_id", "event_id", cust, "c_custkey", salts = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
    }),

    // Rank-statistic windows beyond row_number: dense_rank (gapless),
    // percent_rank and cume_dist (both pure rank/count arithmetic — the
    // (rank-1)/(n-1) and rank/n divisions are single double ops identical
    // in both engines).
    "window_rank_stats" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
    }),

    // ntile completes the rank-window inventory. Unlike dense_rank /
    // percent_rank it assigns by ROW POSITION, so the order-by must be
    // a TOTAL order (quantity alone ties thousands of rows and each
    // engine would split them differently) — the unique
    // (l_orderkey, l_linenumber) tail makes the quartile deterministic.
    "window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"),
          col("l_linenumber"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"),
          ntile(4).over(w).cast("long").as("quartile"))
    }),

    // first/last/nth_value complete the value-window inventory (the
    // rank family is window_rank_stats/window_ntile). The whole-
    // partition frame makes first = partition min and last = partition
    // max of the TOTAL order (unique (orderkey, linenumber) tail, so
    // both engines see identical row sequences), nth_value(2) the
    // runner-up.
    "window_first_last" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"), col("l_orderkey"),
          col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"),
          first(col("l_quantity")).over(w).as("min_qty"),
          last(col("l_quantity")).over(w).as("max_qty"),
          nth_value(col("l_quantity"), 2).over(w).as("second_qty"))
    }),

    // Stratified deterministic sampling: a different keep-rate per event
    // class (downsample the fire-hose `view`s, keep every rare
    // `purchase`) decided by the portable 60-bit hash — reproducible
    // across engines and partitionings, pushed down as a scan filter, the
    // standard class-rebalancing step of a training-data pipeline.
    "sample_stratified" -> ((s, dir) => {
      val rate = typedLit(Map(
        "view" -> 2L, "click" -> 10L, "error" -> 25L,
        "signup" -> 50L, "purchase" -> 100L))
      t(s, dir, "events")
        .filter(pmod(graft.functions.PortableHash.h15(
            concat(lit("strat:"), col("event_id").cast("string"))),
          lit(100L)) < coalesce(rate(col("event_type")), lit(0L)))
        .select(col("event_id"), col("user_id"), col("event_type"))
    }),

    // Open-order backlog per day (interval accounting — the ops chart
    // behind every fulfillment dashboard): an order is open on
    // [orderdate, last lineitem ship date): daily opened/closed counts
    // diffed and cumulatively summed over the calendar spine. One
    // orders↔lineitem equi-join + two day-grain aggregates; the spine
    // comes from a 1-row bounds comparand and the running sum is a
    // day-grain window (both allowlisted) — the fact tables never see
    // a global sort.
    "orders_backlog" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      val cl = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("cd"))
      val oc = o.join(cl, col("o_orderkey") === col("l_orderkey"),
        "left_outer").select(col("od"), col("cd"))
        .localCheckpoint(false) // feeds starts, closes, AND bounds
      val starts = oc.groupBy(col("od").as("d"))
        .agg(count(lit(1)).as("ns"))
      val closes = oc.filter(col("cd").isNotNull)
        .groupBy(col("cd").as("d")).agg(count(lit(1)).as("nc"))
      val bounds = oc.agg(min(col("od")).as("mn"), max(col("cd")).as("mx"))
      val spine = bounds
        .select(explode(sequence(col("mn"), col("mx"))).as("d"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(broadcast(starts), Seq("d"), "left_outer")
        .join(broadcast(closes), Seq("d"), "left_outer")
        .select(col("d"), coalesce(col("ns"), lit(0L)).as("ns"),
          coalesce(col("nc"), lit(0L)).as("nc"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("ns").as("n_opened"), col("nc").as("n_closed"),
          sum(col("ns") - col("nc")).over(w).as("open_orders"))
    }),

    // Column profiling (the Deequ/"ANALYZE TABLE" dataops surface): per
    // column of the event stream — row count, null count, exact
    // distinct count, and (for discrete columns) the top value with
    // its count, ties to the smaller value. ONE 1-row multi-
    // countDistinct aggregate (Spark plans the distincts via Expand —
    // a constant ×|columns| row amplification, allowlisted) plus one
    // TakeOrdered(1) per discrete column; doubles are profiled by
    // count metrics only (their top/extremes render engine-specifically
    // as strings, and numeric stats live in es_extended_stats).
    "profile_events" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def nn(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
      val counts = e.agg(
        count(lit(1)).as("n"),
        nn("event_id").as("z_event_id"), nn("user_id").as("z_user_id"),
        nn("event_type").as("z_event_type"), nn("value").as("z_value"),
        nn("props").as("z_props"),
        countDistinct(col("event_id")).as("d_event_id"),
        countDistinct(col("user_id")).as("d_user_id"),
        countDistinct(col("event_type")).as("d_event_type"),
        countDistinct(col("value")).as("d_value"),
        countDistinct(col("props")).as("d_props"))
      val long = counts.select(expr(
        "stack(5, " +
          "'event_id', z_event_id, d_event_id, " +
          "'user_id', z_user_id, d_user_id, " +
          "'event_type', z_event_type, d_event_type, " +
          "'value', z_value, d_value, " +
          "'props', z_props, d_props" +
          ") AS (column_name, n_null, n_distinct)"), col("n"))
      // Fused top-value pass (r17, guide §2.4/§6): the per-column top-1
      // scans previously shared nothing — 3 full event scans, 3
      // exchanges, 3 TakeOrdered(1). One explode into (column, value)
      // rows feeds ONE partially-aggregated groupBy and a per-column
      // window top-1 (WindowGroupLimit prunes to 1 row per column
      // before the final exchange), so events is scanned once and the
      // only wide exchange carries distinct (column, value) pairs.
      // Tie/null semantics match the old orderBy(tc desc, tv asc):
      // row_number over the same order, Spark nulls-first asc.
      val tw = Window.partitionBy(col("column_name"))
        .orderBy(col("tc").desc, col("tv"))
      val tops = e
        .select(explode(array(
          struct(lit("event_type").as("c"),
            col("event_type").cast("string").as("tv")),
          struct(lit("user_id").as("c"),
            col("user_id").cast("string").as("tv")),
          struct(lit("props").as("c"),
            col("props").cast("string").as("tv")))).as("x"))
        .groupBy(col("x.c").as("column_name"), col("x.tv").as("tv"))
        .agg(count(lit(1)).as("tc"))
        .withColumn("__rn", row_number().over(tw))
        .filter(col("__rn") === 1)
        .select(col("column_name"), col("tv").as("top_value"),
          col("tc").as("top_count"))
      long.join(broadcast(tops), Seq("column_name"), "left_outer")
        .select(col("column_name"), col("n"), col("n_null"),
          col("n_distinct"), col("top_value"), col("top_count"))
    }),

    // Assertion-style data-quality checks (the Deequ verification
    // suite): uniqueness, domain, range, and a referential FK check —
    // each row (check, n_checked, n_violations, pass). The five event
    // checks ride ONE 1-row conditional aggregate (allowlisted); the
    // lineitem→orders FK is one anti-join count (orders keys build the
    // join's hash side; at scale this is the standard shuffled
    // left_anti on the key). Timestamps compare on epoch ms.
    "dq_checks" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val lo = unix_millis(to_timestamp(lit("2020-01-01 00:00:00")))
      val hi = unix_millis(to_timestamp(lit("2030-01-01 00:00:00")))
      val domain = Seq("click", "view", "purchase", "signup", "error")
      val agg = e.agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("v_unique"),
        sum(when(col("user_id").isNull || col("user_id") <= 0L, 1L)
          .otherwise(0L)).as("v_user"),
        sum(when(unix_millis(col("ts")) < lo ||
            unix_millis(col("ts")) >= hi, 1L).otherwise(0L)).as("v_ts"),
        sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("v_value"),
        sum(when(!col("event_type").isin(domain: _*), 1L).otherwise(0L))
          .as("v_domain"))
      val evChecks = agg.select(expr(
        "stack(5, " +
          "'event_id_unique', n, v_unique, " +
          "'user_id_positive', n, v_user, " +
          "'ts_in_range', n, v_ts, " +
          "'value_non_negative', n, v_value, " +
          "'event_type_in_domain', n, v_domain" +
          ") AS (check_name, n_checked, n_violations)"))
      val li = t(s, dir, "lineitem")
      val ok = t(s, dir, "orders").select(col("o_orderkey"))
      val fk = li.select(col("l_orderkey"))
        .join(ok, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("lineitem_orders_fk").as("check_name"),
          lit(0L).as("n_checked"), col("n_violations"))
      val liN = li.agg(count(lit(1)).as("cnt"))
      val fkN = fk.crossJoin(broadcast(liN))
        .select(col("check_name"), col("cnt").as("n_checked"),
          col("n_violations"))
      evChecks.unionByName(fkN)
        .withColumn("pass", col("n_violations") === 0L)
    })
  )

  private val D = "CAST(CAST(%s AS VARCHAR) AS DOUBLE)"
  private def dd(e: String) = D.format(e)

  val oracles: Map[String, String] = Map(
    "orders_backlog" ->
      """WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
                    FROM orders),
          cl AS (SELECT l_orderkey, max(CAST(l_shipdate AS DATE))
                   AS cd
                 FROM lineitem GROUP BY 1),
          oc AS (SELECT od, cd FROM o
                 LEFT JOIN cl ON o_orderkey = l_orderkey),
          st AS (SELECT od AS d, count(*) AS ns FROM oc GROUP BY 1),
          cz AS (SELECT cd AS d, count(*) AS nc FROM oc
                 WHERE cd IS NOT NULL GROUP BY 1),
          b AS (SELECT min(od) AS mn, max(cd) AS mx FROM oc),
          sp AS (SELECT CAST(unnest(generate_series(mn, mx,
                   INTERVAL 1 DAY)) AS DATE) AS d FROM b),
          f AS (SELECT sp.d, coalesce(ns, 0) AS ns,
                       coalesce(nc, 0) AS nc
                FROM sp LEFT JOIN st ON sp.d = st.d
                LEFT JOIN cz ON sp.d = cz.d)
          SELECT strftime(d, '%Y-%m-%d') AS day, ns AS n_opened,
                 nc AS n_closed,
                 CAST(sum(ns - nc) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS open_orders
          FROM f""",
    "profile_events" ->
      """WITH c AS (
           SELECT count(*) AS n,
             sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS z_event_id,
             sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS z_user_id,
             sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS z_event_type,
             sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS z_value,
             sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS z_props,
             count(DISTINCT event_id) AS d_event_id,
             count(DISTINCT user_id) AS d_user_id,
             count(DISTINCT event_type) AS d_event_type,
             count(DISTINCT value) AS d_value,
             count(DISTINCT props) AS d_props
           FROM events),
         l AS (
           SELECT 'event_id' AS column_name, n, z_event_id AS n_null,
                  d_event_id AS n_distinct FROM c
           UNION ALL SELECT 'user_id', n, z_user_id, d_user_id FROM c
           UNION ALL SELECT 'event_type', n, z_event_type,
                  d_event_type FROM c
           UNION ALL SELECT 'value', n, z_value, d_value FROM c
           UNION ALL SELECT 'props', n, z_props, d_props FROM c),
         t1 AS (
           SELECT 'event_type' AS column_name,
                  CAST(event_type AS VARCHAR) AS top_value,
                  count(*) AS top_count
           FROM events GROUP BY 2
           ORDER BY top_count DESC, top_value LIMIT 1),
         t2 AS (
           SELECT 'user_id' AS column_name,
                  CAST(user_id AS VARCHAR) AS top_value,
                  count(*) AS top_count
           FROM events GROUP BY 2
           ORDER BY top_count DESC, top_value LIMIT 1),
         t3 AS (
           SELECT 'props' AS column_name,
                  CAST(props AS VARCHAR) AS top_value,
                  count(*) AS top_count
           FROM events GROUP BY 2
           ORDER BY top_count DESC, top_value LIMIT 1),
         tops AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2
                  UNION ALL SELECT * FROM t3)
         SELECT l.column_name, n, n_null, n_distinct, top_value,
                top_count
         FROM l LEFT JOIN tops USING (column_name)""",
    "dq_checks" ->
      """WITH a AS (
           SELECT count(*) AS n,
             (count(*) - count(DISTINCT event_id))::BIGINT AS v_unique,
             sum(CASE WHEN user_id IS NULL OR user_id <= 0
                 THEN 1 ELSE 0 END)::BIGINT AS v_user,
             sum(CASE WHEN epoch_ms(ts) <
                   epoch_ms(TIMESTAMP '2020-01-01 00:00:00')
                 OR epoch_ms(ts) >=
                   epoch_ms(TIMESTAMP '2030-01-01 00:00:00')
                 THEN 1 ELSE 0 END)::BIGINT AS v_ts,
             sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END)::BIGINT
               AS v_value,
             sum(CASE WHEN event_type NOT IN
                   ('click', 'view', 'purchase', 'signup', 'error')
                 THEN 1 ELSE 0 END)::BIGINT AS v_domain
           FROM events),
         ev AS (
           SELECT 'event_id_unique' AS check_name, n AS n_checked,
                  v_unique AS n_violations FROM a
           UNION ALL SELECT 'user_id_positive', n, v_user FROM a
           UNION ALL SELECT 'ts_in_range', n, v_ts FROM a
           UNION ALL SELECT 'value_non_negative', n, v_value FROM a
           UNION ALL SELECT 'event_type_in_domain', n, v_domain FROM a),
         fk AS (
           SELECT 'lineitem_orders_fk' AS check_name,
                  (SELECT count(*) FROM lineitem)::BIGINT AS n_checked,
                  (SELECT count(*) FROM lineitem li
                   LEFT JOIN orders o ON li.l_orderkey = o.o_orderkey
                   WHERE o.o_orderkey IS NULL)::BIGINT AS n_violations)
         SELECT check_name, n_checked, n_violations,
                n_violations = 0 AS pass
         FROM (SELECT * FROM ev UNION ALL SELECT * FROM fk)""",
    "q6_revenue_delta" ->
      s"""SELECT ${dd("sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,10)))")}
            AS revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
            AND l_discount BETWEEN 0.02 AND 0.09
            AND l_quantity < 24""",
    "q4_late_shipping" ->
      """SELECT o_orderpriority, count(*) AS n_orders
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority""",
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
                 ${dd("revenue_dec")} AS revenue
          FROM (
            SELECT c_custkey, c_name, n_name,
                   sum(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(28,10))) AS revenue_dec
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name
            ORDER BY revenue_dec DESC, c_custkey LIMIT 20)""",
    "q18_large_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey,
                 strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                 o_totalprice, ${dd("qty_dec")} AS sum_qty
          FROM (
            SELECT l_orderkey,
                   sum(CAST(l_quantity AS DECIMAL(28,10))) AS qty_dec
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(CAST(l_quantity AS DECIMAL(28,10))) > 150) big
          JOIN orders ON o_orderkey = big.l_orderkey
          JOIN customer ON o_custkey = c_custkey""",
    "q14_promo_effect" ->
      s"""SELECT ship_month,
                 100.0 * ${dd("promo_dec")} / ${dd("total_dec")} AS promo_pct
          FROM (
            SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                   sum(CAST(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END AS DECIMAL(28,10))) AS promo_dec,
                   sum(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(28,10))) AS total_dec
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            GROUP BY 1)""",
    "grouping_sets_day_type" ->
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                 count(*) AS n,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} AS sum_value
          FROM events
          GROUP BY GROUPING SETS ((strftime(ts, '%Y-%m-%d')),
                                  (event_type), ())""",
    "window_lag_lead" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value,
                lag(value) OVER w AS prev_value,
                lead(value) OVER w AS next_value,
                ntile(4) OVER w AS quartile
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)""",
    "percentile_price" ->
      """SELECT l_returnflag,
                max(CASE WHEN rn = i50 THEN l_extendedprice END) AS p50,
                max(CASE WHEN rn = i90 THEN l_extendedprice END) AS p90
         FROM (
           SELECT l_returnflag, l_extendedprice,
                  row_number() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                  CAST(floor((count(*) OVER (PARTITION BY l_returnflag) - 1)
                    * 0.5) + 1 AS BIGINT) AS i50,
                  CAST(floor((count(*) OVER (PARTITION BY l_returnflag) - 1)
                    * 0.9) + 1 AS BIGINT) AS i90
           FROM lineitem)
         GROUP BY l_returnflag""",
    "corr_qty_price" ->
      s"""SELECT l_returnflag, n,
                 (nd * sxy - sx * sy) /
                   (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy))
                   AS corr_qty_price
          FROM (
            SELECT l_returnflag, count(*) AS n,
                   CAST(count(*) AS DOUBLE) AS nd,
                   ${dd("sum(CAST(l_quantity AS DECIMAL(38,10)))")} AS sx,
                   ${dd("sum(CAST(l_extendedprice AS DECIMAL(38,10)))")} AS sy,
                   ${dd("sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10)))")} AS sxy,
                   ${dd("sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))")} AS sxx,
                   ${dd("sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,10)))")} AS syy
            FROM lineitem GROUP BY l_returnflag)""",
    "histogram_value" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
                count(*) AS n, min(value) AS min_v, max(value) AS max_v
         FROM events GROUP BY 1""",
    "band_join_followups" ->
      """SELECT p.event_id AS purchase_id, count(*) AS n_follow
         FROM events p JOIN events e
           ON p.user_id = e.user_id AND p.event_type = 'purchase'
          AND epoch_ms(e.ts) > epoch_ms(p.ts)
          AND epoch_ms(e.ts) <= epoch_ms(p.ts) + 7200000
         GROUP BY 1""",
    "skew_join_salted" ->
      s"""SELECT c_mktsegment, count(*) AS n,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} AS sum_value
          FROM events JOIN customer ON user_id = c_custkey
          GROUP BY c_mktsegment""",
    "window_rank_stats" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                CAST(dense_rank() OVER w AS BIGINT) AS drnk,
                percent_rank() OVER w AS prnk,
                cume_dist() OVER w AS cdist
         FROM lineitem
         WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)""",
    "window_ntile" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM lineitem
         WINDOW w AS (PARTITION BY l_returnflag
                      ORDER BY l_quantity, l_orderkey, l_linenumber)""",
    "window_first_last" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
                first_value(l_quantity) OVER w AS min_qty,
                last_value(l_quantity) OVER w AS max_qty,
                nth_value(l_quantity, 2) OVER w AS second_qty
         FROM lineitem
         WINDOW w AS (PARTITION BY l_returnflag
                      ORDER BY l_quantity, l_orderkey, l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING)""",
    "sample_stratified" ->
      s"""SELECT event_id, user_id, event_type FROM events
          WHERE ${Duck.h15("concat('strat:', event_id::VARCHAR)")} % 100 <
            CASE event_type WHEN 'view' THEN 2 WHEN 'click' THEN 10
              WHEN 'error' THEN 25 WHEN 'signup' THEN 50
              WHEN 'purchase' THEN 100 ELSE 0 END"""
  )
}
