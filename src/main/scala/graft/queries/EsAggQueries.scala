package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The Elasticsearch AGGREGATION DSL, served natively.
  *
  * The reference ships records into ES precisely so users can run Kibana
  * aggregations over them (kafka-elasticsearch-injector README: the
  * injector exists to power search + analytics on the indexed stream).
  * This module re-expresses that aggregation surface as Spark plans over
  * the same data, so a curation team never needs the ES round-trip:
  *
  *  - `date_histogram` with `min_doc_count: 0` gap-fill + sub-aggs
  *    (doc_count / sum / cardinality) — the Kibana timeline query
  *  - `extended_stats` (count/min/max/sum/avg/variance/std bounds)
  *  - `terms` + `top_hits` (top buckets, then the freshest hits in each)
  *  - `range` with ES-style `*-x`/`x-y`/`y-*` bucket keys
  *  - `filters` (named-predicate counts in one pass)
  *  - `composite` with `after`-key pagination (the scalable scroll)
  *  - pipeline aggs: `derivative` + `moving_avg` over a date_histogram
  *
  * Cross-engine determinism follows the house rules: every sum is an
  * exact DECIMAL (order-independent under any partitioning), aggregate
  * outputs cast to DOUBLE through the VARCHAR round-trip on the oracle
  * side, and every double-valued formula (avg, variance, std bounds,
  * moving average) is written as the IDENTICAL expression tree in both
  * engines so the IEEE arithmetic matches bit-for-bit.
  *
  * Scale notes: each query's only fact-sized exchange is its first
  * groupBy (partial→final, map-side combine). Everything after runs on
  * bucket-grain frames bounded by CONSTRUCTION — calendar hours, event
  * types, range buckets — not by data volume, so the gap-fill join
  * broadcasts and the pipeline window's single partition sees at most
  * one row per calendar bucket no matter the corpus size.
  */
object EsAggQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(28,10)")
  private def dec38(c: Column): Column = c.cast("decimal(38,10)")
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  /** Sparse slice for the gap-filled histogram: high-value purchases hit
    * only some hours, so `min_doc_count: 0` semantics are non-vacuous at
    * every sf (sf0.001: ~35 rows over a ~700-hour spine).
    */
  private val SparseType = "purchase"
  private val SparseMin = 95.0
  /** percentile_ranks thresholds (value median ≈ 35, max ≈ 490 — the
    * three land at roughly the 20th/65th/95th ranks, all non-vacuous).
    */
  private val RankT1 = 10.0
  private val RankT2 = 50.0
  private val RankT3 = 150.0

  val all: Map[String, Q] = Map(
    // ES date_histogram, fixed_interval: 1h, min_doc_count: 0 — buckets
    // exist for EVERY hour between the first and last matching event,
    // empty ones reporting doc_count 0 / sum 0.0 (ES's empty-bucket
    // contract). Sub-aggs: value sum + exact user cardinality. The spine
    // is generated from a 1-row min/max aggregate (allowlisted) and the
    // hour-grain agg frame broadcasts into the gap-fill join — the only
    // fact-sized exchange is the first groupBy.
    "es_date_histogram" -> ((s, dir) => {
      val perHour = ev(s, dir)
        .filter(col("event_type") === SparseType && col("value") > SparseMin)
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"),
          countDistinct(col("user_id")).as("n_users"))
      val bounds = perHour.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      val spine = bounds.select(explode(
        sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hh"))
      spine.join(broadcast(perHour), col("hh") === col("h"), "left_outer")
        .select(
          date_format(col("hh"), "yyyy-MM-dd HH:00:00").as("bucket"),
          coalesce(col("doc_count"), lit(0L)).as("doc_count"),
          coalesce(col("sum_dec").cast("double"), lit(0.0)).as("sum_value"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
    }),

    // ES extended_stats per event_type: the five exact accumulators
    // (count, min, max, Σx, Σx²) in one pass, then ES's closed-form
    // moments — variance = (Σx² − (Σx)²/n)/n, std bounds avg ± 2σ — as
    // one double expression tree shared verbatim with the oracle.
    "es_extended_stats" -> ((s, dir) => {
      val agg = ev(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          sum(dec38(col("value"))).as("sx_dec"),
          sum(dec38(col("value") * col("value"))).as("sxx_dec"))
      val nD = col("n").cast("double")
      val sx = col("sx_dec").cast("double")
      val sxx = col("sxx_dec").cast("double")
      val avg = sx / nD
      val variance = (sxx - sx * sx / nD) / nD
      val std = sqrt(variance)
      agg.select(col("event_type"), col("n"), col("min_v"), col("max_v"),
        sx.as("sum_v"), avg.as("avg_v"), variance.as("variance"),
        std.as("std_dev"),
        (avg + lit(2.0) * std).as("std_upper"),
        (avg - lit(2.0) * std).as("std_lower"))
    }),

    // ES terms (size: 3, ordered by doc_count desc, key asc tiebreak)
    // with a top_hits sub-agg (size: 2, sort: ts desc) — "the busiest
    // event types, and their freshest events". The terms frame is
    // type-grain (broadcast); the per-bucket hits are one rank window
    // partitioned by type. Hit order ties on the millisecond are broken
    // by event_id, so both engines pick identical hits.
    "es_terms_top_hits" -> ((s, dir) => {
      val top = ev(s, dir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("doc_count"))
        .orderBy(col("doc_count").desc, col("event_type")).limit(3)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_ms").desc, col("event_id"))
      ev(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .join(broadcast(top), Seq("event_type"))
        .withColumn("hit_rank", row_number().over(w).cast("long"))
        .filter(col("hit_rank") <= 2)
        .select(col("event_type"), col("doc_count"), col("hit_rank"),
          col("event_id"), col("ts_ms"), col("value"))
    }),

    // ES range agg on value with the DSL's half-open [from, to) buckets
    // and its exact key spelling ("*-50.0", "50.0-150.0", …); per-bucket
    // doc_count + avg (exact sum, one division). Pure CASE + groupBy —
    // a single map-side-combined exchange over four keys.
    "es_range_agg" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("range_key",
          when(col("value") < 50.0, "*-50.0")
            .when(col("value") < 150.0, "50.0-150.0")
            .when(col("value") < 300.0, "150.0-300.0")
            .otherwise("300.0-*"))
        .groupBy(col("range_key"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
        .select(col("range_key"), col("doc_count"),
          (col("sum_dec").cast("double") / col("doc_count").cast("double"))
            .as("avg_value"))),

    // ES filters agg: named predicates counted in ONE conditional
    // aggregate pass (ES evaluates each filter per doc — same here, as
    // when/sum arms), plus the implicit total. One 1-row global
    // aggregate (allowlisted). Weekend is expressed per-engine (Spark
    // dayofweek is 1=Sun..7; DuckDB dayofweek is 0=Sun..6) — only the
    // boolean matters.
    "es_filters_agg" -> ((s, dir) =>
      ev(s, dir).agg(
        count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errors"),
        sum(when(col("value") > 300.0, 1L).otherwise(0L)).as("big_value"),
        sum(when(dayofweek(col("ts")).isin(1, 7), 1L).otherwise(0L))
          .as("weekend"))),

    // ES composite agg, sources: [event_type, user_id], size: 10,
    // after: {event_type: "error", user_id: 75} — the paginated scroll
    // over an unbounded bucket space. The after-key tuple comparison is
    // a plain row filter (pushed into the scan, BEFORE the aggregate:
    // it's on group keys, so filtering rows first is equivalent and
    // prunes the shuffle); the page is a TakeOrdered top-k, never a
    // global sort.
    "es_composite_page" -> ((s, dir) =>
      ev(s, dir)
        .filter(col("event_type") > "error" ||
          (col("event_type") === "error" && col("user_id") > 75))
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
        .orderBy(col("event_type"), col("user_id"))
        .limit(10)
        .select(col("event_type"), col("user_id"), col("doc_count"),
          col("sum_dec").cast("double").as("sum_value"))),

    // ES percentiles agg (tdigest): per-type p50/p90/p99 via Spark's
    // approximate percentile, GATED against exact rank neighborhoods
    // (approx_user_stats discipline — ES's own percentiles are
    // approximate, so the honest cross-engine contract is "within the
    // exact p45..p55 / p87..p93 / p97..max bands", shipped as booleans
    // the oracle expects to be true).
    "es_percentiles" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          percentile_approx(col("value"),
            array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"),
          expr("percentile(value, 0.45)").as("lo50"),
          expr("percentile(value, 0.55)").as("hi50"),
          expr("percentile(value, 0.87)").as("lo90"),
          expr("percentile(value, 0.93)").as("hi90"),
          expr("percentile(value, 0.97)").as("lo99"),
          max(col("value")).as("hi99"))
        .select(col("event_type"), col("n"),
          (col("ap")(0) >= col("lo50") && col("ap")(0) <= col("hi50"))
            .as("p50_ok"),
          (col("ap")(1) >= col("lo90") && col("ap")(1) <= col("hi90"))
            .as("p90_ok"),
          (col("ap")(2) >= col("lo99") && col("ap")(2) <= col("hi99"))
            .as("p99_ok"))),

    // ES percentile_ranks: per type, the percent of values at or below
    // each requested threshold — the inverse of `percentiles`, and
    // unlike it EXACT here (a rank is a count ratio, no sketch): one
    // conditional-sum pass over the type groupBy, the ratio the
    // identical double expression in both engines, rows emitted in ES's
    // long form (one per threshold) via stack.
    "es_percentile_ranks" -> ((s, dir) => {
      def le(t: Double) = sum(when(col("value") <= t, 1L).otherwise(0L))
      ev(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          le(RankT1).as("le1"), le(RankT2).as("le2"), le(RankT3).as("le3"))
        .select(col("event_type"),
          expr(s"stack(3, CAST($RankT1 AS DOUBLE), le1," +
            s" CAST($RankT2 AS DOUBLE), le2," +
            s" CAST($RankT3 AS DOUBLE), le3) AS (threshold, n_le)"),
          col("n"))
        .select(col("event_type"), col("threshold"), col("n_le"), col("n"),
          (lit(100.0) * col("n_le").cast("double") /
            col("n").cast("double")).as("pct_rank"))
    }),

    // ES adjacency_matrix agg: named filters and their pairwise
    // intersections counted in ONE conditional aggregate pass (ES
    // evaluates |filters|² bucket predicates per doc; same here as
    // when/sum arms over one scan). One 1-row global aggregate
    // (allowlisted).
    "es_adjacency_matrix" -> ((s, dir) => {
      val a = col("event_type") === "error"
      val b = col("value") > 300.0
      val c = dayofweek(col("ts")).isin(1, 7)
      def cnt(p: Column) = sum(when(p, 1L).otherwise(0L))
      ev(s, dir).agg(
        cnt(a).as("a"), cnt(b).as("b"), cnt(c).as("c"),
        cnt(a && b).as("ab"), cnt(a && c).as("ac"),
        cnt(b && c).as("bc"))
    }),

    // ES cumulative_sum pipeline agg over the daily histogram: the
    // running total is a window sum of EXACT decimals (order-exempt by
    // construction — decimal addition is associative), cast to double
    // only at the edge. Day-grain window input (allowlisted).
    "es_cumulative_sum" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("sum_dec"))
      val w = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDay.select(
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("sum_dec").cast("double").as("sum_value"),
        sum(col("sum_dec")).over(w).cast("double").as("cum_value"))
    }),

    // ES pipeline aggs over a daily date_histogram: derivative (null for
    // the first bucket, as ES skips it) and a 3-bucket trailing
    // moving_avg (null until the window fills). The window input is
    // day-grain — bounded by the calendar, not the data — so the
    // partition-less sort sees ≤ one row per day (allowlisted). The
    // moving average is explicit lag arithmetic, one shared expression
    // tree, NOT a frame sum (frame sums accumulate in engine-specific
    // order).
    "es_derivative" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("sum_dec"))
      val w = Window.orderBy(col("d"))
      perDay
        .withColumn("p1", lag(col("sum_dec"), 1).over(w))
        .withColumn("p2", lag(col("sum_dec"), 2).over(w))
        .select(
          date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("sum_dec").cast("double").as("sum_value"),
          (col("sum_dec").cast("double") - col("p1").cast("double"))
            .as("deriv"),
          when(col("p2").isNotNull,
            (col("sum_dec").cast("double") + col("p1").cast("double") +
              col("p2").cast("double")) / 3.0).as("mavg3"))
    }),

    // ES histogram agg (numeric, interval: 10, min_doc_count: 0) over
    // purchase values: fixed-width buckets keyed by their lower bound,
    // empty interior buckets reported with doc_count 0 (ES's contract;
    // the purchase tail is sparse at every sf so the gap-fill is
    // non-vacuous). Same shape as es_date_histogram: one fact groupBy,
    // 1-row bounds aggregate (allowlisted), bucket-grain gap-fill join.
    "es_histogram" -> ((s, dir) => {
      val per = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(floor(col("value") / lit(10.0)).cast("long").as("b"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
      val bounds = per.agg(min(col("b")).as("mn"), max(col("b")).as("mx"))
      val spine = bounds.select(
        explode(sequence(col("mn"), col("mx"))).as("bb"))
      spine.join(broadcast(per), col("bb") === col("b"), "left_outer")
        .select((col("bb").cast("double") * lit(10.0)).as("key"),
          coalesce(col("doc_count"), lit(0L)).as("doc_count"),
          (col("sum_dec").cast("double") /
            col("doc_count").cast("double")).as("avg_value"))
    }),

    // ES rare_terms agg (field: user_id, max_doc_count: 55) — the
    // long-tail complement of terms: buckets whose doc_count is AT MOST
    // the cutoff. One map-side-combined groupBy; the filter runs on the
    // user-grain aggregate frame. (ES implements this with a CuckooFilter
    // and documents it as approximate; the exact groupBy is strictly
    // better and cheap in a batch engine.)
    "es_rare_terms" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("doc_count"))
        .filter(col("doc_count") <= 55L)),

    // ES bucket_script + bucket_selector pipeline: per-day buckets
    // compute avg = sum/count (bucket_script), buckets failing
    // avg > 50.0 are dropped (bucket_selector). The HAVING runs on the
    // day-grain aggregate frame; the division is one shared double
    // expression.
    "es_bucket_selector" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
        .withColumn("avg_value",
          col("sum_dec").cast("double") / col("doc_count").cast("double"))
        .filter(col("avg_value") > 50.0)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("doc_count"), col("avg_value"))),

    // ES bucket_sort pipeline agg: the parent date_histogram's buckets
    // re-ordered by their metric and truncated (size: 5) — "the five
    // busiest days". The sort runs on the day-grain aggregate frame and
    // plans as a TakeOrdered top-k (no global-sort exchange, same shape
    // es_composite_page pins); ties break on the bucket key.
    "es_bucket_sort" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
        .orderBy(col("sum_dec").desc, col("d"))
        .limit(5)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("doc_count"),
          col("sum_dec").cast("double").as("sum_value"))),

    // ES auto_date_histogram (buckets: 25): the interval is CHOSEN from
    // the rounding ladder (hour → day → week) as the smallest unit
    // whose bucket count fits the target — replayed deterministically
    // in both engines from the 1-row min/max span (integer division
    // only; allowlisted). The data's 30-day span lands on 'week' at
    // every sf; the ladder logic itself is what the oracle re-derives.
    "es_auto_date_histogram" -> ((s, dir) => {
      val e = ev(s, dir)
      val choice = e
        .agg(min(unix_millis(col("ts"))).as("mn"),
          max(unix_millis(col("ts"))).as("mx"))
        .select(
          when(expr("(mx - mn) div 3600000") + 1 <= 25, "hour")
            .when(expr("(mx - mn) div 86400000") + 1 <= 25, "day")
            .otherwise("week").as("unit"))
      e.crossJoin(broadcast(choice))
        .groupBy(col("unit"),
          when(col("unit") === "hour",
            date_format(date_trunc("hour", col("ts")),
              "yyyy-MM-dd HH:00:00"))
            .when(col("unit") === "day",
              date_format(date_trunc("day", col("ts")),
                "yyyy-MM-dd 00:00:00"))
            .otherwise(date_format(date_trunc("week", col("ts")),
              "yyyy-MM-dd 00:00:00")).as("bucket"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
    }),

    // ES stats_bucket pipeline agg: min/max/avg/sum OF the daily-sum
    // buckets (sibling-level stats, not doc-level). Day-grain input with
    // exact decimal bucket sums; the final 1-row aggregate is over ≤
    // calendar-many rows (allowlisted). min/max of the DOUBLE bucket
    // values (not of the decimals) so both engines compare the same
    // IEEE values; avg = decimal-total / count, one shared division.
    "es_stats_bucket" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("sum_dec"))
        .select(col("sum_dec").cast("double").as("sv"), col("sum_dec"))
      perDay.agg(count(lit(1)).as("n_buckets"),
          min(col("sv")).as("min_bucket"), max(col("sv")).as("max_bucket"),
          sum(col("sum_dec")).as("tot_dec"))
        .select(col("n_buckets"), col("min_bucket"), col("max_bucket"),
          col("tot_dec").cast("double").as("sum_buckets"),
          (col("tot_dec").cast("double") / col("n_buckets").cast("double"))
            .as("avg_bucket"))
    }),

    // ES serial_diff pipeline agg (lag: 7) over the daily histogram —
    // the week-over-week deseasonalizer (derivative is its lag-1
    // special case). Null for the first 7 buckets, as ES skips them.
    // Day-grain window input (allowlisted).
    "es_serial_diff" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("sum_dec"))
      val w = Window.orderBy(col("d"))
      perDay
        .withColumn("p7", lag(col("sum_dec"), 7).over(w))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("sum_dec").cast("double").as("sum_value"),
          (col("sum_dec").cast("double") - col("p7").cast("double"))
            .as("diff7"))
    }),

    // ES multi_terms agg (terms over a COMPOSITE key, size: 10): buckets
    // keyed by (event_type, day-of-week), ordered by doc_count desc with
    // key tiebreaks. Day-of-week is derived by epoch-day arithmetic from
    // a fixed Monday (1970-01-05) — identical integer math in both
    // engines, no locale-dependent formatting. One map-side-combined
    // groupBy; the order-by-count+limit plans as TakeOrdered (no
    // global-sort exchange, the es_bucket_sort shape).
    "es_multi_terms" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(col("event_type"),
          pmod(datediff(to_date(col("ts")), lit("1970-01-05")), lit(7))
            .cast("long").as("dow"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
        .orderBy(col("doc_count").desc, col("event_type"), col("dow"))
        .limit(10)
        .select(col("event_type"), col("dow"), col("doc_count"),
          col("sum_dec").cast("double").as("sum_value"))),

    // ES weighted_avg agg: per event_type, `value` weighted by the
    // payload weight `props.$.k` (the injector's decoded JSON field —
    // same extraction path d4 pins). Numerator and denominator are
    // exact DECIMAL sums (order-independent under any partitioning);
    // the single division runs on doubles at the edge, one shared
    // expression tree. Rows with null/zero weight contribute nothing —
    // ES's value_count excludes them, mirrored by the weight filter.
    "es_weighted_avg" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("w", get_json_object(col("props"), "$.k").cast("int"))
        .filter(col("w").isNotNull && col("w") > 0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("value") * col("w").cast("double"))).as("num_dec"),
          sum(dec(col("w").cast("double"))).as("den_dec"))
        .select(col("event_type"), col("n"),
          (col("num_dec").cast("double") / col("den_dec").cast("double"))
            .as("weighted_avg"))),

    // ES t_test agg (type: heteroscedastic — Welch's unpaired test):
    // purchase vs click `value` populations. One conditional-sum pass
    // over the fact table (1-row aggregate, allowlisted) collects exact
    // DECIMAL Σx/Σx² per arm; means, n−1 sample variances, the t
    // statistic and the Welch–Satterthwaite df are the IDENTICAL double
    // expression tree in both engines (the es_extended_stats
    // discipline). ES returns only the p-value; the t/df pair is the
    // deterministic sufficient statistic it derives from.
    "es_t_test" -> ((s, dir) => {
      def arm(t: String, sfx: String) = Seq(
        sum(when(col("event_type") === t, 1L).otherwise(0L)).as("n" + sfx),
        sum(when(col("event_type") === t, dec38(col("value")))
          .otherwise(dec38(lit(0.0)))).as("sx" + sfx),
        sum(when(col("event_type") === t, dec38(col("value") * col("value")))
          .otherwise(dec38(lit(0.0)))).as("sxx" + sfx))
      val aggs = arm("purchase", "a") ++ arm("click", "b")
      def vr(sfx: String): Column = {
        val nd = col("n" + sfx).cast("double")
        val sx = col("sx" + sfx).cast("double")
        val sxx = col("sxx" + sfx).cast("double")
        (sxx - sx * sx / nd) / (nd - 1.0)
      }
      def mn(sfx: String): Column =
        col("sx" + sfx).cast("double") / col("n" + sfx).cast("double")
      ev(s, dir)
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("mean_a", mn("a")).withColumn("mean_b", mn("b"))
        .withColumn("var_a", vr("a")).withColumn("var_b", vr("b"))
        .withColumn("se2",
          col("var_a") / col("na").cast("double") +
            col("var_b") / col("nb").cast("double"))
        .select(col("na"), col("nb"), col("mean_a"), col("mean_b"),
          col("var_a"), col("var_b"),
          ((col("mean_a") - col("mean_b")) / sqrt(col("se2"))).as("t_stat"),
          (col("se2") * col("se2") /
            ((col("var_a") / col("na").cast("double")) *
              (col("var_a") / col("na").cast("double")) /
              (col("na").cast("double") - 1.0) +
              (col("var_b") / col("nb").cast("double")) *
                (col("var_b") / col("nb").cast("double")) /
                (col("nb").cast("double") - 1.0))).as("df"))
    }),

    // ES change_point agg (the 8.x mean-shift detector) over the daily
    // revenue series: the split AFTER day p maximizing the pooled
    // between-segment criterion (nl·nr/n)·(ml−mr)² — the exact CUSUM
    // form, replayed deterministically (ES's own is a heuristic
    // p-value; the exact argmax is the batch-strength upgrade). Day
    // positions/prefix sums come from one day-grain window
    // (allowlisted) + a 1-row total (allowlisted); every candidate
    // split is one row of bounded arithmetic; argmax ties to the
    // earlier day.
    "es_change_point" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("sum_dec"))
      val w = Window.orderBy(col("d"))
      val cum = perDay
        .withColumn("p", row_number().over(w).cast("long"))
        .withColumn("cum_dec", sum(col("sum_dec")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = perDay.agg(sum(col("sum_dec")).as("tot_dec"),
        count(lit(1)).as("n"))
      val nl = col("p").cast("double")
      val nr = (col("n") - col("p")).cast("double")
      val ml = col("cum_dec").cast("double") / nl
      val mr = (col("tot_dec").cast("double") -
        col("cum_dec").cast("double")) / nr
      cum.crossJoin(broadcast(tot))
        .filter(col("p") < col("n"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("split_after"),
          col("p").as("n_left"), (col("n") - col("p")).as("n_right"),
          ml.as("mean_left"), mr.as("mean_right"),
          (((nl * nr) / col("n").cast("double")) *
            ((ml - mr) * (ml - mr))).as("score"))
        .orderBy(col("score").desc, col("split_after")).limit(1)
    }),

    // ES frequent_item_sets agg (size-2 itemsets, transactions = each
    // user's distinct event types): exact apriori over the bounded
    // item domain — pair support via the distinct-frame self-join on
    // the transaction key, support ratio against the 1-row user count
    // (allowlisted). ES's own implementation is approximate/sampled;
    // the exact join is strictly better at batch scale and the pair
    // fanout is |types|²-bounded per user.
    "es_frequent_item_sets" -> ((s, dir) => {
      val ut = ev(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
        .localCheckpoint(false) // both sides of the pair join read it
      val n = ev(s, dir).agg(countDistinct(col("user_id")).as("n_users"))
      ut.select(col("user_id"), col("event_type").as("item_a"))
        .join(ut.select(col("user_id"), col("event_type").as("item_b")),
          Seq("user_id"))
        .filter(col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 10L)
        .crossJoin(broadcast(n))
        .select(col("item_a"), col("item_b"), col("support"),
          (col("support").cast("double") / col("n_users").cast("double"))
            .as("support_ratio"))
    }),

    // ES date_range agg with ES's exact key spelling ("*-A", "A-B",
    // "B-*"): boundaries are RELATIVE date math (min+10d / min+20d —
    // the "now-10d" idiom, regeneration-proof under any testdata span)
    // from a 1-row min comparand (allowlisted); half-open [from, to)
    // buckets like the numeric range agg. One fact groupBy over 3 keys.
    "es_date_range" -> ((s, dir) => {
      val b = ev(s, dir).agg(min(to_date(col("ts"))).as("d0"))
      val c1 = date_add(col("d0"), 10)
      val c2 = date_add(col("d0"), 20)
      def f(c: Column) = date_format(c, "yyyy-MM-dd")
      ev(s, dir).crossJoin(broadcast(b))
        .withColumn("range_key",
          when(to_date(col("ts")) < c1, concat(lit("*-"), f(c1)))
            .when(to_date(col("ts")) < c2,
              concat(f(c1), lit("-"), f(c2)))
            .otherwise(concat(f(c2), lit("-*"))))
        .groupBy(col("range_key"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
    }),

    // ES sampler agg: sub-aggregations over a deterministic 20% sample
    // of each bucket (ES samples per shard by score; the batch analogue
    // is the portable-hash gate — reproducible across engines, reruns,
    // and partitionings, and pushed down as a scan filter). Per type:
    // sampled doc count + avg value over exact decimal sums.
    "es_sampler" -> ((s, dir) =>
      ev(s, dir)
        .filter(pmod(graft.functions.PortableHash.h15(
          concat(lit("smp:"), col("event_id").cast("string"))),
          lit(5L)) === 0L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(dec(col("value"))).as("sum_dec"))
        .select(col("event_type"), col("n_sampled"),
          (col("sum_dec").cast("double") /
            col("n_sampled").cast("double")).as("avg_value"))),

    // ES diversified_sampler agg (max_docs_per_value: 2 on user_id):
    // the de-biased sample — at most two events per user enter each
    // bucket's sub-agg, picked by (ts, event_id) recency-stable order.
    // One rank window over the (type, user) exchange; the rollup runs
    // on the capped frame.
    "es_diversified_sampler" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts_ms"), col("event_id"))
      ev(s, dir)
        .select(col("event_type"), col("user_id"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(dec(col("value"))).as("sum_dec"))
        .select(col("event_type"), col("n_sampled"),
          (col("sum_dec").cast("double") /
            col("n_sampled").cast("double")).as("avg_value"))
    }),

    // ES top_metrics agg (size: 2, sort: value desc): per event_type,
    // the metrics of the two LARGEST-value events — top_hits' sibling
    // that sorts by a metric field instead of recency. One rank window
    // per type; millisecond/value ties break on event_id so both
    // engines pick identical rows.
    "es_top_metrics" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      ev(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
    }),

    // ES scripted_metric agg: per event_type, the max/min inter-arrival
    // gap between consecutive events — the canonical scripted_metric
    // example (needs ordered per-bucket state no stock agg provides;
    // ES runs a map/combine/reduce script, here it is one lag window
    // over the (type) exchange). Exact epoch-ms integers; ties on the
    // millisecond are ordered by event_id so both engines chain
    // identically; avg gap is the telescoping (last−first)/(n−1) — one
    // shared double division, no gap summation needed.
    "es_scripted_metric" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("t"), col("event_id"))
      ev(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_millis(col("ts")).as("t"))
        .withColumn("prev", lag(col("t"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("t") - col("prev")).as("max_gap_ms"),
          min(when(col("prev").isNotNull, col("t") - col("prev")))
            .as("min_gap_ms"),
          ((max(col("t")) - min(col("t"))).cast("double") /
            (count(lit(1)).cast("double") - 1.0)).as("avg_gap_ms"))
    }),

    // ES boxplot agg per event_type: min / q1 / median / q3 / max with
    // the quartiles as EXACT type-1 order statistics — the value at
    // rank ⌈p·n⌉ under the total (value, event_id) order. ES's own
    // boxplot is tdigest-approximate; exact ranks are strictly better
    // in a batch engine AND deterministically cross-engine (integer
    // rank picks, no interpolation arithmetic to match). One fact
    // window per type + a type-grain pivot of the three picked rows.
    "es_boxplot" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val ranked = ev(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val picks = ranked.filter(
        col("rn") === expr("(n + 3) div 4") ||
          col("rn") === expr("(n + 1) div 2") ||
          col("rn") === expr("(3 * n + 3) div 4"))
        .groupBy(col("event_type"))
        .agg(
          min(when(col("rn") === expr("(n + 3) div 4"), col("value")))
            .as("q1"),
          min(when(col("rn") === expr("(n + 1) div 2"), col("value")))
            .as("median"),
          min(when(col("rn") === expr("(3 * n + 3) div 4"),
            col("value"))).as("q3"))
      val ext = ev(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
      ext.join(broadcast(picks), Seq("event_type"))
        .select(col("event_type"), col("n"), col("min_v"), col("q1"),
          col("median"), col("q3"), col("max_v"))
    }),

    // ES median_absolute_deviation agg: MAD = median(|x − median(x)|),
    // both medians the same exact type-1 order statistic as es_boxplot
    // (ES's MAD is tdigest-approximate; same exactness upgrade). Two
    // chained windows over the SAME type partitioning — one exchange,
    // the second window reuses it.
    "es_mad" -> ((s, dir) => {
      val wt = Window.partitionBy(col("event_type"))
      val w1 = wt.orderBy(col("value"), col("event_id"))
      // base feeds BOTH the median pick and the deviation join — the
      // barrier keeps the rank window from evaluating once per consumer
      val base = ev(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(wt))
        .localCheckpoint(false)
      val med = base
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      val dev = base.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val w2 = Window.partitionBy(col("event_type"))
        .orderBy(col("dev"), col("event_id"))
      dev.withColumn("rn2", row_number().over(w2))
        .filter(col("rn2") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("n"), col("med").as("median"),
          col("dev").as("mad"))
    }),

    // ES moving_fn pipeline agg (window: 7, shift: 0 — the window is
    // the SEVEN PRIOR buckets, current excluded, per the ES default)
    // over the daily histogram: MovingFunctions.min/max/unweightedAvg.
    // The seven lags stay exact DECIMALs through least/greatest and the
    // left-associated sum (order-fixed by the shared expression text),
    // cast to double only at the edge; emitted once the window is full
    // (ES yields NaN on partial windows; the full-window slice is the
    // deterministic cross-engine contract). Day-grain window input
    // (allowlisted).
    "es_moving_fn" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("sum_dec"))
      val w = Window.orderBy(col("d"))
      val lagged = (1 to 7).foldLeft(perDay) { (df, i) =>
        df.withColumn(s"p$i", lag(col("sum_dec"), i).over(w))
      }
      lagged.filter(col("p7").isNotNull)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("sum_dec").cast("double").as("sum_value"),
          least((1 to 7).map(i => col(s"p$i")): _*).cast("double")
            .as("win_min"),
          greatest((1 to 7).map(i => col(s"p$i")): _*).cast("double")
            .as("win_max"),
          ((1 to 7).map(i => col(s"p$i")).reduce(_ + _).cast("double") /
            7.0).as("win_avg"))
    }),

    // ES matrix_stats agg over (l_quantity, l_extendedprice,
    // l_discount): the full sample covariance/correlation matrix in
    // long form (diagonal = variance / literal 1.0 — sqrt(x)·sqrt(x)
    // is not IEEE-exactly x, so both engines write the constant). ONE
    // 1-row aggregate pass (allowlisted) collects exact DECIMAL
    // Σx/Σx²/Σxy for every field pair; every double formula is the
    // shared expression tree (the corr_qty_price discipline).
    "es_matrix_stats" -> ((s, dir) => {
      val li = Tables.lineitemSpread(s, dir)
      val agg = li.agg(
        count(lit(1)).as("n"),
        sum(dec38(col("l_quantity"))).as("sq"),
        sum(dec38(col("l_extendedprice"))).as("sp"),
        sum(dec38(col("l_discount"))).as("sd"),
        sum(dec38(col("l_quantity") * col("l_quantity"))).as("sqq"),
        sum(dec38(col("l_extendedprice") * col("l_extendedprice")))
          .as("spp"),
        sum(dec38(col("l_discount") * col("l_discount"))).as("sdd"),
        sum(dec38(col("l_quantity") * col("l_extendedprice"))).as("sqp"),
        sum(dec38(col("l_quantity") * col("l_discount"))).as("sqd"),
        sum(dec38(col("l_extendedprice") * col("l_discount"))).as("spd"))
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      def cv(sxy: String, sx: String, sy: String): Column =
        (d(sxy) - d(sx) * d(sy) / n) / (n - 1.0)
      def cr(sxy: String, sx: String, sy: String, sxx: String,
          syy: String): Column =
        (n * d(sxy) - d(sx) * d(sy)) /
          (sqrt(n * d(sxx) - d(sx) * d(sx)) *
            sqrt(n * d(syy) - d(sy) * d(sy)))
      agg.select(col("n"),
          cv("sqq", "sq", "sq").as("c_qq"),
          cv("spp", "sp", "sp").as("c_pp"),
          cv("sdd", "sd", "sd").as("c_dd"),
          cv("sqp", "sq", "sp").as("c_qp"),
          cv("sqd", "sq", "sd").as("c_qd"),
          cv("spd", "sp", "sd").as("c_pd"),
          cr("sqp", "sq", "sp", "sqq", "spp").as("r_qp"),
          cr("sqd", "sq", "sd", "sqq", "sdd").as("r_qd"),
          cr("spd", "sp", "sd", "spp", "sdd").as("r_pd"))
        .select(col("n"), expr(
          "stack(6, " +
            "'quantity', 'quantity', c_qq, CAST(1.0 AS DOUBLE), " +
            "'price', 'price', c_pp, CAST(1.0 AS DOUBLE), " +
            "'discount', 'discount', c_dd, CAST(1.0 AS DOUBLE), " +
            "'quantity', 'price', c_qp, r_qp, " +
            "'quantity', 'discount', c_qd, r_qd, " +
            "'price', 'discount', c_pd, r_pd" +
            ") AS (field_a, field_b, cov, corr)"))
    }),

    // ES rate agg (unit: day) inside a weekly date_histogram: per
    // ISO-week bucket, docs/day and value/day. ES divides by the FULL
    // unit span (7.0) even for partially-covered edge buckets — the
    // documented contract, mirrored here with the shared literal.
    // Week-grain aggregate frame; one fact exchange.
    "es_rate" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
        .agg(count(lit(1)).as("doc_count"),
          sum(dec(col("value"))).as("sum_dec"))
        .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
          col("doc_count"),
          (col("doc_count").cast("double") / lit(7.0))
            .as("docs_per_day"),
          (col("sum_dec").cast("double") / lit(7.0))
            .as("value_per_day")))
  )

  private val D = "CAST(CAST(%s AS VARCHAR) AS DOUBLE)"
  private def dd(e: String) = D.format(e)

  val oracles: Map[String, String] = Map(
    "es_date_histogram" ->
      s"""WITH per_h AS (
            SELECT date_trunc('hour', ts) AS h, count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec,
                   count(DISTINCT user_id) AS n_users
            FROM events
            WHERE event_type = '$SparseType' AND value > $SparseMin
            GROUP BY 1),
          bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM per_h),
          spine AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hh
            FROM bounds)
          SELECT strftime(hh, '%Y-%m-%d %H:00:00') AS bucket,
                 coalesce(doc_count, 0) AS doc_count,
                 coalesce(${dd("sum_dec")}, 0.0) AS sum_value,
                 coalesce(n_users, 0) AS n_users
          FROM spine LEFT JOIN per_h ON hh = h""",
    "es_extended_stats" ->
      s"""SELECT event_type, n, min_v, max_v,
                 sx AS sum_v, sx / nd AS avg_v,
                 (sxx - sx * sx / nd) / nd AS variance,
                 sqrt((sxx - sx * sx / nd) / nd) AS std_dev,
                 sx / nd + 2.0 * sqrt((sxx - sx * sx / nd) / nd)
                   AS std_upper,
                 sx / nd - 2.0 * sqrt((sxx - sx * sx / nd) / nd)
                   AS std_lower
          FROM (
            SELECT event_type, count(*) AS n,
                   CAST(count(*) AS DOUBLE) AS nd,
                   min(value) AS min_v, max(value) AS max_v,
                   ${dd("sum(CAST(value AS DECIMAL(38,10)))")} AS sx,
                   ${dd("sum(CAST(value * value AS DECIMAL(38,10)))")} AS sxx
            FROM events GROUP BY event_type)""",
    "es_terms_top_hits" ->
      """WITH top AS (
           SELECT event_type, count(*) AS doc_count
           FROM events GROUP BY 1
           ORDER BY doc_count DESC, event_type LIMIT 3),
         hits AS (
           SELECT event_type, event_id, epoch_ms(ts) AS ts_ms, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY epoch_ms(ts) DESC, event_id) AS hit_rank
           FROM events
           WHERE event_type IN (SELECT event_type FROM top))
         SELECT h.event_type, doc_count,
                CAST(hit_rank AS BIGINT) AS hit_rank,
                event_id, ts_ms, value
         FROM hits h JOIN top USING (event_type)
         WHERE hit_rank <= 2""",
    "es_range_agg" ->
      s"""SELECT range_key, doc_count,
                 ${dd("sum_dec")} / CAST(doc_count AS DOUBLE) AS avg_value
          FROM (
            SELECT CASE WHEN value < 50.0 THEN '*-50.0'
                        WHEN value < 150.0 THEN '50.0-150.0'
                        WHEN value < 300.0 THEN '150.0-300.0'
                        ELSE '300.0-*' END AS range_key,
                   count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1)""",
    "es_filters_agg" ->
      """SELECT count(*) AS total,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS errors,
                CAST(sum(CASE WHEN value > 300.0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS big_value,
                CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
                  AS BIGINT) AS weekend
         FROM events""",
    "es_composite_page" ->
      s"""SELECT event_type, user_id, doc_count, ${dd("sum_dec")} AS sum_value
          FROM (
            SELECT event_type, user_id, count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events
            WHERE event_type > 'error'
               OR (event_type = 'error' AND user_id > 75)
            GROUP BY 1, 2
            ORDER BY event_type, user_id LIMIT 10)""",
    "es_percentiles" ->
      """SELECT event_type, count(*) AS n,
                true AS p50_ok, true AS p90_ok, true AS p99_ok
         FROM events GROUP BY 1""",
    "es_percentile_ranks" ->
      s"""WITH g AS (
            SELECT event_type, count(*)::BIGINT AS n,
              sum(CASE WHEN value <= $RankT1 THEN 1 ELSE 0 END)::BIGINT
                AS le1,
              sum(CASE WHEN value <= $RankT2 THEN 1 ELSE 0 END)::BIGINT
                AS le2,
              sum(CASE WHEN value <= $RankT3 THEN 1 ELSE 0 END)::BIGINT
                AS le3
            FROM events GROUP BY 1)
          SELECT event_type, t.threshold, t.n_le, n,
            100.0 * CAST(t.n_le AS DOUBLE) / CAST(n AS DOUBLE)
              AS pct_rank
          FROM g, LATERAL (
            SELECT CAST($RankT1 AS DOUBLE) AS threshold, le1 AS n_le
            UNION ALL SELECT CAST($RankT2 AS DOUBLE), le2
            UNION ALL SELECT CAST($RankT3 AS DOUBLE), le3) t""",
    "es_adjacency_matrix" ->
      """SELECT
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS BIGINT) AS a,
           CAST(sum(CASE WHEN value > 300.0 THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
           CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
           CAST(sum(CASE WHEN event_type = 'error' AND value > 300.0
             THEN 1 ELSE 0 END) AS BIGINT) AS ab,
           CAST(sum(CASE WHEN event_type = 'error'
             AND dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END) AS BIGINT)
             AS ac,
           CAST(sum(CASE WHEN value > 300.0 AND dayofweek(ts) IN (0, 6)
             THEN 1 ELSE 0 END) AS BIGINT) AS bc
         FROM events""",
    "es_cumulative_sum" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1)
          SELECT strftime(d, '%Y-%m-%d') AS day,
                 ${dd("sum_dec")} AS sum_value,
                 ${dd("""sum(sum_dec) OVER (ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")}
                   AS cum_value
          FROM per_day""",
    "es_derivative" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1),
          lagged AS (
            SELECT d, ${dd("sum_dec")} AS sv,
                   ${dd("lag(sum_dec, 1) OVER (ORDER BY d)")} AS p1,
                   ${dd("lag(sum_dec, 2) OVER (ORDER BY d)")} AS p2
            FROM per_day)
          SELECT strftime(d, '%Y-%m-%d') AS day, sv AS sum_value,
                 sv - p1 AS deriv,
                 CASE WHEN p2 IS NOT NULL
                   THEN (sv + p1 + p2) / 3.0 END AS mavg3
          FROM lagged""",
    "es_histogram" ->
      s"""WITH per AS (
            SELECT CAST(floor(value / 10.0) AS BIGINT) AS b,
                   count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          bounds AS (SELECT min(b) AS mn, max(b) AS mx FROM per),
          spine AS (
            SELECT unnest(generate_series(mn, mx)) AS bb FROM bounds)
          SELECT CAST(bb AS DOUBLE) * 10.0 AS key,
                 coalesce(doc_count, 0) AS doc_count,
                 ${dd("sum_dec")} / CAST(doc_count AS DOUBLE) AS avg_value
          FROM spine LEFT JOIN per ON bb = b""",
    "es_rare_terms" ->
      """SELECT user_id, count(*) AS doc_count
         FROM events GROUP BY 1 HAVING count(*) <= 55""",
    "es_bucket_selector" ->
      s"""SELECT strftime(d, '%Y-%m-%d') AS day, doc_count, avg_value
          FROM (
            SELECT CAST(ts AS DATE) AS d, count(*) AS doc_count,
                   ${dd("sum(CAST(value AS DECIMAL(28,10)))")} /
                     CAST(count(*) AS DOUBLE) AS avg_value
            FROM events GROUP BY 1)
          WHERE avg_value > 50.0""",
    "es_bucket_sort" ->
      s"""SELECT strftime(d, '%Y-%m-%d') AS day, doc_count,
            ${dd("sum_dec")} AS sum_value
          FROM (
            SELECT CAST(ts AS DATE) AS d, count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1)
          ORDER BY sum_dec DESC, d LIMIT 5""",
    "es_auto_date_histogram" ->
      s"""WITH b AS (SELECT min(epoch_ms(ts)) AS mn, max(epoch_ms(ts))
                       AS mx FROM events),
          u AS (SELECT CASE
                  WHEN (mx - mn) // 3600000 + 1 <= 25 THEN 'hour'
                  WHEN (mx - mn) // 86400000 + 1 <= 25 THEN 'day'
                  ELSE 'week' END AS unit FROM b)
          SELECT unit,
                 CASE unit
                   WHEN 'hour' THEN strftime(date_trunc('hour', ts),
                     '%Y-%m-%d %H:00:00')
                   WHEN 'day' THEN strftime(date_trunc('day', ts),
                     '%Y-%m-%d 00:00:00')
                   ELSE strftime(date_trunc('week', ts),
                     '%Y-%m-%d 00:00:00') END AS bucket,
                 count(*) AS doc_count,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} AS sum_value
          FROM events CROSS JOIN u GROUP BY 1, 2""",
    "es_stats_bucket" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1)
          SELECT count(*) AS n_buckets,
                 min(${dd("sum_dec")}) AS min_bucket,
                 max(${dd("sum_dec")}) AS max_bucket,
                 ${dd("sum(sum_dec)")} AS sum_buckets,
                 ${dd("sum(sum_dec)")} / CAST(count(*) AS DOUBLE)
                   AS avg_bucket
          FROM per_day""",
    "es_serial_diff" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1)
          SELECT strftime(d, '%Y-%m-%d') AS day,
                 ${dd("sum_dec")} AS sum_value,
                 ${dd("sum_dec")} -
                   ${dd("lag(sum_dec, 7) OVER (ORDER BY d)")} AS diff7
          FROM per_day""",
    "es_multi_terms" ->
      s"""SELECT event_type, dow, doc_count, ${dd("sum_dec")} AS sum_value
          FROM (
            SELECT event_type,
                   CAST(((date_diff('day', DATE '1970-01-05',
                       CAST(ts AS DATE)) % 7) + 7) % 7 AS BIGINT) AS dow,
                   count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1, 2)
          ORDER BY doc_count DESC, event_type, dow LIMIT 10""",
    "es_weighted_avg" ->
      s"""WITH g AS (
            SELECT event_type, count(*) AS n,
              sum(CAST(value * CAST(json_extract_string(props, '$$.k')
                    AS INTEGER)::DOUBLE AS DECIMAL(28,10))) AS num_dec,
              sum(CAST(CAST(json_extract_string(props, '$$.k')
                    AS INTEGER)::DOUBLE AS DECIMAL(28,10))) AS den_dec
            FROM events
            WHERE json_extract_string(props, '$$.k') IS NOT NULL
              AND CAST(json_extract_string(props, '$$.k') AS INTEGER) > 0
            GROUP BY 1)
          SELECT event_type, n,
                 ${dd("num_dec")} / ${dd("den_dec")} AS weighted_avg
          FROM g""",
    "es_t_test" ->
      s"""WITH g AS (
            SELECT
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS na,
              sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(38,10))
                  ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxa,
              sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(value * value AS DECIMAL(38,10))
                  ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxxa,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                END) AS BIGINT) AS nb,
              sum(CASE WHEN event_type = 'click'
                  THEN CAST(value AS DECIMAL(38,10))
                  ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxb,
              sum(CASE WHEN event_type = 'click'
                  THEN CAST(value * value AS DECIMAL(38,10))
                  ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxxb
            FROM events),
          m AS (
            SELECT na, nb,
              ${dd("sxa")} / CAST(na AS DOUBLE) AS mean_a,
              ${dd("sxb")} / CAST(nb AS DOUBLE) AS mean_b,
              (${dd("sxxa")} - ${dd("sxa")} * ${dd("sxa")} /
                 CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
                AS var_a,
              (${dd("sxxb")} - ${dd("sxb")} * ${dd("sxb")} /
                 CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)
                AS var_b
            FROM g),
          t AS (
            SELECT *, var_a / CAST(na AS DOUBLE) +
                      var_b / CAST(nb AS DOUBLE) AS se2
            FROM m)
          SELECT na, nb, mean_a, mean_b, var_a, var_b,
                 (mean_a - mean_b) / sqrt(se2) AS t_stat,
                 se2 * se2 /
                   ((var_a / CAST(na AS DOUBLE)) *
                      (var_a / CAST(na AS DOUBLE)) /
                      (CAST(na AS DOUBLE) - 1.0) +
                    (var_b / CAST(nb AS DOUBLE)) *
                      (var_b / CAST(nb AS DOUBLE)) /
                      (CAST(nb AS DOUBLE) - 1.0)) AS df
          FROM t""",
    "es_change_point" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1),
          cum AS (
            SELECT d,
                   CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS p,
                   sum(sum_dec) OVER (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum_dec
            FROM per_day),
          tot AS (SELECT sum(sum_dec) AS tot_dec, count(*) AS n
                  FROM per_day),
          sc AS (
            SELECT strftime(d, '%Y-%m-%d') AS split_after,
                   p AS n_left, n - p AS n_right,
                   ${dd("cum_dec")} / CAST(p AS DOUBLE) AS mean_left,
                   (${dd("tot_dec")} - ${dd("cum_dec")}) /
                     CAST(n - p AS DOUBLE) AS mean_right,
                   ((CAST(p AS DOUBLE) * CAST(n - p AS DOUBLE)) /
                     CAST(n AS DOUBLE)) *
                   ((${dd("cum_dec")} / CAST(p AS DOUBLE) -
                     (${dd("tot_dec")} - ${dd("cum_dec")}) /
                       CAST(n - p AS DOUBLE)) *
                    (${dd("cum_dec")} / CAST(p AS DOUBLE) -
                     (${dd("tot_dec")} - ${dd("cum_dec")}) /
                       CAST(n - p AS DOUBLE))) AS score
            FROM cum CROSS JOIN tot WHERE p < n)
          SELECT * FROM sc ORDER BY score DESC, split_after LIMIT 1""",
    "es_frequent_item_sets" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
          p AS (
            SELECT a.event_type AS item_a, b.event_type AS item_b,
                   count(*) AS support
            FROM ut a JOIN ut b ON a.user_id = b.user_id
              AND a.event_type < b.event_type
            GROUP BY 1, 2)
          SELECT item_a, item_b, support,
                 CAST(support AS DOUBLE) / CAST(n_users AS DOUBLE)
                   AS support_ratio
          FROM p CROSS JOIN n WHERE support >= 10""",
    "es_date_range" ->
      s"""WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
          k AS (
            SELECT CASE
                WHEN CAST(ts AS DATE) < d0 + 10
                  THEN '*-' || strftime(d0 + 10, '%Y-%m-%d')
                WHEN CAST(ts AS DATE) < d0 + 20
                  THEN strftime(d0 + 10, '%Y-%m-%d') || '-' ||
                       strftime(d0 + 20, '%Y-%m-%d')
                ELSE strftime(d0 + 20, '%Y-%m-%d') || '-*'
              END AS range_key, value
            FROM events CROSS JOIN b)
          SELECT range_key, count(*) AS doc_count,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} AS sum_value
          FROM k GROUP BY 1""",
    "es_sampler" ->
      s"""SELECT event_type, count(*) AS n_sampled,
            ${dd("sum(CAST(value AS DECIMAL(28,10)))")} /
              CAST(count(*) AS DOUBLE) AS avg_value
          FROM events
          WHERE ('0x' || substring(md5(concat('smp:',
              event_id::VARCHAR)), 1, 15))::BIGINT % 5 = 0
          GROUP BY 1""",
    "es_diversified_sampler" ->
      s"""WITH r AS (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type, user_id
                     ORDER BY epoch_ms(ts), event_id) AS rn
            FROM events)
          SELECT event_type, count(*) AS n_sampled,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} /
                   CAST(count(*) AS DOUBLE) AS avg_value
          FROM r WHERE rn <= 2 GROUP BY 1""",
    "es_top_metrics" ->
      """SELECT event_type, event_id, ts_ms, value, rank FROM (
           SELECT event_type, event_id, epoch_ms(ts) AS ts_ms, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY value DESC, event_id) AS rank
           FROM events) WHERE rank <= 2""",
    "es_scripted_metric" ->
      """WITH g AS (
           SELECT event_type, epoch_ms(ts) AS t,
                  lag(epoch_ms(ts)) OVER (PARTITION BY event_type
                    ORDER BY epoch_ms(ts), event_id) AS prev
           FROM events)
         SELECT event_type, count(*) AS n,
                max(t - prev) AS max_gap_ms,
                min(CASE WHEN prev IS NOT NULL THEN t - prev END)
                  AS min_gap_ms,
                CAST(max(t) - min(t) AS DOUBLE) /
                  (CAST(count(*) AS DOUBLE) - 1.0) AS avg_gap_ms
         FROM g GROUP BY 1""",
    "es_boxplot" ->
      """WITH r AS (
           SELECT event_type, event_id, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         p AS (
           SELECT event_type,
                  min(CASE WHEN rn = (n + 3) // 4 THEN value END) AS q1,
                  min(CASE WHEN rn = (n + 1) // 2 THEN value END)
                    AS median,
                  min(CASE WHEN rn = (3 * n + 3) // 4 THEN value END)
                    AS q3
           FROM r
           WHERE rn = (n + 3) // 4 OR rn = (n + 1) // 2
              OR rn = (3 * n + 3) // 4
           GROUP BY 1),
         e AS (
           SELECT event_type, count(*) AS n, min(value) AS min_v,
                  max(value) AS max_v
           FROM events GROUP BY 1)
         SELECT e.event_type, e.n, e.min_v, p.q1, p.median, p.q3,
                e.max_v
         FROM e JOIN p USING (event_type)""",
    "es_mad" ->
      """WITH r AS (
           SELECT event_type, event_id, value,
                  row_number() OVER (PARTITION BY event_type
                    ORDER BY value, event_id) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         med AS (
           SELECT event_type, value AS med FROM r
           WHERE rn = (n + 1) // 2),
         dev AS (
           SELECT r.event_type, r.event_id, r.n, med.med,
                  abs(r.value - med.med) AS dev
           FROM r JOIN med USING (event_type)),
         d2 AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
                    ORDER BY dev, event_id) AS rn2
           FROM dev)
         SELECT event_type, n, med AS median, dev AS mad
         FROM d2 WHERE rn2 = (n + 1) // 2""",
    "es_moving_fn" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1),
          l AS (
            SELECT d, sum_dec,
                   lag(sum_dec, 1) OVER (ORDER BY d) AS p1,
                   lag(sum_dec, 2) OVER (ORDER BY d) AS p2,
                   lag(sum_dec, 3) OVER (ORDER BY d) AS p3,
                   lag(sum_dec, 4) OVER (ORDER BY d) AS p4,
                   lag(sum_dec, 5) OVER (ORDER BY d) AS p5,
                   lag(sum_dec, 6) OVER (ORDER BY d) AS p6,
                   lag(sum_dec, 7) OVER (ORDER BY d) AS p7
            FROM per_day)
          SELECT strftime(d, '%Y-%m-%d') AS day,
                 ${dd("sum_dec")} AS sum_value,
                 ${dd("least(p1, p2, p3, p4, p5, p6, p7)")} AS win_min,
                 ${dd("greatest(p1, p2, p3, p4, p5, p6, p7)")}
                   AS win_max,
                 ${dd("p1 + p2 + p3 + p4 + p5 + p6 + p7")} / 7.0
                   AS win_avg
          FROM l WHERE p7 IS NOT NULL""",
    "es_matrix_stats" ->
      s"""WITH g AS (
            SELECT count(*) AS n,
              sum(CAST(l_quantity AS DECIMAL(38,10))) AS sq,
              sum(CAST(l_extendedprice AS DECIMAL(38,10))) AS sp,
              sum(CAST(l_discount AS DECIMAL(38,10))) AS sd,
              sum(CAST(l_quantity * l_quantity AS DECIMAL(38,10)))
                AS sqq,
              sum(CAST(l_extendedprice * l_extendedprice
                AS DECIMAL(38,10))) AS spp,
              sum(CAST(l_discount * l_discount AS DECIMAL(38,10)))
                AS sdd,
              sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,10)))
                AS sqp,
              sum(CAST(l_quantity * l_discount AS DECIMAL(38,10)))
                AS sqd,
              sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,10)))
                AS spd
            FROM lineitem),
          m AS (
            SELECT n, CAST(n AS DOUBLE) AS nd,
              ${dd("sq")} AS sq, ${dd("sp")} AS sp, ${dd("sd")} AS sd,
              ${dd("sqq")} AS sqq, ${dd("spp")} AS spp,
              ${dd("sdd")} AS sdd, ${dd("sqp")} AS sqp,
              ${dd("sqd")} AS sqd, ${dd("spd")} AS spd
            FROM g)
          SELECT n, t.field_a, t.field_b, t.cov, t.corr
          FROM m, LATERAL (
            SELECT 'quantity' AS field_a, 'quantity' AS field_b,
                   (sqq - sq * sq / nd) / (nd - 1.0) AS cov,
                   CAST(1.0 AS DOUBLE) AS corr
            UNION ALL SELECT 'price', 'price',
                   (spp - sp * sp / nd) / (nd - 1.0),
                   CAST(1.0 AS DOUBLE)
            UNION ALL SELECT 'discount', 'discount',
                   (sdd - sd * sd / nd) / (nd - 1.0),
                   CAST(1.0 AS DOUBLE)
            UNION ALL SELECT 'quantity', 'price',
                   (sqp - sq * sp / nd) / (nd - 1.0),
                   (nd * sqp - sq * sp) /
                     (sqrt(nd * sqq - sq * sq) *
                      sqrt(nd * spp - sp * sp))
            UNION ALL SELECT 'quantity', 'discount',
                   (sqd - sq * sd / nd) / (nd - 1.0),
                   (nd * sqd - sq * sd) /
                     (sqrt(nd * sqq - sq * sq) *
                      sqrt(nd * sdd - sd * sd))
            UNION ALL SELECT 'price', 'discount',
                   (spd - sp * sd / nd) / (nd - 1.0),
                   (nd * spd - sp * sd) /
                     (sqrt(nd * spp - sp * sp) *
                      sqrt(nd * sdd - sd * sd))) t""",
    "es_rate" ->
      s"""WITH per_w AS (
            SELECT date_trunc('week', CAST(ts AS DATE)) AS wk,
                   count(*) AS doc_count,
                   sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
            FROM events GROUP BY 1)
          SELECT strftime(wk, '%Y-%m-%d') AS week, doc_count,
                 CAST(doc_count AS DOUBLE) / 7.0 AS docs_per_day,
                 ${dd("sum_dec")} / 7.0 AS value_per_day
          FROM per_w"""
  )
}
