package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral event analytics — the Kibana/ES workloads a product team
  * runs over the injected event stream (the reference exists to feed
  * exactly these dashboards; see kafka-elasticsearch-injector README).
  * Three classics that the ES aggregation DSL cannot express in one
  * request, served natively:
  *
  *  - funnel: ordered step conversion (view → click → purchase), each
  *    step inside a 24 h window after the previous step's first hit
  *  - retention: weekly signup cohorts × activity-week offsets
  *  - anomaly: hour-buckets whose event count sits more than 2σ from
  *    the per-type mean, with `min_doc_count: 0` gap-fill so silent
  *    hours are flaggable (an outage IS the anomaly that matters)
  *
  * Determinism: every cross-engine timestamp comparison happens on
  * epoch MILLISECONDS (the reference's own unit — Spark `unix_millis`
  * ≡ DuckDB `epoch_ms`, both floor positive epochs), week/hour math is
  * integer, and the anomaly gate is the divisionless integer form of
  * z² > 4: `(n·x − S)² > 4·(n·Q − S²)` over BIGINT counts — exact at
  * any partitioning. (At 100 TB the squares warrant DECIMAL(38,0) or a
  * plain double z-score — counts here keep BIGINT exact by miles.)
  *
  * Scale shape: each query's only fact-sized exchange is one hash
  * exchange on `user_id` (funnel/retention windows — reused by the
  * following user-grain aggregate) or one `(type, hour)` groupBy
  * (anomaly). Everything downstream runs on user-grain or
  * calendar-bounded frames; the funnel's final 3-counter rollup and the
  * anomaly hour spine are 1-row aggregates (allowlisted), never the
  * data.
  */
object EventQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Step window: a step counts only within 24 h of the previous one. */
  private val StepWindowMs = 86400000L
  /** bucket_selector-style threshold for the anomaly gate's z². */
  private val ZSq = 4L
  /** Markov stationary distribution: power-iteration rounds + the
    * integer fixed-point scale (pageRank discipline — `(r·n) div tot`
    * is exact BIGINT, order-free at any partitioning; at 100 TB the
    * r·n product warrants DECIMAL(38,0), same widening note as the
    * anomaly gate's squares).
    */
  private val MkIters = 10
  private val MkScale = 1000000000L

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  val all: Map[String, Q] = Map(
    // Earliest-chain funnel: t1 = first view; t2 = first click in
    // (t1, t1+24h]; t3 = first purchase in (t2, t2+24h]. The three
    // chained conditional mins are whole-partition window aggregates
    // over ONE user_id exchange; the user-grain groupBy reuses that
    // partitioning, so the fact shuffles exactly once.
    "events_funnel" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("t"))
      val wu = Window.partitionBy(col("user_id"))
      val chained = e
        .withColumn("t1",
          min(when(col("event_type") === "view", col("t"))).over(wu))
        .withColumn("t2",
          min(when(col("event_type") === "click" &&
            col("t") > col("t1") &&
            col("t") <= col("t1") + StepWindowMs, col("t"))).over(wu))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            col("t") > col("t2") &&
            col("t") <= col("t2") + StepWindowMs, col("t"))).over(wu))
      val perUser = chained.groupBy(col("user_id"))
        .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
          min(col("t3")).as("t3"))
      // count(col) skips nulls: users that reached each step
      val counts = perUser.agg(count(col("t1")).as("s1"),
        count(col("t2")).as("s2"), count(col("t3")).as("s3"))
      counts
        .select(expr(
          "stack(3, 'view', s1, 'click', s2, 'purchase', s3) " +
            "AS (step, n_users)"), col("s1"))
        .select(col("step"), col("n_users"),
          (col("n_users").cast("double") / col("s1").cast("double"))
            .as("conv"))
    }),

    // Weekly signup cohorts: cohort = Monday of the user's FIRST signup;
    // every later event lands in cohort-relative week floor(days/7).
    // Window min + filter + groupBy — the user exchange is reused, the
    // (cohort, offset) re-shuffle is the countDistinct's own key.
    "events_retention" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        col("ts"), unix_millis(col("ts")).as("t"))
      val wu = Window.partitionBy(col("user_id"))
      val withCohort = e.withColumn("signup_ts",
          min(when(col("event_type") === "signup", col("ts"))).over(wu))
        .filter(col("signup_ts").isNotNull &&
          col("t") >= unix_millis(col("signup_ts")))
      withCohort
        .select(col("user_id"),
          date_format(date_trunc("week", col("signup_ts")), "yyyy-MM-dd")
            .as("cohort_week"),
          expr("cast(datediff(to_date(ts), " +
            "to_date(date_trunc('week', signup_ts))) as bigint) div 7")
            .as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // Next-event transition matrix (the Markov view of user journeys —
    // what Kibana calls a "path analysis"): per user, events in strict
    // (ts, event_id) order (the unique id breaks millisecond ties, so
    // both engines chain identically), counted by (from, to) pair with
    // the row-probability alongside. One user_id exchange for the lag
    // window; the (from, to) groupBy runs on 25 keys; the per-from
    // normalizer is a 5-row broadcast join, the division one shared
    // double expression.
    "events_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val pairs = ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("t"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        // consumed by the normalizer AND the final join — the barrier
        // keeps the lag window + fact scan from running twice (the
        // frame is |types|² rows)
        .localCheckpoint(false)
      val totals = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("tot"))
      pairs.join(broadcast(totals), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("tot").cast("double")).as("p"))
    }),

    // Top event paths: the 20 most common length-3 event-type
    // sequences across users (the path-analysis view behind the
    // transition matrix — which three-step journeys dominate). Same
    // per-user (ts, event_id) ordering contract as events_transitions;
    // one lead window partitioned by user, one type-trigram-grain
    // rollup, top-20 as a TakeOrdered.
    "events_paths" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("t"))
        .withColumn("t2", lead(col("event_type"), 1).over(w))
        .withColumn("t3", lead(col("event_type"), 2).over(w))
        .filter(col("t3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("t2").as("step2"),
          col("t3").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(20)
    }),

    // DAU/MAU stickiness: distinct daily actives over distinct
    // calendar-month actives — the engagement ratio on every product
    // dashboard. Two countDistinct aggregates (day and month grain);
    // the month frame broadcasts into the day frame; exact distincts
    // both (the HLL variant is the corpus_vocab_growth discipline).
    "events_dau_mau" -> ((s, dir) => {
      val e = ev(s, dir)
      val dau = e.groupBy(to_date(col("ts")).as("d"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val mau = e.groupBy(date_format(col("ts"), "yyyy-MM").as("m"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.withColumn("m", date_format(col("d"), "yyyy-MM"))
        .join(broadcast(mau), Seq("m"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("dau"), col("mau"),
          (col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"))
    }),

    // Rolling 7-day active users per day — the sliding DISTINCT window
    // no window function expresses: each user-day fans out to the ≤7
    // future days it keeps the user "active" for (bounded constant
    // amplification of the deduplicated user-day frame, clipped at the
    // 1-row span max, allowlisted), then one day-grain distinct count.
    // Early days honestly report partial trailing windows.
    "events_wau_rolling" -> ((s, dir) => {
      val ud = ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val b = ev(s, dir).agg(max(to_date(col("ts"))).as("mx"))
      ud.crossJoin(broadcast(b))
        .select(col("user_id"), explode(sequence(col("d"),
          least(date_add(col("d"), 6), col("mx")))).as("day"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("wau"))
    }),

    // Day-of-week seasonality profile: per-weekday mean daily revenue
    // vs the all-days mean — the seasonal index a forecaster divides
    // out before trending (the multiplicative-decomposition classic).
    // Weekday via epoch-day arithmetic from a fixed Monday (locale-
    // free, regeneration-proof — the es_multi_terms discipline); daily
    // sums exact DECIMAL; the global mean is a 1-row comparand over
    // the day-grain frame (allowlisted, Q22 shape). 7-row output.
    "events_seasonality" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(28,10)")).as("s_dec"))
      val glob = perDay.agg(sum(col("s_dec")).as("tot_dec"),
        count(lit(1)).as("n_days"))
      perDay
        .withColumn("dow", expr(
          "CAST(((datediff(d, DATE '1970-01-05') % 7) + 7) % 7 AS BIGINT)"))
        .groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days_dow"),
          sum(col("s_dec")).as("dow_dec"))
        .crossJoin(broadcast(glob))
        .select(col("dow"), col("n_days_dow"),
          (col("dow_dec").cast("double") /
            col("n_days_dow").cast("double")).as("mean_rev"),
          ((col("dow_dec").cast("double") /
            col("n_days_dow").cast("double")) /
            (col("tot_dec").cast("double") /
              col("n_days").cast("double"))).as("seasonal_index"))
    }),

    // Last-touch attribution: each purchase credits the most recent
    // preceding view/click by the same user within 24 h (the marketing
    // dashboard's conversion-credit model); no touch in the window →
    // 'direct'. The two IGNORE-NULLS window lasts read the SAME
    // preceding row (their CASE nulls coincide), so t/type stay
    // consistent without a struct; the (t, event_id) order makes the
    // pick deterministic in both engines. One user_id exchange for the
    // window, a 3-key channel rollup, revenue through exact DECIMAL,
    // and the share window runs on the channel-grain frame
    // (allowlisted). purchase value is the credited revenue.
    "events_attribution" -> ((s, dir) => {
      val touch = col("event_type") === "view" || col("event_type") === "click"
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val e = ev(s, dir).select(col("user_id"), col("event_id"),
        col("event_type"), col("value"), unix_millis(col("ts")).as("t"))
      val attributed = e
        .withColumn("at", last(when(touch, col("t")), true).over(w))
        .withColumn("aty",
          last(when(touch, col("event_type")), true).over(w))
        .filter(col("event_type") === "purchase")
        .select(when(col("at").isNotNull &&
            col("t") - col("at") <= StepWindowMs, col("aty"))
          .otherwise("direct").as("channel"), col("value"))
      val g = attributed.groupBy(col("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("value").cast("decimal(28,10)")).as("rev_dec"))
      val wAll = Window.partitionBy()
      g.select(col("channel"), col("n_purchases"),
          col("rev_dec").cast("double").as("revenue"),
          (col("n_purchases").cast("double") /
            sum(col("n_purchases")).over(wAll).cast("double")).as("share"))
    }),

    // Stationary distribution of the event-type Markov chain (the
    // long-run behavioral mix the transition matrix converges to —
    // "where do user journeys spend their time", the summary statistic
    // over events_transitions' 25 cells). Ten power-iteration rounds in
    // exact integer fixed-point: π'(to) = Σ_from (π(from)·n) div tot —
    // the pageRank discipline, so the result is bit-identical at any
    // partitioning. The observed per-type event share rides along: the
    // gap between π and the observed mix is the "journeys end here vs
    // pass through here" signal. Scale shape: one user_id exchange for
    // the lead window; every iteration frame is |types|²-bounded (25
    // rows); the observed-share window runs on the |types|-row frame
    // (allowlisted 1-row partial).
    "events_markov" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("event_id"))
      val pairs = ev(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("t"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // fact scan runs once, not once per round
      val tot = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("tot"))
      val ed = pairs.join(broadcast(tot), Seq("from_type"))
      val types = ev(s, dir).select(col("event_type")).distinct()
        .localCheckpoint(false) // iteration spine + the count below
      val nTypes = types.count() // model-sized driver action (|types|)
      var pi = types.select(col("event_type"),
        lit(MkScale / nTypes).as("r"))
      for (_ <- 1 to MkIters) {
        val contrib = ed.join(pi.withColumnRenamed("event_type", "from_type"),
            Seq("from_type"))
          .select(col("to_type"), expr("(r * n) div tot").as("c"))
          .groupBy(col("to_type")).agg(sum(col("c")).as("c"))
        pi = types.join(contrib,
            types("event_type") === contrib("to_type"), "left_outer")
          .select(types("event_type"),
            coalesce(col("c"), lit(0L)).as("r"))
      }
      val obs = ev(s, dir).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      val wAll = Window.partitionBy()
      pi.join(obs, Seq("event_type"))
        .select(col("event_type"), col("r").as("pi_fp"),
          (col("r").cast("double") / lit(MkScale.toDouble)).as("pi"),
          (col("n_events").cast("double") /
            sum(col("n_events")).over(wAll).cast("double")).as("obs_share"))
    }),

    // Count anomalies per (event_type, hour) with empty buckets
    // gap-filled to 0 (a silent hour is the outage signal). Flag iff
    // (n·x − S)² > 4·(n·Q − S²) — z² > 4 with the divisions multiplied
    // through, so the gate is exact BIGINT arithmetic. The only
    // fact-sized exchange is the (type, hour) groupBy; spine bounds are
    // a 1-row aggregate (allowlisted) and every later frame is
    // calendar × type bounded.
    "events_anomaly" -> ((s, dir) => {
      val e = ev(s, dir)
      val hourly = e
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hh"))
        .agg(count(lit(1)).as("x"))
      val bounds = e.agg(min(date_trunc("hour", col("ts"))).as("mn"),
        max(date_trunc("hour", col("ts"))).as("mx"))
      val spineH = bounds.select(explode(
        sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hh"))
      val types = e.select(col("event_type")).distinct()
      val spine = types.crossJoin(broadcast(spineH))
      // filled feeds BOTH the stats aggregate and the final join; without
      // the barrier each consumer re-runs the whole fact groupBy (and the
      // 1-row bounds aggregate — the sweep counts the subtree copies).
      // The frame is calendar × type bounded, so the checkpoint is tiny.
      val filled = spine
        .join(broadcast(hourly), Seq("event_type", "hh"), "left_outer")
        .select(col("event_type"), col("hh"),
          coalesce(col("x"), lit(0L)).as("x"))
        .localCheckpoint(false)
      val st = filled.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("q"))
      val dev = col("n") * col("x") - col("s")
      filled.join(broadcast(st), Seq("event_type"))
        .filter(dev * dev > lit(ZSq) * (col("n") * col("q") -
          col("s") * col("s")))
        .select(col("event_type"),
          date_format(col("hh"), "yyyy-MM-dd HH:00:00").as("bucket"),
          col("x").as("doc_count"))
    }),

    // Holt linear (double-exponential) smoothing over the weekly
    // revenue frame — the forecast panel next to es_derivative's
    // trend view. α = 3/10, β = 2/10 in EXACT scale-10¹⁰ integer
    // fixed-point (the PageRank/Markov discipline; sign-split div so
    // floor ≡ truncate on the negatives a falling trend produces).
    // The weekly aggregate is distributed (one fact exchange); the
    // recursion then runs on the CALENDAR-BOUNDED week frame as
    // driver-side integer state — model-sized like the Lloyd
    // centroids, replayed exactly by the oracle's recursive CTE.
    // Init: l₁ = x₁, b₁ = x₂ − x₁ (0 if a single bucket);
    // update: lₜ = (3xₜ + 7(l+b)) ÷ 10, bₜ = (2(lₜ − l) + 8b) ÷ 10;
    // forecast_next = lₜ + bₜ.
    "events_forecast" -> ((s, dir) => {
      val spark = s
      import spark.implicits._
      val weekly = ev(s, dir)
        .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
        .agg(sum(col("value").cast("decimal(28,10)")).as("sum_dec"))
        .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
          // ×10¹⁰ through DECIMAL(38,0); the recursion runs in BigInt,
          // so there is NO fixed-point envelope to outgrow — the 100×
          // scale probe caught the earlier Long state overflowing
          // (weekly revenue past ~9.2e8 wrapped ×10¹⁰ past Long.Max),
          // and the oracle's recursive CTE computes the same integers
          // in HUGEINT, which BigInt matches exactly
          (col("sum_dec") * lit(10000000000L)).cast("decimal(38,0)")
            .as("x_fp"))
      val rows = weekly.orderBy(col("week")).collect()
        .map(r => (r.getString(0), BigInt(r.getDecimal(1).toBigInteger)))
      def idiv(a: BigInt, d: Int): BigInt =
        if (a < 0) -((-a) / d) else a / d
      // BigInteger.doubleValue is correctly rounded, identical to the
      // former Spark long→double cast for in-range values
      def dbl(a: BigInt): Double = a.bigInteger.doubleValue / 1.0e10
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Double, Double, Double, Double)]
      var l = BigInt(0); var b = BigInt(0)
      for (((wkS, x), i) <- rows.zipWithIndex) {
        if (i == 0) {
          l = x
          b = if (rows.length > 1) rows(1)._2 - x else BigInt(0)
        } else {
          val lNew = idiv(3 * x + 7 * (l + b), 10)
          b = idiv(2 * (lNew - l) + 8 * b, 10)
          l = lNew
        }
        out += ((wkS, dbl(x), dbl(l), dbl(b), dbl(l + b)))
      }
      out.toSeq.toDF("week", "x", "level", "trend", "forecast_next")
    }),

    // Item-item collaborative filtering (the Amazon/Sarwar classic)
    // over the payload item key: each user's per-item interaction
    // counts form the rating vector, item pairs sharing a user get the
    // exact-DECIMAL dot product, and cosine = dot/(‖i‖·‖j‖) is one
    // shared double tree over exact Σc² norms. Top-20 pairs as a
    // TakeOrdered. Scale shape: the co-occurrence self-join shuffles
    // on user_id with per-user fanout bounded by that user's distinct
    // items (the standard cooc shuffle; a 100 TB deployment caps it
    // with per-user item limits, which this per-user distinct frame
    // already models); norms broadcast at item grain.
    "events_item_similarity" -> ((s, dir) => {
      val ui = ev(s, dir)
        .withColumn("item", get_json_object(col("props"), "$.k")
          .cast("int").cast("long"))
        .filter(col("item").isNotNull)
        .groupBy(col("user_id"), col("item"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false) // both pair sides + norms read it
      val norms = ui.groupBy(col("item"))
        .agg(sum((col("c") * col("c")).cast("decimal(38,10)"))
          .as("ssq_dec"))
      val pairs = ui.select(col("user_id"), col("item").as("item_a"),
          col("c").as("ca"))
        .join(ui.select(col("user_id"), col("item").as("item_b"),
          col("c").as("cb")), Seq("user_id"))
        .filter(col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b"))
        .agg(count(lit(1)).as("n_common_users"),
          sum((col("ca") * col("cb")).cast("decimal(38,10)"))
            .as("dot_dec"))
      pairs
        .join(broadcast(norms.select(col("item").as("item_a"),
          col("ssq_dec").as("sa"))), Seq("item_a"))
        .join(broadcast(norms.select(col("item").as("item_b"),
          col("ssq_dec").as("sb"))), Seq("item_b"))
        .select(col("item_a"), col("item_b"), col("n_common_users"),
          (col("dot_dec").cast("double") /
            (sqrt(col("sa").cast("double")) *
              sqrt(col("sb").cast("double")))).as("cos"))
        .orderBy(col("cos").desc, col("item_a"), col("item_b"))
        .limit(20)
    }),

    // Association rules over per-user event-type baskets (the
    // market-basket view on top of es_frequent_item_sets' pair
    // supports): every directed rule A→B with its exact support /
    // confidence / lift — lift = P(AB)·N / (P(A)·P(B)) as ONE shared
    // double tree. The distinct basket frame materializes once and
    // feeds the pair join AND the item supports; rule grain is
    // |types|²-bounded; the user total is a 1-row comparand
    // (allowlisted).
    "events_basket_rules" -> ((s, dir) => {
      val ut = ev(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
        .localCheckpoint(false)
      val n = ev(s, dir).agg(countDistinct(col("user_id")).as("n_users"))
      val item = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_item"))
      ut.select(col("user_id"), col("event_type").as("antecedent"))
        .join(ut.select(col("user_id"),
          col("event_type").as("consequent")), Seq("user_id"))
        .filter(col("antecedent") =!= col("consequent"))
        .groupBy(col("antecedent"), col("consequent"))
        .agg(count(lit(1)).as("n_pair"))
        .join(broadcast(item.select(col("event_type").as("antecedent"),
          col("n_item").as("n_ant"))), Seq("antecedent"))
        .join(broadcast(item.select(col("event_type").as("consequent"),
          col("n_item").as("n_con"))), Seq("consequent"))
        .crossJoin(broadcast(n))
        .select(col("antecedent"), col("consequent"), col("n_pair"),
          col("n_ant"), col("n_con"),
          (col("n_pair").cast("double") / col("n_users").cast("double"))
            .as("support"),
          (col("n_pair").cast("double") / col("n_ant").cast("double"))
            .as("confidence"),
          (col("n_pair").cast("double") * col("n_users").cast("double") /
            (col("n_ant").cast("double") * col("n_con").cast("double")))
            .as("lift"))
    }),

    // Holt-Winters additive triple smoothing on the DAILY revenue
    // series with a weekly season (m=7; the 30-day corpus holds 4+
    // seasons): α=3/10, β=2/10, γ=1/10 in EXACT scale-10¹⁰ integer
    // fixed point with sign-split division — the events_forecast
    // discipline extended with a 7-slot rotating seasonal state.
    // Standard init: l₀ = mean(week 1), b₀ = (mean(week 2) −
    // mean(week 1))/7, sᵢ = xᵢ − l₀; recursion from day 8, each row
    // also reporting the one-step-ahead fitted value l+b+s BEFORE its
    // update (the in-sample forecast the residual monitor reads). The
    // daily aggregate is distributed; the recursion is driver-side
    // over the calendar-bounded frame; the oracle replays the SAME
    // integers with a recursive CTE carrying the 7 slots. (At ~10⁹
    // daily revenue the ×10¹⁰ products warrant DECIMAL(38,0) — the
    // events_markov widening note.)
    "events_holt_winters" -> ((s, dir) => {
      val spark2 = s
      import spark2.implicits._
      val daily = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(28,10)")).as("sum_dec"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          // ×10¹⁰ through DECIMAL(38,0); BigInt recursion state — no
          // fixed-point envelope (the events_forecast 100×-probe fix:
          // daily sums are 7× smaller than weekly so THIS query
          // survived 100×, but the same Long wrap waited at ~700×);
          // the oracle's recursive CTE runs the same integers in
          // HUGEINT, which BigInt matches exactly
          (col("sum_dec") * lit(10000000000L)).cast("decimal(38,0)")
            .as("x_fp"))
      val rows = daily.orderBy("day").collect()
        .map(r => (r.getString(0), BigInt(r.getDecimal(1).toBigInteger)))
      def idiv(a: BigInt, d: Int): BigInt =
        if (a < 0) -((-a) / d) else a / d
      def dbl(a: BigInt): Double = a.bigInteger.doubleValue / 1.0e10
      val m1 = idiv(rows.slice(0, 7).map(_._2).sum, 7)
      val m2 = idiv(rows.slice(7, 14).map(_._2).sum, 7)
      var l = m1
      var b = idiv(m2 - m1, 7)
      val slots = scala.collection.mutable.Queue(
        rows.slice(0, 7).map(v => v._2 - m1): _*)
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, Double, Double, Double, Double, Double)]
      for ((dayS, x) <- rows.drop(7)) {
        val sPrev = slots.dequeue()
        val fitted = l + b + sPrev
        val lNew = idiv(3 * (x - sPrev) + 7 * (l + b), 10)
        val bNew = idiv(2 * (lNew - l) + 8 * b, 10)
        val sNew = idiv((x - lNew) + 9 * sPrev, 10)
        slots.enqueue(sNew)
        out += ((dayS, dbl(x), dbl(lNew), dbl(bNew), dbl(sNew),
          dbl(fitted)))
        l = lNew; b = bNew
      }
      out.toSeq
        .toDF("day", "x", "level", "trend", "seasonal", "fitted")
    }),

    // Seasonally-adjusted revenue anomalies: each day's purchase
    // revenue against ITS WEEKDAY's mean (the events_seasonality
    // denominator — a Monday is judged against Mondays, so weekly
    // rhythm never false-alarms), flagged outside ±20%. The dow-mean
    // frame is 7 rows (broadcast); thresholds sit inside the measured
    // 0.78–1.26 ratio range so both classes exist. Day-grain output.
    "events_seasonal_anomaly" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(col("value").cast("decimal(28,10)")).as("s_dec"))
        .withColumn("dow", expr(
          "CAST(((datediff(d, DATE '1970-01-05') % 7) + 7) % 7 AS BIGINT)"))
        .localCheckpoint(false) // dow means + the flagged join
      val dw = perDay.groupBy(col("dow"))
        .agg(sum(col("s_dec")).as("dw_dec"), count(lit(1)).as("n_days"))
      perDay.join(broadcast(dw), Seq("dow"))
        .withColumn("dow_mean", col("dw_dec").cast("double") /
          col("n_days").cast("double"))
        .withColumn("ratio",
          col("s_dec").cast("double") / col("dow_mean"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("dow"), col("s_dec").cast("double").as("revenue"),
          col("dow_mean"), col("ratio"),
          (col("ratio") > lit(1.2) || col("ratio") < lit(0.8))
            .as("is_anomaly"))
    }),

    // New-vs-returning daily split (the acquisition dashboard next to
    // events_lifecycle's weekly accounting): a user is NEW on their
    // first-activity day, RETURNING after. First day via one user-
    // partitioned window min (reusing the user exchange — never a
    // user-grain join side), then day-grain distinct counts; the
    // conditional countDistincts drop nulls, so each user lands in
    // exactly one class per day.
    "events_new_vs_returning" -> ((s, dir) => {
      val wu = Window.partitionBy(col("user_id"))
      ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .withColumn("fd", min(col("d")).over(wu))
        .groupBy(col("d"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(when(col("d") === col("fd"), col("user_id")))
            .as("n_new"),
          countDistinct(when(col("d") > col("fd"), col("user_id")))
            .as("n_returning"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("n_users"), col("n_new"), col("n_returning"),
          (col("n_returning").cast("double") /
            col("n_users").cast("double")).as("returning_share"))
    }),

    // Weekday × hour activity heatmap (the Kibana punch-card): event
    // counts per (dow, hour) cell with each cell's share of its
    // weekday — locale-free epoch-day weekday arithmetic, the share
    // window partitioned by dow (24-row partitions, never a global
    // funnel). One fact exchange; 168-cell output.
    "events_heatmap" -> ((s, dir) => {
      val wd = Window.partitionBy(col("dow"))
      ev(s, dir)
        .select(expr("CAST(((datediff(to_date(ts), DATE '1970-01-05')" +
          " % 7) + 7) % 7 AS BIGINT)").as("dow"),
          hour(col("ts")).cast("long").as("hr"))
        .groupBy(col("dow"), col("hr"))
        .agg(count(lit(1)).as("doc_count"))
        .select(col("dow"), col("hr"), col("doc_count"),
          (col("doc_count").cast("double") /
            sum(col("doc_count")).over(wd).cast("double"))
            .as("dow_share"))
    }),

    // Kaplan-Meier churn survival curve by PURCHASE age (weeks since a
    // user's first purchase — the revenue-relevant lapse curve; all-event
    // activity is near-degenerate on this corpus, every user spans it):
    // users whose last purchase falls before the final purchase week
    // churned at that age; final-week purchasers are right-censored
    // (the standard KM treatment — they leave the risk set without
    // counting as deaths). S(t) = Π (n_t − d_t)/n_t in scale-10¹²
    // integer fixed point with floor division — the events_forecast
    // discipline: the per-user min/max aggregate is distributed, the
    // recursion runs driver-side over the age-bounded frame (≤ span
    // weeks rows), and the oracle replays the SAME integers with a
    // recursive CTE. (At ~10⁹ users the s_fp·n product warrants
    // DECIMAL(38,0) — same widening note as events_markov.)
    "events_survival" -> ((s, dir) => {
      val spark2 = s
      import spark2.implicits._
      val wk = to_date(date_trunc("week", col("ts")))
      val purch = ev(s, dir).filter(col("event_type") === "purchase")
      val uw = purch.groupBy(col("user_id"))
        .agg(min(wk).as("fw"), max(wk).as("lw"))
      val mw = purch.agg(max(wk).as("mw"))
      val ages = uw.crossJoin(broadcast(mw))
        .select(expr("CAST(datediff(lw, fw) AS BIGINT) div 7").as("age"),
          (col("lw") === col("mw")).as("cens"))
        .groupBy(col("age"))
        .agg(sum(when(col("cens"), 0L).otherwise(1L)).as("d"),
          sum(when(col("cens"), 1L).otherwise(0L)).as("c"))
      val rows = ages.orderBy("age").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val FP = 1000000000000L
      var sFp = FP
      var atRisk = rows.map(r => r._2 + r._3).sum
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      for ((age, d, c) <- rows) {
        // multiplyExact: sFp·atRisk overflows Long past ~9.2e6 users at
        // risk — fail loudly rather than corrupt the KM product (r9
        // advice; a larger deployment widens sFp to BigInt)
        sFp = if (atRisk > 0)
          Math.multiplyExact(sFp, atRisk - d) / atRisk else sFp
        out += ((age, atRisk, d, c, sFp))
        atRisk -= (d + c)
      }
      out.toSeq
        .toDF("age_weeks", "n_risk", "n_churned", "n_censored", "s_fp")
        .select(col("age_weeks"), col("n_risk"), col("n_churned"),
          col("n_censored"),
          (col("s_fp").cast("double") / lit(1.0e12)).as("survival"))
    }),

    // Time-to-convert histogram: per user, latency from first view to
    // the first purchase AFTER it (the funnel chain with no window
    // cap), bucketed into 6-hour bands — the conversion-latency chart
    // next to events_funnel's counters. One user_id exchange for the
    // two chained window minima; the histogram rollup is band-grain.
    "events_time_to_convert" -> ((s, dir) => {
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("t"))
      val wu = Window.partitionBy(col("user_id"))
      e.withColumn("t1",
          min(when(col("event_type") === "view", col("t"))).over(wu))
        .withColumn("tp",
          min(when(col("event_type") === "purchase" &&
            col("t") > col("t1"), col("t"))).over(wu))
        .filter(col("t1").isNotNull && col("tp").isNotNull)
        .select(col("user_id"), col("t1"), col("tp")).distinct()
        .select(expr("(tp - t1) div 21600000").as("band_6h"))
        .groupBy(col("band_6h"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Revenue concentration (the Pareto view): the top-15 users by
    // exact-decimal revenue with each one's share of the global total.
    // Scale-correct concentration analysis: a TakeOrdered top-k (no
    // global-sort exchange) + ONE 1-row total comparand (allowlisted) —
    // never a global rank over the user universe.
    "events_pareto" -> ((s, dir) => {
      val dec = (c: Column) => c.cast("decimal(28,10)")
      val perUser = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(dec(col("value"))).as("rev_dec"))
      val top = perUser
        .orderBy(col("rev_dec").desc, col("user_id")).limit(15)
      val tot = perUser.agg(sum(col("rev_dec")).as("tot_dec"),
        count(lit(1)).as("n_users"))
      top.crossJoin(broadcast(tot))
        .select(col("user_id"),
          col("rev_dec").cast("double").as("revenue"),
          (col("rev_dec").cast("double") / col("tot_dec").cast("double"))
            .as("share"),
          col("n_users"))
    }),

    // Closed-form OLS trend fit of daily revenue vs day index (the
    // regression panel under events_forecast's smoother): slope and
    // intercept from the normal equations over EXACT integer/decimal
    // sums — x is the integer day offset from the first day (1-row
    // comparand, allowlisted), y the exact decimal day revenue; the
    // two closed-form divisions are the shared double trees. The final
    // fit aggregate runs on the calendar-bounded day frame
    // (allowlisted).
    "events_trend_fit" -> ((s, dir) => {
      val dec = (c: Column) => c.cast("decimal(28,10)")
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("y_dec"))
      val d0 = perDay.agg(min(col("d")).as("d0"))
      val xy = perDay.crossJoin(broadcast(d0))
        .withColumn("x", datediff(col("d"), col("d0")).cast("long"))
      val agg = xy.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y_dec")).as("sy_dec"),
        sum(dec(col("x").cast("double") * col("y_dec").cast("double")))
          .as("sxy_dec"))
      val n = col("n").cast("double")
      val sx = col("sx").cast("double")
      val sxx = col("sxx").cast("double")
      val sy = col("sy_dec").cast("double")
      val sxy = col("sxy_dec").cast("double")
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      agg.select(col("n"), slope.as("slope"),
        ((sy - slope * sx) / n).as("intercept"))
    }),

    // A/B experiment readout: users hash-split 50/50 by the portable
    // hash (deterministic, balanced, stable across reruns — the
    // assignment a real experimentation system uses), then Welch's
    // unpaired t over purchase values between arms — the es_t_test
    // moment arithmetic with hash-derived populations. ONE 1-row
    // conditional aggregate (allowlisted); every double formula is the
    // shared expression tree.
    // CUPED variance reduction (Deng et al. 2013 — the standard
    // experiment-sensitivity trick): per purchasing user, pre-period
    // revenue X (first 15 days, relative to the corpus min date —
    // regeneration-proof) predicts post-period revenue Y; θ =
    // cov(X,Y)/var(X) from ONE 1-row exact-DECIMAL moment pass (pooled
    // across arms, as prescribed — θ from the same experiment's arms
    // is unbiased because assignment ⊥ X), and the readout reports
    // each arm's raw and CUPED-adjusted means. Per-user doubles go
    // through the VARCHAR-dd discipline on the oracle side so the
    // adjusted sums match bit-for-bit.
    "events_cuped" -> ((s, dir) => {
      val dec38 = (c: Column) => c.cast("decimal(38,10)")
      val b = ev(s, dir).agg(min(to_date(col("ts"))).as("d0"))
      val arm = pmod(graft.functions.PortableHash.h15(
        concat(lit("exp1:"), col("user_id").cast("string"))), lit(2L))
      val perUser = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .crossJoin(broadcast(b))
        .groupBy(col("user_id"))
        .agg(sum(when(to_date(col("ts")) < date_add(col("d0"), 15),
            dec38(col("value"))).otherwise(dec38(lit(0.0)))).as("x_dec"),
          sum(when(to_date(col("ts")) >= date_add(col("d0"), 15),
            dec38(col("value"))).otherwise(dec38(lit(0.0)))).as("y_dec"))
        .select(col("user_id"), col("x_dec").cast("double").as("x"),
          col("y_dec").cast("double").as("y"))
        .withColumn("arm", arm)
        .localCheckpoint(false) // moments + the adjusted readout
      val mom = perUser.agg(count(lit(1)).cast("double").as("mn"),
        sum(dec38(col("x"))).as("sxd"), sum(dec38(col("y"))).as("syd"),
        sum(dec38(col("x") * col("x"))).as("sxxd"),
        sum(dec38(col("x") * col("y"))).as("sxyd"))
      val model = mom.select(
        ((col("mn") * col("sxyd").cast("double") -
          col("sxd").cast("double") * col("syd").cast("double")) /
          (col("mn") * col("sxxd").cast("double") -
            col("sxd").cast("double") * col("sxd").cast("double")))
          .as("theta"),
        (col("sxd").cast("double") / col("mn")).as("xbar"))
      perUser.crossJoin(broadcast(model))
        .withColumn("y_adj",
          col("y") - col("theta") * (col("x") - col("xbar")))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum(dec38(col("y"))).as("sy_dec"),
          sum(dec38(col("y_adj"))).as("sa_dec"),
          max(col("theta")).as("theta"))
        .select(col("arm"), col("n_users"),
          (col("sy_dec").cast("double") / col("n_users").cast("double"))
            .as("mean_y"),
          (col("sa_dec").cast("double") / col("n_users").cast("double"))
            .as("mean_y_cuped"),
          col("theta"))
    }),

    // Sample-ratio-mismatch guard for the experiment (the hygiene check
    // every A/B readout runs FIRST — a biased split invalidates
    // events_ab_test before any lift math): USER-level arm counts under
    // the SAME exp1 hash assignment, binomial z against the designed
    // 50/50, flagged at |z| > 3. One distinct-user frame + a 1-row
    // aggregate (allowlisted, Q22 shape).
    "events_ab_srm" -> ((s, dir) => {
      val arm = pmod(graft.functions.PortableHash.h15(
        concat(lit("exp1:"), col("user_id").cast("string"))), lit(2L))
      ev(s, dir).select(col("user_id")).distinct()
        .withColumn("arm", arm)
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))
        .select(col("n_users"), col("n_a"), col("n_b"),
          ((col("n_a").cast("double") -
            col("n_users").cast("double") / lit(2.0)) /
            sqrt(col("n_users").cast("double") * lit(0.25))).as("z"),
          (abs((col("n_a").cast("double") -
            col("n_users").cast("double") / lit(2.0)) /
            sqrt(col("n_users").cast("double") * lit(0.25))) > lit(3.0))
            .as("srm_flag"))
    }),

    "events_ab_test" -> ((s, dir) => {
      val dec38 = (c: Column) => c.cast("decimal(38,10)")
      val arm = pmod(graft.functions.PortableHash.h15(
        concat(lit("exp1:"), col("user_id").cast("string"))), lit(2L))
      val e = ev(s, dir).filter(col("event_type") === "purchase")
        .withColumn("arm", arm)
      def cnt(a: Int) =
        sum(when(col("arm") === a, 1L).otherwise(0L))
      def sx(a: Int) =
        sum(when(col("arm") === a, dec38(col("value")))
          .otherwise(dec38(lit(0.0))))
      def sxx(a: Int) =
        sum(when(col("arm") === a, dec38(col("value") * col("value")))
          .otherwise(dec38(lit(0.0))))
      def vr(sfx: String): Column = {
        val nd = col("n" + sfx).cast("double")
        val sxc = col("sx" + sfx).cast("double")
        val sxxc = col("sxx" + sfx).cast("double")
        (sxxc - sxc * sxc / nd) / (nd - 1.0)
      }
      def mn(sfx: String): Column =
        col("sx" + sfx).cast("double") / col("n" + sfx).cast("double")
      e.agg(cnt(0).as("na"), sx(0).as("sxa"), sxx(0).as("sxxa"),
          cnt(1).as("nb"), sx(1).as("sxb"), sxx(1).as("sxxb"))
        .withColumn("mean_a", mn("a")).withColumn("mean_b", mn("b"))
        .withColumn("var_a", vr("a")).withColumn("var_b", vr("b"))
        .withColumn("se2",
          col("var_a") / col("na").cast("double") +
            col("var_b") / col("nb").cast("double"))
        .select(col("na"), col("nb"), col("mean_a"), col("mean_b"),
          ((col("mean_b") - col("mean_a")) / col("mean_a"))
            .as("lift"),
          ((col("mean_a") - col("mean_b")) / sqrt(col("se2")))
            .as("t_stat"))
    }),

    // RFM segmentation — the CRM rollup over the stream: per-user
    // Recency (hours since last event vs the global max — 1-row Q22
    // comparand, allowlisted), Frequency (event count), Monetary (exact
    // DECIMAL purchase revenue), scored 1-5 by FIXED thresholds (a pure
    // map — the production form; quantile scoring would need a global
    // sort AND re-buckets users whenever the corpus grows). One user_id
    // exchange; the segment rollup runs on the ≤125-cell frame.
    "events_rfm" -> ((s, dir) => {
      val dec = (c: Column) => c.cast("decimal(28,10)")
      val u = ev(s, dir)
        .groupBy(col("user_id"))
        .agg(max(unix_millis(col("ts"))).as("last_t"),
          count(lit(1)).as("freq"),
          sum(when(col("event_type") === "purchase", dec(col("value")))
            .otherwise(dec(lit(0.0)))).as("m_dec"))
      val mx = ev(s, dir).agg(max(unix_millis(col("ts"))).as("mx"))
      u.crossJoin(broadcast(mx))
        .withColumn("rh", expr("(mx - last_t) div 3600000"))
        .withColumn("md", col("m_dec").cast("double"))
        .withColumn("r_score",
          when(col("rh") <= 2, 5).when(col("rh") <= 5, 4)
            .when(col("rh") <= 9, 3).when(col("rh") <= 18, 2)
            .otherwise(1))
        .withColumn("f_score",
          when(col("freq") >= 76, 5).when(col("freq") >= 70, 4)
            .when(col("freq") >= 64, 3).when(col("freq") >= 57, 2)
            .otherwise(1))
        .withColumn("m_score",
          when(col("md") >= 950.0, 5).when(col("md") >= 700.0, 4)
            .when(col("md") >= 520.0, 3).when(col("md") >= 330.0, 2)
            .otherwise(1))
        .groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("m_dec")).cast("double").as("revenue"))
    }),

    // Growth accounting (new / retained / resurrected / churned) on
    // weekly activity — the lifecycle dashboard behind every DAU chart:
    // per user-week, `new` if first-ever week, `retained` if active the
    // prior week, `resurrected` after a gap; a user inactive the week
    // after an active one counts as `churned` in that following week
    // (the standard attribution, emitted even past the span edge — the
    // honest definition). One user_id exchange feeds both windows; the
    // rollup runs on the (week × 4)-cell frame.
    "events_lifecycle" -> ((s, dir) => {
      val uw = ev(s, dir)
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
      val st = uw
        .withColumn("prev", lag(col("wk"), 1).over(w))
        .withColumn("nxt", lead(col("wk"), 1).over(w))
      val active = st.select(col("wk"),
        when(col("prev").isNull, "new")
          .when(datediff(col("wk"), col("prev")) === 7, "retained")
          .otherwise("resurrected").as("status"))
      val churned = st
        .filter(col("nxt").isNull ||
          datediff(col("nxt"), col("wk")) > 7)
        .select(date_add(col("wk"), 7).as("wk"),
          lit("churned").as("status"))
      active.unionByName(churned)
        .groupBy(date_format(col("wk"), "yyyy-MM-dd").as("week"),
          col("status"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // Cohort LTV: cumulative purchase revenue per signup-week cohort by
    // week offset, normalized per cohort user — the payback curve next
    // to events_retention's activity matrix. Cohort assignment reuses
    // the retention discipline (first-signup window over ONE user_id
    // exchange); revenue is an exact DECIMAL sum; the cumulative sum is
    // a decimal window over the cohort×offset frame (calendar-bounded,
    // partitioned by cohort — no global sort); the per-user division is
    // one shared double expression against the ≤cohort-count broadcast.
    "events_cohort_ltv" -> ((s, dir) => {
      val dec = (c: Column) => c.cast("decimal(28,10)")
      val e = ev(s, dir).select(col("user_id"), col("event_type"),
        col("ts"), col("value"), unix_millis(col("ts")).as("t"))
      val wu = Window.partitionBy(col("user_id"))
      val wc = e.withColumn("signup_ts",
          min(when(col("event_type") === "signup", col("ts"))).over(wu))
        .filter(col("signup_ts").isNotNull &&
          col("t") >= unix_millis(col("signup_ts")))
        .select(col("user_id"),
          date_format(date_trunc("week", col("signup_ts")), "yyyy-MM-dd")
            .as("cohort_week"),
          expr("cast(datediff(to_date(ts), " +
            "to_date(date_trunc('week', signup_ts))) as bigint) div 7")
            .as("week_offset"),
          when(col("event_type") === "purchase", dec(col("value")))
            .otherwise(dec(lit(0.0))).as("pv"))
        .localCheckpoint(false)
      val grain = wc.groupBy(col("cohort_week"), col("week_offset"))
        .agg(sum(col("pv")).as("rev_dec"))
      val sizes = wc.groupBy(col("cohort_week"))
        .agg(countDistinct(col("user_id")).as("cohort_users"))
      val wk = Window.partitionBy(col("cohort_week"))
        .orderBy(col("week_offset"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grain.join(broadcast(sizes), Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"),
          col("rev_dec").cast("double").as("week_value"),
          sum(col("rev_dec")).over(wk).cast("double").as("cum_value"),
          col("cohort_users"),
          (sum(col("rev_dec")).over(wk).cast("double") /
            col("cohort_users").cast("double")).as("ltv_per_user"))
    })
  )

  /** Markov replay: the transition chain of events_transitions, then
    * MkIters unrolled power-iteration CTEs — each `(r·n) // tot` in
    * BIGINT, exactly the Spark fold.
    */
  private def markovSql: String = {
    val iterCtes = (1 to MkIters).map { i =>
      s"""mk_c$i AS (SELECT e.to_type AS event_type,
                   sum((r.r * e.n) // e.tot)::BIGINT AS c
                 FROM mk_ed e JOIN mk_r${i - 1} r
                   ON r.event_type = e.from_type GROUP BY 1),
          mk_r$i AS (SELECT t.event_type,
                   COALESCE(c.c, 0)::BIGINT AS r
                 FROM mk_ty t LEFT JOIN mk_c$i c USING (event_type))"""
    }.mkString(",\n")
    s"""WITH mk_p AS (
          SELECT event_type AS from_type,
                 lead(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS to_type
          FROM events),
        mk_c AS (SELECT from_type, to_type, count(*) AS n
              FROM mk_p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        mk_t AS (SELECT from_type, sum(n)::BIGINT AS tot
              FROM mk_c GROUP BY 1),
        mk_ed AS (SELECT c.from_type, c.to_type, c.n, t.tot
               FROM mk_c c JOIN mk_t t USING (from_type)),
        mk_ty AS (SELECT DISTINCT event_type FROM events),
        mk_nn AS (SELECT count(*)::BIGINT AS n FROM mk_ty),
        mk_r0 AS (SELECT event_type, ($MkScale // mk_nn.n)::BIGINT AS r
               FROM mk_ty CROSS JOIN mk_nn),
        $iterCtes,
        mk_obs AS (SELECT event_type, count(*)::BIGINT AS n_events
                FROM events GROUP BY 1)
        SELECT r.event_type, r.r AS pi_fp,
               CAST(r.r AS DOUBLE) / ${MkScale.toDouble} AS pi,
               CAST(o.n_events AS DOUBLE) /
                 CAST(sum(o.n_events) OVER () AS DOUBLE) AS obs_share
        FROM mk_r$MkIters r JOIN mk_obs o USING (event_type)"""
  }

  /** Holt replay: the weekly fixed-point frame, then a recursive CTE
    * stepping the SAME sign-split integer arithmetic as the driver-side
    * fold (the l-expression is inlined twice in the b-step — integer
    * arithmetic is exact, so textual duplication is safe).
    */
  /** Holt-Winters replay: the same scale-10¹⁰ sign-split integer
    * recurrences stepped by a recursive CTE that carries the 7-slot
    * rotating seasonal state (s1 = s_{t−6} … s7 = s_t). lNew is
    * inlined wherever referenced — SQL cannot alias-within-SELECT —
    * so the strings are built once here and expanded mechanically.
    */
  private def holtWintersSql: String = {
    def idivS(e: String, d: Long): String =
      s"(CASE WHEN ($e) < 0 THEN -((-($e)) // $d) ELSE ($e) // $d END)"
    val lNew = idivS("3*(d.x - hw.s1) + 7*(hw.l + hw.b)", 10L)
    val bNew = idivS(s"2*(($lNew) - hw.l) + 8*hw.b", 10L)
    val sNew = idivS(s"(d.x - ($lNew)) + 9*hw.s1", 10L)
    val b0 = idivS("m2 - m1", 7L)
    def slot(i: Int): String =
      s"((SELECT x FROM dser WHERE rn = $i) - m1) AS s$i"
    val dd10 = "CAST(%s AS DOUBLE) / 10000000000.0"
    s"""WITH RECURSIVE dser AS (
          SELECT row_number() OVER (ORDER BY d) AS rn,
                 strftime(d, '%Y-%m-%d') AS day,
                 CAST(sum_dec * 10000000000 AS BIGINT) AS x
          FROM (SELECT CAST(ts AS DATE) AS d,
                       sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
                FROM events GROUP BY 1)),
        ini AS (
          SELECT ((SELECT sum(x) FROM dser WHERE rn <= 7) // 7)::BIGINT
                   AS m1,
                 ((SELECT sum(x) FROM dser WHERE rn BETWEEN 8 AND 14)
                   // 7)::BIGINT AS m2),
        hw AS (
          SELECT 7::BIGINT AS rn, CAST(NULL AS VARCHAR) AS day,
                 CAST(NULL AS BIGINT) AS x, m1 AS l, ($b0)::BIGINT AS b,
                 ${(1 to 7).map(slot).mkString(", ")},
                 CAST(NULL AS BIGINT) AS fitted
          FROM ini
          UNION ALL
          SELECT d.rn, d.day, d.x,
                 ($lNew)::BIGINT AS l, ($bNew)::BIGINT AS b,
                 hw.s2 AS s1, hw.s3 AS s2, hw.s4 AS s3, hw.s5 AS s4,
                 hw.s6 AS s5, hw.s7 AS s6, ($sNew)::BIGINT AS s7,
                 (hw.l + hw.b + hw.s1)::BIGINT AS fitted
          FROM hw JOIN dser d ON d.rn = hw.rn + 1)
        SELECT day, ${dd10.format("x")} AS x,
               ${dd10.format("l")} AS level,
               ${dd10.format("b")} AS trend,
               ${dd10.format("s7")} AS seasonal,
               ${dd10.format("fitted")} AS fitted
        FROM hw WHERE day IS NOT NULL"""
  }

  private def forecastSql: String = {
    val lE = "(3 * w.x_fp + 7 * (h.l + h.b))"
    val lDiv = s"(CASE WHEN $lE < 0 THEN -((-$lE) // 10) " +
      s"ELSE $lE // 10 END)"
    val bE = s"(2 * ($lDiv - h.l) + 8 * h.b)"
    val bDiv = s"(CASE WHEN $bE < 0 THEN -((-$bE) // 10) " +
      s"ELSE $bE // 10 END)"
    s"""WITH RECURSIVE wf AS (
          SELECT row_number() OVER (ORDER BY wk) AS rn,
                 strftime(wk, '%Y-%m-%d') AS week,
                 CAST(sum_dec * 10000000000 AS BIGINT) AS x_fp
          FROM (SELECT date_trunc('week', CAST(ts AS DATE)) AS wk,
                       sum(CAST(value AS DECIMAL(28,10))) AS sum_dec
                FROM events GROUP BY 1)),
        h AS (
          SELECT w1.rn, w1.week, w1.x_fp, w1.x_fp AS l,
                 CAST(COALESCE(w2.x_fp - w1.x_fp, 0) AS BIGINT) AS b
          FROM wf w1 LEFT JOIN wf w2 ON w2.rn = 2
          WHERE w1.rn = 1
          UNION ALL
          SELECT w.rn, w.week, w.x_fp, $lDiv AS l, $bDiv AS b
          FROM h JOIN wf w ON w.rn = h.rn + 1)
        SELECT week, CAST(x_fp AS DOUBLE) / 1.0E10 AS x,
               CAST(l AS DOUBLE) / 1.0E10 AS level,
               CAST(b AS DOUBLE) / 1.0E10 AS trend,
               CAST(l + b AS DOUBLE) / 1.0E10 AS forecast_next
        FROM h"""
  }

  /** CAST(CAST(x AS VARCHAR) AS DOUBLE) — the decimal→double edge. */
  private def dd(e: String): String =
    s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "events_forecast" -> forecastSql,
    "events_holt_winters" -> holtWintersSql,
    "events_item_similarity" ->
      s"""WITH ui AS (
            SELECT user_id,
                   CAST(CAST(json_extract_string(props, '$$.k')
                     AS INTEGER) AS BIGINT) AS item,
                   count(*) AS c
            FROM events
            WHERE json_extract_string(props, '$$.k') IS NOT NULL
            GROUP BY 1, 2),
          norms AS (
            SELECT item, sum(CAST(c * c AS DECIMAL(38,10))) AS ssq_dec
            FROM ui GROUP BY 1),
          p AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   count(*) AS n_common_users,
                   sum(CAST(a.c * b.c AS DECIMAL(38,10))) AS dot_dec
            FROM ui a JOIN ui b ON a.user_id = b.user_id
              AND a.item < b.item
            GROUP BY 1, 2)
          SELECT item_a, item_b, n_common_users,
                 ${dd("dot_dec")} /
                   (sqrt(${dd("na.ssq_dec")}) * sqrt(${dd("nb.ssq_dec")}))
                   AS cos
          FROM p
          JOIN norms na ON p.item_a = na.item
          JOIN norms nb ON p.item_b = nb.item
          ORDER BY cos DESC, item_a, item_b LIMIT 20""",
    "events_basket_rules" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
          n AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
          item AS (SELECT event_type, count(*) AS n_item
                   FROM ut GROUP BY 1),
          p AS (
            SELECT a.event_type AS antecedent,
                   b.event_type AS consequent, count(*) AS n_pair
            FROM ut a JOIN ut b ON a.user_id = b.user_id
            WHERE a.event_type <> b.event_type
            GROUP BY 1, 2)
          SELECT antecedent, consequent, n_pair,
                 ia.n_item AS n_ant, ic.n_item AS n_con,
                 CAST(n_pair AS DOUBLE) / CAST(n_users AS DOUBLE)
                   AS support,
                 CAST(n_pair AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
                   AS confidence,
                 CAST(n_pair AS DOUBLE) * CAST(n_users AS DOUBLE) /
                   (CAST(ia.n_item AS DOUBLE) * CAST(ic.n_item AS DOUBLE))
                   AS lift
          FROM p
          JOIN item ia ON p.antecedent = ia.event_type
          JOIN item ic ON p.consequent = ic.event_type
          CROSS JOIN n""",
    "events_seasonal_anomaly" ->
      s"""WITH pd AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS s_dec,
                   CAST(((date_diff('day', DATE '1970-01-05',
                       CAST(ts AS DATE)) % 7) + 7) % 7 AS BIGINT) AS dow
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 3),
          dw AS (SELECT dow, sum(s_dec) AS dw_dec, count(*) AS n_days
                 FROM pd GROUP BY 1)
          SELECT strftime(d, '%Y-%m-%d') AS day, pd.dow,
                 ${dd("s_dec")} AS revenue,
                 ${dd("dw_dec")} / CAST(n_days AS DOUBLE) AS dow_mean,
                 ${dd("s_dec")} /
                   (${dd("dw_dec")} / CAST(n_days AS DOUBLE)) AS ratio,
                 (${dd("s_dec")} /
                   (${dd("dw_dec")} / CAST(n_days AS DOUBLE)) > 1.2
                  OR ${dd("s_dec")} /
                   (${dd("dw_dec")} / CAST(n_days AS DOUBLE)) < 0.8)
                   AS is_anomaly
          FROM pd JOIN dw ON pd.dow = dw.dow""",
    "events_new_vs_returning" ->
      """WITH ud AS (
           SELECT user_id, CAST(ts AS DATE) AS d,
                  min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
                    AS fd
           FROM events)
         SELECT strftime(d, '%Y-%m-%d') AS day,
                count(DISTINCT user_id) AS n_users,
                count(DISTINCT CASE WHEN d = fd THEN user_id END)
                  AS n_new,
                count(DISTINCT CASE WHEN d > fd THEN user_id END)
                  AS n_returning,
                CAST(count(DISTINCT CASE WHEN d > fd THEN user_id END)
                  AS DOUBLE) / CAST(count(DISTINCT user_id) AS DOUBLE)
                  AS returning_share
         FROM ud GROUP BY 1""",
    "events_heatmap" ->
      """WITH g AS (
           SELECT CAST(((date_diff('day', DATE '1970-01-05',
                    CAST(ts AS DATE)) % 7) + 7) % 7 AS BIGINT) AS dow,
                  CAST(hour(ts) AS BIGINT) AS hr,
                  count(*) AS doc_count
           FROM events GROUP BY 1, 2)
         SELECT dow, hr, doc_count,
                CAST(doc_count AS DOUBLE) /
                  CAST(sum(doc_count) OVER (PARTITION BY dow) AS DOUBLE)
                  AS dow_share
         FROM g""",
    "events_survival" ->
      // same replay: user min/max week aggregate, age/censor counts,
      // then the SAME scale-10¹² floor-division KM product stepped by
      // a recursive CTE (the forecastSql discipline)
      """WITH RECURSIVE uw AS (
           SELECT user_id,
                  min(date_trunc('week', CAST(ts AS DATE))) AS fw,
                  max(date_trunc('week', CAST(ts AS DATE))) AS lw
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         mw AS (SELECT max(date_trunc('week', CAST(ts AS DATE))) AS mw
                FROM events WHERE event_type = 'purchase'),
         ag AS (
           SELECT CAST(date_diff('day', fw, lw) AS BIGINT) // 7 AS age,
                  sum(CASE WHEN lw = mw THEN 0 ELSE 1 END)::BIGINT AS d,
                  sum(CASE WHEN lw = mw THEN 1 ELSE 0 END)::BIGINT AS c
           FROM uw CROSS JOIN mw GROUP BY 1),
         tot AS (SELECT sum(d + c)::BIGINT AS total FROM ag),
         ord AS (SELECT age, d, c,
                   row_number() OVER (ORDER BY age) AS rn FROM ag),
         km AS (
           SELECT o.rn, o.age, t.total AS n_risk, o.d, o.c,
                  (CASE WHEN t.total > 0
                    THEN (1000000000000 * (t.total - o.d)) // t.total
                    ELSE 1000000000000 END)::BIGINT AS s_fp
           FROM ord o CROSS JOIN tot t WHERE o.rn = 1
           UNION ALL
           SELECT o.rn, o.age,
                  (km.n_risk - km.d - km.c)::BIGINT AS n_risk, o.d, o.c,
                  (CASE WHEN (km.n_risk - km.d - km.c) > 0
                    THEN (km.s_fp * ((km.n_risk - km.d - km.c) - o.d))
                           // (km.n_risk - km.d - km.c)
                    ELSE km.s_fp END)::BIGINT AS s_fp
           FROM km JOIN ord o ON o.rn = km.rn + 1)
         SELECT age AS age_weeks, n_risk, d AS n_churned,
                c AS n_censored,
                CAST(s_fp AS DOUBLE) / 1000000000000.0 AS survival
         FROM km""",
    "events_seasonality" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS s_dec
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
          gstats AS (SELECT sum(s_dec) AS tot_dec, count(*) AS n_days
                   FROM per_day),
          dw AS (
            SELECT CAST(((date_diff('day', DATE '1970-01-05', d) % 7)
                     + 7) % 7 AS BIGINT) AS dow,
                   count(*) AS n_days_dow, sum(s_dec) AS dow_dec
            FROM per_day GROUP BY 1)
          SELECT dow, n_days_dow,
                 ${dd("dow_dec")} / CAST(n_days_dow AS DOUBLE)
                   AS mean_rev,
                 (${dd("dow_dec")} / CAST(n_days_dow AS DOUBLE)) /
                   (${dd("tot_dec")} / CAST(n_days AS DOUBLE))
                   AS seasonal_index
          FROM dw CROSS JOIN gstats""",
    "events_wau_rolling" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
                     FROM events),
          b AS (SELECT max(CAST(ts AS DATE)) AS mx FROM events),
          ex AS (SELECT DISTINCT user_id,
                   CAST(unnest(generate_series(d, least(d + 6, mx),
                     INTERVAL 1 DAY)) AS DATE) AS day
                 FROM ud CROSS JOIN b)
          SELECT strftime(day, '%Y-%m-%d') AS day, count(*) AS wau
          FROM ex GROUP BY 1""",
    "events_time_to_convert" ->
      """WITH u AS (
           SELECT user_id,
                  min(epoch_ms(ts)) FILTER (WHERE event_type = 'view')
                    AS t1
           FROM events GROUP BY 1),
         p AS (
           SELECT e.user_id, u.t1, min(epoch_ms(e.ts)) AS tp
           FROM events e JOIN u USING (user_id)
           WHERE u.t1 IS NOT NULL AND e.event_type = 'purchase'
             AND epoch_ms(e.ts) > u.t1
           GROUP BY 1, 2)
         SELECT (tp - t1) // 21600000 AS band_6h,
                count(*) AS n_users
         FROM p GROUP BY 1""",
    "events_pareto" ->
      s"""WITH u AS (
            SELECT user_id,
                   sum(CAST(value AS DECIMAL(28,10))) AS rev_dec
            FROM events GROUP BY 1),
          t AS (SELECT sum(rev_dec) AS tot_dec, count(*) AS n_users
                FROM u),
          top AS (SELECT user_id, rev_dec FROM u
                  ORDER BY rev_dec DESC, user_id LIMIT 15)
          SELECT user_id, ${dd("rev_dec")} AS revenue,
                 ${dd("rev_dec")} / ${dd("tot_dec")} AS share, n_users
          FROM top CROSS JOIN t""",
    "events_trend_fit" -> {
      val slopeE =
        s"""(CAST(n AS DOUBLE) * ${dd("sxy_dec")} -
             CAST(sx AS DOUBLE) * ${dd("sy_dec")}) /
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
             CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS y_dec
            FROM events GROUP BY 1),
          d0 AS (SELECT min(d) AS d0 FROM per_day),
          xy AS (
            SELECT CAST(date_diff('day', d0.d0, p.d) AS BIGINT) AS x,
                   y_dec
            FROM per_day p CROSS JOIN d0),
          g AS (
            SELECT count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   sum(y_dec) AS sy_dec,
                   sum(CAST(CAST(x AS DOUBLE) *
                     ${dd("y_dec")} AS DECIMAL(28,10))) AS sxy_dec
            FROM xy)
          SELECT n, $slopeE AS slope,
                 (${dd("sy_dec")} - ($slopeE) * CAST(sx AS DOUBLE)) /
                   CAST(n AS DOUBLE) AS intercept
          FROM g"""
    },
    "events_cuped" -> {
      val h = graft.functions.PortableHash.duckH15(
        "'exp1:' || CAST(user_id AS VARCHAR)")
      s"""WITH b AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
          pu AS (
            SELECT user_id,
                   ${dd("sum(CASE WHEN CAST(ts AS DATE) < d0 + 15 " +
                     "THEN CAST(value AS DECIMAL(38,10)) " +
                     "ELSE CAST(0.0 AS DECIMAL(38,10)) END)")} AS x,
                   ${dd("sum(CASE WHEN CAST(ts AS DATE) >= d0 + 15 " +
                     "THEN CAST(value AS DECIMAL(38,10)) " +
                     "ELSE CAST(0.0 AS DECIMAL(38,10)) END)")} AS y,
                   $h % 2 AS arm
            FROM events CROSS JOIN b
            WHERE event_type = 'purchase'
            GROUP BY user_id),
          mom AS (
            -- every double->DECIMAL cast goes through VARCHAR: Spark
            -- rounds the SHORTEST string representation (the lloydCtes
            -- note), DuckDB's direct cast rounds the binary value
            SELECT CAST(count(*) AS DOUBLE) AS mn,
                   ${dd("sum(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,10)))")} AS sx,
                   ${dd("sum(CAST(CAST(y AS VARCHAR) AS DECIMAL(38,10)))")} AS sy,
                   ${dd("sum(CAST(CAST(x * x AS VARCHAR) AS DECIMAL(38,10)))")} AS sxx,
                   ${dd("sum(CAST(CAST(x * y AS VARCHAR) AS DECIMAL(38,10)))")} AS sxy
            FROM pu),
          model AS (
            SELECT (mn * sxy - sx * sy) / (mn * sxx - sx * sx) AS theta,
                   sx / mn AS xbar
            FROM mom)
          SELECT arm, count(*) AS n_users,
                 ${dd("sum(CAST(CAST(y AS VARCHAR) " +
                   "AS DECIMAL(38,10)))")} /
                   CAST(count(*) AS DOUBLE) AS mean_y,
                 ${dd("sum(CAST(CAST(y - theta * (x - xbar) AS VARCHAR) " +
                   "AS DECIMAL(38,10)))")} /
                   CAST(count(*) AS DOUBLE) AS mean_y_cuped,
                 max(theta) AS theta
          FROM pu CROSS JOIN model GROUP BY arm"""
    },
    "events_ab_srm" ->
      s"""WITH u AS (
            SELECT DISTINCT user_id FROM events),
          a AS (
            SELECT count(*) AS n_users,
                   sum(CASE WHEN ${graft.functions.PortableHash.duckH15(
                     "'exp1:' || CAST(user_id AS VARCHAR)")} % 2 = 0
                     THEN 1 ELSE 0 END)::BIGINT AS n_a,
                   sum(CASE WHEN ${graft.functions.PortableHash.duckH15(
                     "'exp1:' || CAST(user_id AS VARCHAR)")} % 2 = 1
                     THEN 1 ELSE 0 END)::BIGINT AS n_b
            FROM u)
          SELECT n_users, n_a, n_b,
                 (CAST(n_a AS DOUBLE) - CAST(n_users AS DOUBLE) / 2.0) /
                   sqrt(CAST(n_users AS DOUBLE) * 0.25) AS z,
                 (abs((CAST(n_a AS DOUBLE) - CAST(n_users AS DOUBLE)
                     / 2.0) /
                   sqrt(CAST(n_users AS DOUBLE) * 0.25)) > 3.0)
                   AS srm_flag
          FROM a""",
    "events_ab_test" -> {
      val armE = Duck.h15("concat('exp1:', user_id::VARCHAR)") + " % 2"
      s"""WITH p AS (
            SELECT value, $armE AS arm FROM events
            WHERE event_type = 'purchase'),
          g AS (SELECT
            CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS na,
            sum(CASE WHEN arm = 0 THEN CAST(value AS DECIMAL(38,10))
                ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxa,
            sum(CASE WHEN arm = 0
                THEN CAST(value * value AS DECIMAL(38,10))
                ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxxa,
            CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS nb,
            sum(CASE WHEN arm = 1 THEN CAST(value AS DECIMAL(38,10))
                ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxb,
            sum(CASE WHEN arm = 1
                THEN CAST(value * value AS DECIMAL(38,10))
                ELSE CAST(0.0 AS DECIMAL(38,10)) END) AS sxxb
            FROM p),
          m AS (SELECT na, nb,
            ${dd("sxa")} / CAST(na AS DOUBLE) AS mean_a,
            ${dd("sxb")} / CAST(nb AS DOUBLE) AS mean_b,
            (${dd("sxxa")} - ${dd("sxa")} * ${dd("sxa")} /
               CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
              AS var_a,
            (${dd("sxxb")} - ${dd("sxb")} * ${dd("sxb")} /
               CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)
              AS var_b
            FROM g),
          t AS (SELECT *, var_a / CAST(na AS DOUBLE) +
                  var_b / CAST(nb AS DOUBLE) AS se2 FROM m)
          SELECT na, nb, mean_a, mean_b,
                 (mean_b - mean_a) / mean_a AS lift,
                 (mean_a - mean_b) / sqrt(se2) AS t_stat
          FROM t"""
    },
    "events_funnel" ->
      s"""WITH u AS (
            SELECT user_id,
                   min(epoch_ms(ts)) FILTER (WHERE event_type = 'view')
                     AS t1
            FROM events GROUP BY 1),
          c AS (
            SELECT e.user_id, min(epoch_ms(e.ts)) AS t2
            FROM events e JOIN u USING (user_id)
            WHERE e.event_type = 'click' AND epoch_ms(e.ts) > u.t1
              AND epoch_ms(e.ts) <= u.t1 + $StepWindowMs
            GROUP BY 1),
          p AS (
            SELECT e.user_id, min(epoch_ms(e.ts)) AS t3
            FROM events e JOIN c USING (user_id)
            WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > c.t2
              AND epoch_ms(e.ts) <= c.t2 + $StepWindowMs
            GROUP BY 1),
          s AS (SELECT (SELECT count(t1) FROM u) AS s1,
                       (SELECT count(*) FROM c) AS s2,
                       (SELECT count(*) FROM p) AS s3)
          SELECT step, n_users,
                 CAST(n_users AS DOUBLE) / CAST(s1 AS DOUBLE) AS conv
          FROM (SELECT 'view' AS step, s1 AS n_users, s1 FROM s
                UNION ALL SELECT 'click', s2, s1 FROM s
                UNION ALL SELECT 'purchase', s3, s1 FROM s)""",
    "events_retention" ->
      """WITH u AS (
           SELECT user_id,
                  min(ts) FILTER (WHERE event_type = 'signup') AS st
           FROM events GROUP BY 1)
         SELECT strftime(date_trunc('week', u.st), '%Y-%m-%d')
                  AS cohort_week,
                CAST(date_diff('day',
                    CAST(date_trunc('week', u.st) AS DATE),
                    CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week_offset,
                count(DISTINCT e.user_id) AS n_users
         FROM events e JOIN u USING (user_id)
         WHERE u.st IS NOT NULL AND epoch_ms(e.ts) >= epoch_ms(u.st)
         GROUP BY 1, 2""",
    "events_transitions" ->
      """WITH pairs AS (
           SELECT event_type AS from_type,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY epoch_ms(ts), event_id) AS to_type
           FROM events),
         cnt AS (
           SELECT from_type, to_type, count(*) AS n
           FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
         tot AS (
           SELECT from_type, sum(n)::BIGINT AS tot FROM cnt GROUP BY 1)
         SELECT c.from_type, c.to_type, c.n,
                CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
         FROM cnt c JOIN tot t USING (from_type)""",
    "events_paths" ->
      """WITH tri AS (
           SELECT event_type AS step1,
                  lead(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY epoch_ms(ts), event_id) AS step2,
                  lead(event_type, 2) OVER (PARTITION BY user_id
                    ORDER BY epoch_ms(ts), event_id) AS step3
           FROM events)
         SELECT step1, step2, step3, count(*) AS n
         FROM tri WHERE step3 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY n DESC, step1, step2, step3 LIMIT 20""",
    "events_dau_mau" ->
      """WITH dau AS (
           SELECT CAST(ts AS DATE) AS d, count(DISTINCT user_id) AS dau
           FROM events GROUP BY 1),
         mau AS (
           SELECT strftime(ts, '%Y-%m') AS m,
                  count(DISTINCT user_id) AS mau
           FROM events GROUP BY 1)
         SELECT strftime(d, '%Y-%m-%d') AS day, dau, mau,
                CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
         FROM dau JOIN mau ON strftime(d, '%Y-%m') = m""",
    "events_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type, value,
                  epoch_ms(ts) AS t FROM events),
          w AS (SELECT *,
                  last_value(CASE WHEN event_type IN ('view', 'click')
                      THEN t END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS at,
                  last_value(CASE WHEN event_type IN ('view', 'click')
                      THEN event_type END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS aty
                FROM e),
          p AS (SELECT CASE WHEN at IS NOT NULL
                    AND t - at <= $StepWindowMs
                  THEN aty ELSE 'direct' END AS channel, value
                FROM w WHERE event_type = 'purchase'),
          g AS (SELECT channel, count(*)::BIGINT AS n_purchases,
                  CAST(CAST(sum(CAST(value AS DECIMAL(28,10)))
                    AS VARCHAR) AS DOUBLE) AS revenue
                FROM p GROUP BY 1)
          SELECT channel, n_purchases, revenue,
            CAST(n_purchases AS DOUBLE) /
              CAST(sum(n_purchases) OVER () AS DOUBLE) AS share
          FROM g""",
    "events_markov" -> markovSql,
    "events_anomaly" ->
      s"""WITH h AS (
            SELECT event_type, date_trunc('hour', ts) AS hh,
                   count(*) AS x
            FROM events GROUP BY 1, 2),
          b AS (SELECT min(date_trunc('hour', ts)) AS mn,
                       max(date_trunc('hour', ts)) AS mx FROM events),
          sp AS (
            SELECT t.event_type, s.hh
            FROM (SELECT DISTINCT event_type FROM events) t,
                 (SELECT unnest(generate_series(mn, mx,
                    INTERVAL 1 HOUR)) AS hh FROM b) s),
          f AS (
            SELECT sp.event_type, sp.hh, coalesce(h.x, 0) AS x
            FROM sp LEFT JOIN h
              ON sp.event_type = h.event_type AND sp.hh = h.hh),
          st AS (
            SELECT event_type, count(*) AS n, sum(x) AS s,
                   sum(x * x) AS q
            FROM f GROUP BY 1)
          SELECT f.event_type,
                 strftime(f.hh, '%Y-%m-%d %H:00:00') AS bucket,
                 f.x AS doc_count
          FROM f JOIN st USING (event_type)
          WHERE (n * x - s) * (n * x - s) > $ZSq * (n * q - s * s)""",
    "events_rfm" ->
      """WITH mx AS (SELECT max(epoch_ms(ts)) AS mx FROM events),
          u AS (
            SELECT user_id, max(epoch_ms(ts)) AS last_t,
                   count(*) AS freq,
                   sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(value AS DECIMAL(28,10))
                       ELSE CAST(0.0 AS DECIMAL(28,10)) END) AS m_dec
            FROM events GROUP BY 1),
          sc AS (
            SELECT (mx.mx - u.last_t) // 3600000 AS rh, freq, m_dec,
                   CAST(CAST(m_dec AS VARCHAR) AS DOUBLE) AS md
            FROM u CROSS JOIN mx)
          SELECT
            CASE WHEN rh <= 2 THEN 5 WHEN rh <= 5 THEN 4
                 WHEN rh <= 9 THEN 3 WHEN rh <= 18 THEN 2
                 ELSE 1 END AS r_score,
            CASE WHEN freq >= 76 THEN 5 WHEN freq >= 70 THEN 4
                 WHEN freq >= 64 THEN 3 WHEN freq >= 57 THEN 2
                 ELSE 1 END AS f_score,
            CASE WHEN md >= 950.0 THEN 5 WHEN md >= 700.0 THEN 4
                 WHEN md >= 520.0 THEN 3 WHEN md >= 330.0 THEN 2
                 ELSE 1 END AS m_score,
            count(*) AS n_users,
            CAST(CAST(sum(m_dec) AS VARCHAR) AS DOUBLE) AS revenue
          FROM sc GROUP BY 1, 2, 3""",
    "events_lifecycle" ->
      """WITH uw AS (
            SELECT DISTINCT user_id,
                   date_trunc('week', CAST(ts AS DATE)) AS wk
            FROM events),
          st AS (
            SELECT user_id, wk,
                   lag(wk) OVER (PARTITION BY user_id ORDER BY wk)
                     AS prev,
                   lead(wk) OVER (PARTITION BY user_id ORDER BY wk)
                     AS nxt
            FROM uw),
          a AS (
            SELECT wk, CASE WHEN prev IS NULL THEN 'new'
                   WHEN date_diff('day', prev, wk) = 7 THEN 'retained'
                   ELSE 'resurrected' END AS status
            FROM st),
          c AS (
            SELECT wk + 7 AS wk, 'churned' AS status
            FROM st WHERE nxt IS NULL OR date_diff('day', wk, nxt) > 7),
          u AS (SELECT * FROM a UNION ALL SELECT * FROM c)
          SELECT strftime(wk, '%Y-%m-%d') AS week, status,
                 count(*) AS n_users
          FROM u GROUP BY 1, 2""",
    "events_cohort_ltv" ->
      """WITH u AS (
            SELECT user_id,
                   min(ts) FILTER (WHERE event_type = 'signup') AS st
            FROM events GROUP BY 1),
          f AS (
            SELECT e.user_id,
                   strftime(date_trunc('week', u.st), '%Y-%m-%d')
                     AS cohort_week,
                   CAST(date_diff('day',
                       CAST(date_trunc('week', u.st) AS DATE),
                       CAST(e.ts AS DATE)) // 7 AS BIGINT) AS week_offset,
                   CASE WHEN e.event_type = 'purchase'
                        THEN CAST(e.value AS DECIMAL(28,10))
                        ELSE CAST(0.0 AS DECIMAL(28,10)) END AS pv
            FROM events e JOIN u USING (user_id)
            WHERE u.st IS NOT NULL AND epoch_ms(e.ts) >= epoch_ms(u.st)),
          g AS (
            SELECT cohort_week, week_offset, sum(pv) AS rev_dec
            FROM f GROUP BY 1, 2),
          sz AS (
            SELECT cohort_week, count(DISTINCT user_id) AS cohort_users
            FROM f GROUP BY 1)
          SELECT g.cohort_week, g.week_offset,
                 CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS week_value,
                 CAST(CAST(sum(rev_dec) OVER (PARTITION BY g.cohort_week
                     ORDER BY g.week_offset ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
                   AS cum_value,
                 cohort_users,
                 CAST(CAST(sum(rev_dec) OVER (PARTITION BY g.cohort_week
                     ORDER BY g.week_offset ROWS BETWEEN UNBOUNDED
                     PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) /
                   CAST(cohort_users AS DOUBLE) AS ltv_per_user
          FROM g JOIN sz USING (cohort_week)"""
  )
}
