package graft.queries

import graft.Tables
import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The remaining Elasticsearch DSL surface: the geo family, the last
  * pipeline aggs, and the text/field statistics aggs — served natively,
  * same contract as [[EsAggQueries]] (the injector exists to power these
  * Kibana aggregations over the indexed stream; reference README +
  * src/elasticsearch/elasticsearch.go:1-40 document the index layout the
  * DSL runs against).
  *
  * Geo data: the harness tables carry no coordinates, so — exactly like
  * the derived `partsupp` that unlocked TPC-H Q2/Q11/Q16/Q20
  * (TpchQueries.partsupp) — each event derives a deterministic
  * (lat, lon) from the portable hash of its user, with the IDENTICAL
  * formula in Spark and in the DuckDB oracle CTE. The derivation is a
  * pure map over the scan (no shuffle, no model state); at 100 TB a real
  * deployment reads stored coordinates and every plan below is unchanged.
  *
  * Cross-engine determinism: house rules throughout (exact DECIMAL sums,
  * `dd()` VARCHAR round-trip for DOUBLE outputs, shared expression
  * trees). Two deliberate choices:
  *
  *  - `ln`/trig are NOT exactly-rounded IEEE ops, so no raw
  *    transcendental value ever reaches an output column. The geo
  *    queries expose only DISCRETE results (geohash cells, map tiles,
  *    distance rings — a 1-ulp disagreement flips a bucket only when a
  *    point lands within ~2.5 mm of a ring edge; the derived grid makes
  *    that measure-zero), and `es_string_stats` reports the EXACT
  *    Rényi-2 collision kernel Σp² (integer/decimal arithmetic) instead
  *    of ES's Shannon entropy — the same monotone information measure
  *    without the un-portable `log2`.
  *  - ES's `variable_width_histogram` is a heuristic streaming
  *    clusterer; the deterministic analogue here quantizes to unit cells
  *    (value-domain-bounded, not row-bounded) and splits at the N−1
  *    widest empty gaps — exactly replayable by the oracle.
  *
  * Scale: every query's only fact-sized exchange is its first groupBy;
  * spines/boundaries/totals are bucket-grain or 1-row (allowlisted in
  * PlanSpec.singlePartitionAllowlist with their exact counts).
  */
object EsDslQueries {
  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column): Column = c.cast("decimal(28,10)")
  private def dec38(c: Column): Column = c.cast("decimal(38,10)")
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)

  private val D = "CAST(CAST(%s AS VARCHAR) AS DOUBLE)"
  private def dd(e: String) = D.format(e)

  // ---------------------------------------------------------------------
  // Derived geo kernel — one Scala source of truth renders BOTH engines'
  // expressions, so the trees cannot drift.
  // ---------------------------------------------------------------------

  /** lat ∈ [−80, 80), lon ∈ [−180, 180) on a 10⁻⁴-degree grid, from the
    * seeded portable hash of the user key. `userSql` must render the
    * user id as a string identically in both engines (BIGINT → digits).
    */
  private def latSql(h15: String => String, userSql: String): String =
    s"CAST(${h15(s"'lat:' || $userSql")} % 1600000 AS DOUBLE) / 10000.0 - 80.0"
  private def lonSql(h15: String => String, userSql: String): String =
    s"CAST(${h15(s"'lon:' || $userSql")} % 3600000 AS DOUBLE) / 10000.0 - 180.0"

  private val sparkH15: String => String =
    e => s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"
  private val duckH15: String => String =
    e => s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  /** The derived-coordinate map on ANY events-shaped frame — a pure
    * map, so it runs unchanged on a stream (StreamingSpec's geofence
    * dual relies on exactly that).
    */
  private[graft] def geoDerive(df: DataFrame): DataFrame =
    df.withColumn("lat",
        expr(latSql(sparkH15, "CAST(user_id AS STRING)")))
      .withColumn("lon",
        expr(lonSql(sparkH15, "CAST(user_id AS STRING)")))

  /** Geofence alerting: derive + bounding-box filter (the real-time
    * watch-zone pattern — rows inside the box are the alerts). Pure
    * map + filter: batch ≡ streaming by construction.
    */
  private[graft] def geoFence(latN: Double, latS: Double, lonW: Double,
      lonE: Double)(df: DataFrame): DataFrame =
    geoDerive(df).filter(col("lat") <= lit(latN) &&
      col("lat") >= lit(latS) && col("lon") >= lit(lonW) &&
      col("lon") <= lit(lonE))

  /** Events + derived (lat, lon) — a pure map over the scan. */
  private def geoEv(s: SparkSession, dir: String): DataFrame =
    geoDerive(ev(s, dir))

  /** DuckDB CTE producing the identical frame. */
  private val geoCte: String =
    s"""geo AS (
          SELECT *,
                 ${latSql(duckH15, "CAST(user_id AS VARCHAR)")} AS lat,
                 ${lonSql(duckH15, "CAST(user_id AS VARCHAR)")} AS lon
          FROM events)"""

  /** Geohash precision 3 (15 bits: 8 lon + 7 lat, interleaved lon-first,
    * then base32). Successive-bisection bits ≡ the binary expansion of
    * the normalized coordinate, so `floor(x · 2^bits)` yields them all
    * at once; validated against the published test vectors (u4p / ezs /
    * s00 / 6gk) in EsDslSpec. The hash-derived lat/lon and the bit
    * frames are STAGED (separate projections / CTE stages) so neither
    * engine re-inlines a non-cheap expression — the winnowing CSE
    * lesson applied at design time.
    */
  private[graft] val gxSql = "CAST(floor((lon + 180.0) / 360.0 * 256.0) AS BIGINT)"
  private[graft] val gySql = "CAST(floor((lat + 90.0) / 180.0 * 128.0) AS BIGINT)"
  private[graft] def interleaveSql(shr: (String, Int) => String): String = {
    val lonTerms = (0 to 7).map { j =>
      s"((${shr("__gx", 7 - j)} & 1) * ${1L << (14 - 2 * j)})"
    }
    val latTerms = (0 to 6).map { j =>
      s"((${shr("__gy", 6 - j)} & 1) * ${1L << (13 - 2 * j)})"
    }
    (lonTerms ++ latTerms).mkString(" + ")
  }
  private[graft] def ghashSql(shr: (String, Int) => String): String = {
    val b32 = "'0123456789bcdefghjkmnpqrstuvwxyz'"
    def ch(shift: Int) =
      s"substring($b32, CAST((${shr("__gg", shift)} & 31) AS INT) + 1, 1)"
    s"concat(${ch(10)}, ${ch(5)}, ${ch(0)})"
  }
  private[graft] val sparkShr: (String, Int) => String =
    (c, n) => s"shiftright($c, $n)"
  private val duckShr: (String, Int) => String =
    (c, n) => s"($c >> $n)"

  /** Web-Mercator tile key at zoom 4 (the ES geotile_grid bucket key
    * `z/x/y`); validated against the published tile vectors in
    * EsDslSpec. Only the DISCRETE tile ids are output, so the
    * tan/cos/ln ulp caveat above applies.
    */
  private[graft] val geotileSql: String = {
    val xt = "CAST(floor((lon + 180.0) / 360.0 * 16.0) AS BIGINT)"
    val yt = "CAST(floor((1.0 - ln(tan(lat * pi() / 180.0) + 1.0 / " +
      "cos(lat * pi() / 180.0)) / pi()) / 2.0 * 16.0) AS BIGINT)"
    s"concat('4/', CAST($xt AS STRING), '/', CAST($yt AS STRING))"
  }
  private[graft] val geotileSqlDuck: String =
    geotileSql.replace("AS STRING", "AS VARCHAR")

  /** Haversine km from the (0, 0) origin — shared tree, counts-only
    * consumers. R = 6371.0 km (the ES default earth radius).
    */
  private[graft] val distKmSql: String = {
    val latR = "(lat * pi() / 180.0)"
    val lonR = "(lon * pi() / 180.0)"
    s"2.0 * 6371.0 * asin(sqrt(" +
      s"sin($latR / 2.0) * sin($latR / 2.0) + " +
      s"cos($latR) * cos(0.0) * sin($lonR / 2.0) * sin($lonR / 2.0)))"
  }

  // ring edges (km) for es_geo_distance — ES `ranges` spelling
  private val Rings: Seq[(String, Option[Double], Option[Double])] = Seq(
    ("*-2500.0", None, Some(2500.0)),
    ("2500.0-5000.0", Some(2500.0), Some(5000.0)),
    ("5000.0-10000.0", Some(5000.0), Some(10000.0)),
    ("10000.0-*", Some(10000.0), None))

  // geo_bounding_box corners (top-left / bottom-right, ES spelling)
  private val BoxLatN = 60.0
  private val BoxLatS = 10.0
  private val BoxLonW = -30.0
  private val BoxLonE = 90.0

  val all: Map[String, Q] = Map(
    // ES bucket_script pipeline agg: per-day date_histogram with two
    // conditional sub-sums, then the script buckets_path ratio —
    // purchase_share = purchase_sum / total_sum, error_rate =
    // error_docs / doc_count. ONE conditional pass over the fact scan;
    // day-grain output frame.
    "es_bucket_script" -> ((s, dir) =>
      ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("doc_count"),
          sum(when(col("event_type") === "purchase", dec(col("value"))))
            .as("p_dec"),
          sum(dec(col("value"))).as("t_dec"),
          sum(when(col("event_type") === "error", lit(1L))
            .otherwise(lit(0L))).as("n_err"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("doc_count"),
          (col("p_dec").cast("double") / col("t_dec").cast("double"))
            .as("purchase_share"),
          (col("n_err").cast("double") / col("doc_count").cast("double"))
            .as("error_rate"))),

    // ES normalize pipeline agg (method: percent_of_sum AND
    // rescale_0_1) over a daily doc-count histogram. The normalizing
    // stats are ONE 1-row aggregate over the day-grain frame
    // (allowlisted) broadcast back — never a second fact pass.
    "es_normalize" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("doc_count"))
      val tot = perDay.agg(sum(col("doc_count")).as("total"),
        min(col("doc_count")).as("mn"), max(col("doc_count")).as("mx"))
      perDay.crossJoin(broadcast(tot))
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("doc_count"),
          (col("doc_count").cast("double") / col("total").cast("double")
            * lit(100.0)).as("pct_of_sum"),
          ((col("doc_count") - col("mn")).cast("double") /
            (col("mx") - col("mn")).cast("double")).as("rescaled"))
    }),

    // ES moving_percentiles pipeline agg: trailing-7-day (current + 6
    // lags) EXACT type-1 order statistics (ranks ⌈p·7⌉ → elements
    // 2/4/6) of the daily value sum — es_boxplot's integer-rank
    // discipline on es_moving_fn's explicit-lag window. DECIMAL lags
    // sort exactly; full windows only (ES emits nothing until the
    // window fills). Day-grain frame; one fact exchange + the pipeline
    // window (allowlisted).
    "es_moving_percentiles" -> ((s, dir) => {
      val perDay = ev(s, dir)
        .groupBy(to_date(col("ts")).as("d"))
        .agg(sum(dec(col("value"))).as("p0"))
      val w = Window.orderBy(col("d"))
      val lagged = (1 to 6).foldLeft(perDay) { (df, i) =>
        df.withColumn(s"p$i", lag(col("p0"), i).over(w))
      }
      val arr = array_sort(array((0 to 6).map(i => col(s"p$i")): _*))
      lagged.filter(col("p6").isNotNull)
        .withColumn("__s", arr)
        .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
          col("p0").cast("double").as("sum_value"),
          element_at(col("__s"), 2).cast("double").as("win_p25"),
          element_at(col("__s"), 4).cast("double").as("win_p50"),
          element_at(col("__s"), 6).cast("double").as("win_p75"))
    }),

    // ES variable_width_histogram (buckets: 3), deterministic analogue:
    // quantize to unit cells (value-domain-bounded — 211 occupied cells
    // at sf0.01, never row-grain), split at the 2 widest gaps between
    // occupied cells (ties to the lower cell), assign rows by the
    // boundary comparands from a 1-row conditional agg (allowlisted,
    // Q22 shape). Output: per-bucket count, exact min/max, mean.
    "es_variable_width_histogram" -> ((s, dir) => {
      val vals = ev(s, dir)
        .filter(col("event_type") === "purchase")
        .localCheckpoint(false) // cells + final assignment both read it
      val cells = vals
        .select(floor(col("value")).cast("long").as("c")).distinct()
      val w = Window.orderBy(col("c"))
      val gaps = cells
        .withColumn("gap", col("c") - lag(col("c"), 1).over(w))
        .filter(col("gap").isNotNull)
      val gw = Window.orderBy(col("gap").desc, col("c"))
      val bounds = gaps
        .withColumn("rk", row_number().over(gw))
        .filter(col("rk") <= 2)
        .agg(min(col("c")).cast("double").as("b1"),
          max(col("c")).cast("double").as("b2"))
      vals.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          when(col("value") < col("b1"), lit(0L))
            .when(col("value") < col("b2"), lit(1L)).otherwise(lit(2L)))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("doc_count"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          sum(dec(col("value"))).as("s_dec"))
        .select(col("bucket"), col("doc_count"), col("min_v"),
          col("max_v"),
          (col("s_dec").cast("double") / col("doc_count").cast("double"))
            .as("avg_v"))
    }),

    // ES ip_prefix agg (prefix_length: 8): IPv4 derived from the
    // portable user hash (same partsupp-style unlock as the geo
    // family), /8 subnet buckets with doc + distinct-user counts.
    // Pure integer arithmetic end-to-end; one fact exchange.
    "es_ip_prefix" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("__ip", expr(
          s"${sparkH15("'ip:' || CAST(user_id AS STRING)")} % 4294967296"))
        .groupBy(concat(expr("CAST(shiftright(__ip, 24) & 255 AS STRING)"),
          lit(".0.0.0/8")).as("subnet"))
        .agg(count(lit(1)).as("doc_count"),
          countDistinct(col("user_id")).as("n_users"),
          sum(dec(col("value"))).as("s_dec"))
        .select(col("subnet"), col("doc_count"), col("n_users"),
          col("s_dec").cast("double").as("sum_value"))),

    // ES string_stats agg over documents.text per source: count,
    // min/max/avg length, distinct characters, and the EXACT Rényi-2
    // collision kernel Σp² in place of Shannon entropy (header note).
    // The char explode is the honest per-character cost ES also pays;
    // both aggregates are map-side-combined equi-shuffles on
    // (source, char) then source.
    "es_string_stats" -> ((s, dir) => {
      val d = docs(s, dir).filter(col("text").isNotNull)
        .localCheckpoint(false) // length stats + char frame share it
      val lens = d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_vals"),
          min(length(col("text"))).cast("long").as("min_len"),
          max(length(col("text"))).cast("long").as("max_len"),
          sum(length(col("text")).cast("long")).as("len_sum"))
      val chars = d
        .select(col("source"), explode(split(col("text"), "")).as("ch"))
        .groupBy(col("source"), col("ch")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(countDistinct(col("ch")).as("distinct_chars"),
          sum(col("cnt")).as("n_chars"),
          sum(dec38(col("cnt") * col("cnt"))).as("sq_dec"))
      lens.join(chars, Seq("source"))
        .select(col("source"), col("n_vals"), col("min_len"),
          col("max_len"),
          (col("len_sum").cast("double") / col("n_vals").cast("double"))
            .as("avg_len"),
          col("distinct_chars"),
          (col("sq_dec").cast("double") /
            (col("n_chars").cast("double") * col("n_chars").cast("double")))
            .as("collision_prob"))
    }),

    // ES categorize_text agg: the deterministic core of the log-pattern
    // categorizer — lowercase, drop non-alphabetic tokens (ES's
    // categorizer discards numbers/punctuation as variable parts), key
    // each doc by its first 4 stable tokens, count per category. Top
    // 10 by doc_count (key asc ties); example = smallest doc_id.
    // One pure-map tokenize + one category-grain exchange.
    "es_categorize_text" -> ((s, dir) =>
      docs(s, dir).filter(col("text").isNotNull)
        .withColumn("category", array_join(
          slice(filter(split(lower(col("text")), "[^a-z]+"),
            x => x =!= ""), 1, 4), " "))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("doc_count"), min(col("doc_id")).as("example_doc"))
        .orderBy(col("doc_count").desc, col("category"))
        .limit(10)),

    // ES geohash_grid agg (precision: 3): bucket key = base32 geohash
    // cell of the derived point (pure-map kernel, bit-interleave
    // validated against published vectors), doc + distinct-user counts,
    // top 10 cells (doc_count desc, key asc). One fact exchange.
    "es_geohash_grid" -> ((s, dir) =>
      geoEv(s, dir)
        .withColumn("__gx", expr(gxSql))
        .withColumn("__gy", expr(gySql))
        .withColumn("__gg", expr(interleaveSql(sparkShr)))
        .withColumn("ghash", expr(ghashSql(sparkShr)))
        .groupBy(col("ghash"))
        .agg(count(lit(1)).as("doc_count"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("doc_count").desc, col("ghash"))
        .limit(10)),

    // ES geotile_grid agg (precision/zoom: 4): bucket key = 'z/x/y'
    // Web-Mercator tile of the derived point; same shape as
    // geohash_grid. Tile ids are discrete (ulp caveat in the header).
    "es_geotile_grid" -> ((s, dir) =>
      geoEv(s, dir)
        .withColumn("tile", expr(geotileSql))
        .groupBy(col("tile"))
        .agg(count(lit(1)).as("doc_count"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("doc_count").desc, col("tile"))
        .limit(10)),

    // ES geo_distance agg: haversine rings (ES default arc distance,
    // R = 6371 km) from the (0,0) origin — ring membership is the only
    // trig consumer (counts-only, header caveat), value sums exact
    // DECIMAL. Ring spine is the 4-literal ES ranges spelling.
    "es_geo_distance" -> ((s, dir) => {
      val d = geoEv(s, dir).withColumn("__km", expr(distKmSql))
      val ringCol = Rings.foldLeft(lit(null).cast("string")) {
        case (acc, (key, from, to)) =>
          val cond = (from, to) match {
            case (None, Some(t)) => col("__km") < lit(t)
            case (Some(f), Some(t)) =>
              col("__km") >= lit(f) && col("__km") < lit(t)
            case (Some(f), None) => col("__km") >= lit(f)
            case _ => lit(true)
          }
          when(cond && acc.isNull, lit(key)).otherwise(acc)
      }
      d.withColumn("ring", ringCol)
        .groupBy(col("ring"))
        .agg(count(lit(1)).as("doc_count"),
          countDistinct(col("user_id")).as("n_users"),
          sum(dec(col("value"))).as("s_dec"))
        .select(col("ring"), col("doc_count"), col("n_users"),
          col("s_dec").cast("double").as("sum_value"))
    }),

    // ES geo_bounds + geo_centroid aggs per event_type: exact min/max
    // corners and the DECIMAL-mean centroid of the derived points.
    // No trig anywhere — lat/lon are exact grid rationals.
    "es_geo_bounds" -> ((s, dir) =>
      geoEv(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("doc_count"),
          min(col("lat")).as("bottom"), max(col("lat")).as("top"),
          min(col("lon")).as("left"), max(col("lon")).as("right"),
          sum(dec(col("lat"))).as("slat"), sum(dec(col("lon"))).as("slon"))
        .select(col("event_type"), col("doc_count"), col("top"),
          col("left"), col("bottom"), col("right"),
          (col("slat").cast("double") / col("doc_count").cast("double"))
            .as("centroid_lat"),
          (col("slon").cast("double") / col("doc_count").cast("double"))
            .as("centroid_lon"))),

    // ES geo_bounding_box query + terms agg: events inside the
    // (60 N, 30 W) → (10 N, 90 E) box, counted per type. Comparisons
    // only — the filter prunes before the single type-grain exchange.
    "es_geo_bounding_box" -> ((s, dir) =>
      geoEv(s, dir)
        .filter(col("lat") <= lit(BoxLatN) && col("lat") >= lit(BoxLatS) &&
          col("lon") >= lit(BoxLonW) && col("lon") <= lit(BoxLonE))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("doc_count"),
          countDistinct(col("user_id")).as("n_users"))),

    // ES geo_line agg (group by user, sort: ts, size: 10): the ordered
    // movement track of the 5 most-active users (count desc, user asc).
    // Points render through the SAME %.4f fixed format in both engines
    // (the derived grid is exact 10⁻⁴ degrees, so the 4th decimal is
    // never a rounding tie); the per-user window is user-bounded and
    // the track assembly sorts by the explicit row number, never by
    // engine-dependent aggregation order.
    "es_geo_line" -> ((s, dir) => {
      val g = geoEv(s, dir)
        .withColumn("pt", concat(
          format_string("%.4f", col("lon")), lit(" "),
          format_string("%.4f", col("lat"))))
      val top = g.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"))
        .orderBy(col("n_points").desc, col("user_id")).limit(5)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      g.join(broadcast(top), Seq("user_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .groupBy(col("user_id"), col("n_points"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("rn"), col("pt")))),
          x => x.getField("pt")), " ").as("track"))
        .select(col("user_id"), col("n_points"), col("track"))
    }),

    // ES parent/child join field (has_child + children agg): orders are
    // the parents, lineitems the children — per parent bucket
    // (o_orderpriority), parent count, child doc_count, child revenue.
    // The one fact-fact equi-shuffle pair on the join key (the plan a
    // parent/child index also executes at merge time); priority-grain
    // rollup after.
    "es_children_agg" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .join(Tables.load(s, dir, "lineitem")
            .select(col("l_orderkey"),
              dec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .as("rev_dec")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_orderkey")).as("n_parents"),
          count(lit(1)).as("n_children"),
          sum(col("rev_dec")).as("s_dec"))
        .select(col("o_orderpriority"), col("n_parents"),
          col("n_children"),
          col("s_dec").cast("double").as("child_revenue")))
  )

  val oracles: Map[String, String] = Map(
    "es_bucket_script" ->
      s"""SELECT strftime(d, '%Y-%m-%d') AS day, doc_count,
            ${dd("p_dec")} / ${dd("t_dec")} AS purchase_share,
            CAST(n_err AS DOUBLE) / CAST(doc_count AS DOUBLE) AS error_rate
          FROM (
            SELECT CAST(ts AS DATE) AS d, count(*) AS doc_count,
                   sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(value AS DECIMAL(28,10)) END) AS p_dec,
                   sum(CAST(value AS DECIMAL(28,10))) AS t_dec,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     AS n_err
            FROM events GROUP BY 1)""",
    "es_normalize" ->
      """WITH per_day AS (
           SELECT CAST(ts AS DATE) AS d, count(*) AS doc_count
           FROM events GROUP BY 1),
         tot AS (SELECT sum(doc_count) AS total, min(doc_count) AS mn,
                        max(doc_count) AS mx FROM per_day)
         SELECT strftime(d, '%Y-%m-%d') AS day, doc_count,
                CAST(doc_count AS DOUBLE) / CAST(total AS DOUBLE) * 100.0
                  AS pct_of_sum,
                CAST(doc_count - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
                  AS rescaled
         FROM per_day CROSS JOIN tot""",
    "es_moving_percentiles" ->
      s"""WITH per_day AS (
            SELECT CAST(ts AS DATE) AS d,
                   sum(CAST(value AS DECIMAL(28,10))) AS p0
            FROM events GROUP BY 1),
          lagged AS (
            SELECT d, p0,
                   lag(p0, 1) OVER (ORDER BY d) AS p1,
                   lag(p0, 2) OVER (ORDER BY d) AS p2,
                   lag(p0, 3) OVER (ORDER BY d) AS p3,
                   lag(p0, 4) OVER (ORDER BY d) AS p4,
                   lag(p0, 5) OVER (ORDER BY d) AS p5,
                   lag(p0, 6) OVER (ORDER BY d) AS p6
            FROM per_day),
          srt AS (
            SELECT d, p0,
                   list_sort([p0, p1, p2, p3, p4, p5, p6]) AS l
            FROM lagged WHERE p6 IS NOT NULL)
          SELECT strftime(d, '%Y-%m-%d') AS day, ${dd("p0")} AS sum_value,
                 ${dd("l[2]")} AS win_p25, ${dd("l[4]")} AS win_p50,
                 ${dd("l[6]")} AS win_p75
          FROM srt""",
    "es_variable_width_histogram" ->
      s"""WITH vals AS (
            SELECT value FROM events WHERE event_type = 'purchase'),
          cells AS (
            SELECT DISTINCT CAST(floor(value) AS BIGINT) AS c FROM vals),
          gaps AS (
            SELECT c, c - lag(c, 1) OVER (ORDER BY c) AS gap FROM cells
            QUALIFY gap IS NOT NULL),
          top2 AS (
            SELECT c FROM gaps
            ORDER BY gap DESC, c LIMIT 2),
          bounds AS (
            SELECT CAST(min(c) AS DOUBLE) AS b1,
                   CAST(max(c) AS DOUBLE) AS b2 FROM top2)
          SELECT CAST(CASE WHEN value < b1 THEN 0
                      WHEN value < b2 THEN 1 ELSE 2 END AS BIGINT) AS bucket,
                 count(*) AS doc_count,
                 min(value) AS min_v, max(value) AS max_v,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} /
                   CAST(count(*) AS DOUBLE) AS avg_v
          FROM vals CROSS JOIN bounds GROUP BY 1""",
    "es_ip_prefix" ->
      s"""SELECT CAST((ip >> 24) & 255 AS VARCHAR) || '.0.0.0/8' AS subnet,
                 count(*) AS doc_count,
                 count(DISTINCT user_id) AS n_users,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} AS sum_value
          FROM (SELECT user_id, value,
                  ${duckH15("'ip:' || CAST(user_id AS VARCHAR)")}
                    % 4294967296 AS ip
                FROM events)
          GROUP BY 1""",
    "es_string_stats" ->
      s"""WITH d AS (SELECT source, text FROM documents
                     WHERE text IS NOT NULL),
          lens AS (
            SELECT source, count(*) AS n_vals,
                   min(length(text)) AS min_len,
                   max(length(text)) AS max_len,
                   sum(length(text)) AS len_sum
            FROM d GROUP BY 1),
          per_char AS (
            SELECT source, unnest(string_split(text, '')) AS ch FROM d),
          cc AS (
            SELECT source, ch, count(*) AS cnt FROM per_char GROUP BY 1, 2),
          chars AS (
            SELECT source, count(DISTINCT ch) AS distinct_chars,
                   sum(cnt) AS n_chars,
                   sum(CAST(cnt * cnt AS DECIMAL(38,10))) AS sq_dec
            FROM cc GROUP BY 1)
          SELECT l.source, l.n_vals, l.min_len, l.max_len,
                 CAST(l.len_sum AS DOUBLE) / CAST(l.n_vals AS DOUBLE)
                   AS avg_len,
                 c.distinct_chars,
                 ${dd("c.sq_dec")} /
                   (CAST(c.n_chars AS DOUBLE) * CAST(c.n_chars AS DOUBLE))
                   AS collision_prob
          FROM lens l JOIN chars c ON l.source = c.source""",
    "es_categorize_text" ->
      """SELECT category, count(*) AS doc_count,
                min(doc_id) AS example_doc
         FROM (
           SELECT doc_id, array_to_string(list_slice(
                    list_filter(regexp_split_to_array(lower(text),
                      '[^a-z]+'), x -> x <> ''), 1, 4), ' ') AS category
           FROM documents WHERE text IS NOT NULL)
         GROUP BY 1
         ORDER BY doc_count DESC, category LIMIT 10""",
    "es_geohash_grid" ->
      s"""WITH $geoCte,
          gxy AS (SELECT *, $gxSql AS __gx, $gySql AS __gy FROM geo),
          gg AS (SELECT *, ${interleaveSql(duckShr)} AS __gg FROM gxy)
          SELECT ${ghashSql(duckShr)} AS ghash,
                 count(*) AS doc_count,
                 count(DISTINCT user_id) AS n_users
          FROM gg GROUP BY 1
          ORDER BY doc_count DESC, ghash LIMIT 10""",
    "es_geotile_grid" ->
      s"""WITH $geoCte
          SELECT $geotileSqlDuck AS tile,
                 count(*) AS doc_count,
                 count(DISTINCT user_id) AS n_users
          FROM geo GROUP BY 1
          ORDER BY doc_count DESC, tile LIMIT 10""",
    "es_geo_distance" ->
      s"""WITH $geoCte,
          dk AS (SELECT *, $distKmSql AS km FROM geo)
          SELECT CASE WHEN km < 2500.0 THEN '*-2500.0'
                      WHEN km < 5000.0 THEN '2500.0-5000.0'
                      WHEN km < 10000.0 THEN '5000.0-10000.0'
                      ELSE '10000.0-*' END AS ring,
                 count(*) AS doc_count,
                 count(DISTINCT user_id) AS n_users,
                 ${dd("sum(CAST(value AS DECIMAL(28,10)))")} AS sum_value
          FROM dk GROUP BY 1""",
    "es_geo_bounds" ->
      s"""WITH $geoCte
          SELECT event_type, count(*) AS doc_count,
                 max(lat) AS top, min(lon) AS "left",
                 min(lat) AS bottom, max(lon) AS "right",
                 ${dd("sum(CAST(lat AS DECIMAL(28,10)))")} /
                   CAST(count(*) AS DOUBLE) AS centroid_lat,
                 ${dd("sum(CAST(lon AS DECIMAL(28,10)))")} /
                   CAST(count(*) AS DOUBLE) AS centroid_lon
          FROM geo GROUP BY 1""",
    "es_geo_bounding_box" ->
      s"""WITH $geoCte
          SELECT event_type, count(*) AS doc_count,
                 count(DISTINCT user_id) AS n_users
          FROM geo
          WHERE lat <= $BoxLatN AND lat >= $BoxLatS
            AND lon >= $BoxLonW AND lon <= $BoxLonE
          GROUP BY 1""",
    "es_geo_line" ->
      s"""WITH $geoCte,
          pts AS (
            SELECT user_id, ts, event_id,
                   printf('%.4f', lon) || ' ' || printf('%.4f', lat) AS pt
            FROM geo),
          top5 AS (
            SELECT user_id, count(*) AS n_points
            FROM pts GROUP BY 1
            ORDER BY n_points DESC, user_id LIMIT 5),
          ranked AS (
            SELECT p.user_id, t.n_points, p.pt,
                   row_number() OVER (PARTITION BY p.user_id
                     ORDER BY p.ts, p.event_id) AS rn
            FROM pts p JOIN top5 t ON p.user_id = t.user_id)
          SELECT user_id, n_points,
                 string_agg(pt, ' ' ORDER BY rn) AS track
          FROM ranked WHERE rn <= 10 GROUP BY 1, 2""",
    "es_children_agg" ->
      s"""SELECT o_orderpriority,
                 count(DISTINCT o_orderkey) AS n_parents,
                 count(*) AS n_children,
                 ${dd("sum(CAST(l_extendedprice * (1.0 - l_discount) " +
                   "AS DECIMAL(28,10)))")} AS child_revenue
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1"""
  )
}
