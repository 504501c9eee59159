package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale validation: replicate the sf0.1 testdata ~10× with
  * shifted keys (a deterministic synthetic "sf1"), run the standing-r8
  * bench basket at BOTH scales in one JVM, and record the per-query
  * growth ratio to `SCALE_PROBE.json`. The point is to EXECUTE the
  * 100 TB design arguments the plan pins make (bucketed candidates,
  * broadcast model state, partition-pruned probes) one decade up, not
  * just argue them: a query whose cost is linear in the data shows a
  * ratio near the 10× replication factor (often below it — fixed plan/
  * JVM overheads amortize); a superlinear operator (an accidental
  * all-pairs join, a driver-side collect growing with the corpus)
  * shows up as a ratio far above it and names itself.
  *
  * Replication preserves the star schema's referential structure:
  * every growing table's keys shift by copy·2^40 (facts and their
  * dimension FKs shift together, so joins neither break nor collapse),
  * while the fixed dims (region/nation) copy as-is — exactly how a
  * bigger TPC-H SF behaves. Document text gets a per-copy suffix token
  * so the corpus is near-duplicated rather than degenerate-identical
  * (the dedup operators then exercise their REAL candidate paths:
  * every doc gains 9 cross-copy near-dups).
  *
  * Usage: `sbt "runMain graft.ScaleProbe"` (env: SPARK_GRAFT_SF_DIR
  * base dir, SPARK_GRAFT_SCALE_DIR replica dir, SPARK_GRAFT_SCALE_COPIES,
  * SPARK_GRAFT_SCALE_PASSES base/scaled pass counts "2,1").
  */
object ScaleProbe {

  private val Off = 1L << 40

  /** Key columns that shift per copy, per table. */
  private val shifted: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val fixedDims = Seq("region", "nation")

  /** Replicate one table `copies`× with per-copy key shifts: a single
    * broadcast cross join against the copy numbers — one pass over the
    * base data, no driver loop. The output is repartitioned so the
    * replica has a PARALLEL file layout: the base files are single
    * row groups, and writing the 10× copy through their partitioning
    * would produce one giant single-task file per table — every scan
    * of the replica would then serialize on one core, an artifact of
    * replica construction, not a property of the engine (real 100 TB
    * inputs arrive as many files).
    *
    * Corpus-growth fidelity: a real corpus 10× the size does NOT turn
    * every document into a 10-member near-duplicate cluster — duplicate
    * DENSITY stays roughly constant while volume grows, and family
    * SIZE stays bounded while family COUNT grows. So only 1 in 5 base
    * docs joins a near-dup family, families are capped at 10 members
    * (one per copy within a 10-copy group), and the rest get a
    * key-dependent ~50% token rewrite that reads as genuinely new text
    * to shingle- and token-level sketches alike. The first probe
    * iteration near-dup'd EVERYTHING (36-77× at 10×); the first
    * 100-copy attempt let families span all 100 copies (C(100,2) pairs
    * per family, 204 s minhash) — both quadratic growth in cluster
    * size, i.e. artifacts of the replica, not the plans. Embeddings
    * get the same split: exact twins within a family group, jittered
    * across groups and for the non-family rest.
    */
  private def replicate(spark: SparkSession, baseDir: String,
      outDir: String, table: String, copies: Int): Unit = {
    val base = spark.read.parquet(s"$baseDir/$table.parquet")
    val cdf = broadcast(
      spark.range(0, copies).select(col("id").as("__copy")))
    val shiftedCols = base.columns.map { c =>
      if (shifted(table).contains(c))
        (col(c) + col("__copy") * lit(Off)).as(c)
      else if (table == "documents" && c == "text") {
        // Family GROUP: copies 0-9 are group 0, 10-19 group 1, … Family
        // SIZE must stay constant as copy count grows (a 100× corpus
        // has 10× MORE near-dup families of the same size, not 10×
        // BIGGER ones — the 100-copy probe's first attempt kept one
        // family per tagged doc spanning all copies, and minhash pair
        // volume went quadratic again: C(100,2) per family, 204 s for a
        // 0.9 s query). Same-group members share a group-keyed salt and
        // differ only in the copy suffix → near-dups of each other;
        // different groups read as distinct docs.
        val group = (col("__copy") / 10).cast("long")
        // REWRITE a key-dependent ~50% of tokens (hash-selected, so the
        // rewritten positions differ per key too). Token count is
        // preserved and cross-key token overlap drops to ~25% —
        // distinct-document territory for token-level sketches
        // (simhash) as well as shingle-level ones. (Insertion-salting
        // left copies ~80% token-identical to each other and simhash
        // correctly called them all near-dups.)
        def salt(key: Column): Column =
          array_join(transform(split(col("text"), "\\s+"), t =>
            when(pmod(hash(t, key), lit(2)) === 0,
              concat(t, lit("x"), key)).otherwise(t)), " ")
        when(col("__copy") === 0, col("text"))
          .otherwise(when(col("doc_id") % 5 === 0,
            // near-dup family member: group-keyed salt (identity for
            // group 0, so copies 1-9 stay near-dups of the intact
            // copy-0 original) + a distinct per-copy tail suffix
            concat(when(group === 0, col("text")).otherwise(salt(group)),
              lit(" copytag"), col("__copy")))
          .otherwise(salt(col("__copy"))))
          .as(c)
      }
      else if (table == "documents" && c == "n_chars")
        // keep the metadata honest for the salted copies
        lit(null).as("__nchars_recompute")
      else if (table == "embeddings" && c == "embedding") {
        // same family-group discipline as documents: exact twins only
        // WITHIN a 10-copy group (group 0 = the originals), a
        // group-keyed jitter across groups, a copy-keyed jitter for
        // the non-family 4-in-5
        val jitterKey =
          when(col("vec_id") % 5 === 0, (col("__copy") / 10).cast("long"))
            .otherwise(col("__copy"))
        when(jitterKey === 0, col("embedding"))
          .otherwise(transform(col("embedding"), (x, i) =>
            (x + ((pmod(jitterKey * 31 + i * 7, lit(11)) - lit(5))
              .cast("float") * lit(0.013f))).cast("float")))
          .as(c)
      }
      else col(c)
    }
    val rep = base.crossJoin(cdf).select(shiftedCols.toIndexedSeq: _*)
    val out =
      if (table == "documents")
        rep.withColumn("n_chars", length(col("text")).cast("long"))
          .drop("__nchars_recompute")
          .select(base.columns.map(col).toIndexedSeq: _*)
      else rep
    out.repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
  }

  def buildScaledDir(spark: SparkSession, baseDir: String,
      outDir: String, copies: Int): Unit = {
    fixedDims.foreach { t =>
      spark.read.parquet(s"$baseDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    shifted.keys.toSeq.sorted.foreach { t =>
      replicate(spark, baseDir, outDir, t, copies)
    }
  }

  /** Touch EVERY table (raw scan + the memoized spread loaders) before
    * measuring, so first-touch I/O and the one-time spread
    * materialization are charged to warm-up, not to whichever query
    * happens to read a table first — the first probe iteration charged
    * the replica's whole cold customer+orders read to
    * anti_join_customers (28.7 s for a 2.6 s query).
    */
  private def warm(spark: SparkSession, dir: String): Unit =
    try {
      Tables.names.foreach { t =>
        spark.read.parquet(s"$dir/$t.parquet").count()
      }
      SparkEntry.queries("entry_pipeline")(spark, dir).count()
      Tables.events(spark, dir).count()
      Tables.documents(spark, dir).count()
      Tables.embeddings(spark, dir).count()
      Tables.lineitemSpread(spark, dir).count()
    } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val baseDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/root/repo/target/scale-sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    // two passes at BOTH scales: pass 1 of each still absorbs residual
    // JIT/allocator ramp, the min is the measurement
    val Array(basePasses, scaledPasses) =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "2,2")
        .split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietBenignErrors()

    if (!new java.io.File(s"$outDir/lineitem.parquet").exists()) {
      System.err.println(s"[scale] building ${copies}x replica at $outDir")
      buildScaledDir(spark, baseDir, outDir, copies)
    }
    val baseRows = spark.read.parquet(s"$baseDir/lineitem.parquet").count()
    val scaledRows = spark.read.parquet(s"$outDir/lineitem.parquet").count()

    // hang insurance: a query past this budget is cancelled via its
    // job group and recorded as an explicit TIMEOUT error — the probe
    // NAMES a pathological query instead of silently stalling on it
    // (the pre-guardrail 100× knn join sat 20+ min on one query)
    val timeoutSec =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_TIMEOUT", "600").toLong
    // Probe basket: ALL registered queries by default — the r8 pin left
    // the post-r8 families (mm_*, newer corpus_*, sim_pca_power,
    // sim_dbscan, …) with plan-audit arguments but no measured ratio at
    // any scale ("no silent caps"). `r8`/`r5` keep the frozen sets
    // available for continuity comparisons against older artifacts.
    val names = (sys.env.getOrElse("SPARK_GRAFT_SCALE_SET", "all") match {
      case "r8" => Bench.standingSetR8
      case "r5" => Bench.standingSet
      // names:a,b,c — an explicit subset, for DELTA probes: re-measure
      // just the queries a post-probe fix touched against the SAME
      // replica, with the full probe machinery (passes, plan audit,
      // rechecks), instead of either re-running 3+ hours or leaving
      // the new numbers in prose
      case s if s.startsWith("names:") =>
        val want = s.stripPrefix("names:").split(",")
          .map(_.trim).filter(_.nonEmpty).toSet
        val missing = want -- SparkEntry.queries.keySet
        require(missing.isEmpty,
          s"SPARK_GRAFT_SCALE_SET names not registered: " +
            missing.toSeq.sorted.mkString(","))
        want
      case _ => SparkEntry.queries.keySet
    }).toSeq.sorted
    val errors = scala.collection.mutable.Map.empty[String, String]
    def timedCount(name: String, dir: String): Unit = {
      val group = s"probe-$name"
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      // job groups are THREAD-local: set it on the thread that submits
      // the jobs, cancel by group name from this one
      val f = Future {
        spark.sparkContext.setJobGroup(group, name, true)
        try SparkEntry.queries(name)(spark, dir).count()
        finally spark.sparkContext.clearJobGroup()
      }
      try Await.result(f, timeoutSec.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(group)
          errors(s"$name@$dir") = s"TIMEOUT > $timeoutSec s (cancelled)"
      }
    }
    def run(dir: String, passes: Int): Map[String, Double] = {
      warm(spark, dir)
      val samples =
        scala.collection.mutable.Map.empty[String, List[Double]]
      for (p <- 1 to passes; name <- names) {
        val t0 = System.nanoTime()
        try timedCount(name, dir)
        catch {
          case e: Throwable =>
            errors(s"$name@$dir") =
              e.toString.replaceAll("[\"\\\\\n\r\t]", " ").take(160)
        }
        val t = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[scale] $dir $p/$passes $name%-28s $t%8.3f s")
        samples(name) = samples.getOrElse(name, Nil) :+ t
      }
      names.map(n => n -> samples(n).min).toMap
    }
    val base = run(baseDir, basePasses)
    // release the base-scale spread checkpoints before measuring the
    // replica — dead blocks from 160+ base queries otherwise squeeze
    // the scaled pass into GC thrash (the first probe iteration's
    // scaled numbers ran 3-30× over their clean-JVM times)
    Tables.dropSpread(baseDir)
    System.gc()
    val scaled = run(outDir, scaledPasses)

    // plan-shape audit at BOTH scales: the ratios prove runtime, this
    // proves the scaled runs executed the SAME plans — exchange/join
    // node counts per query, with any drift (a broadcast degrading to
    // SMJ past the threshold, a new exchange, a cartesian appearing)
    // named in the artifact instead of hiding inside a ratio
    def planCounts(name: String, dir: String): (Int, Int, Int) = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.executedPlan // force planning
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      def n(node: String) =
        ("""\(\d+\) """ + node).r.findAllIn(p).length
      (n("Exchange"),
        Seq("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
          "BroadcastNestedLoopJoin").map(n).sum,
        n("CartesianProduct"))
    }
    val planDrift = names.flatMap { n =>
      try {
        val b = planCounts(n, baseDir)
        val s = planCounts(n, outDir)
        if (b != s)
          Some(n -> s"base(exch,join,cart)=$b scaled=$s")
        else None
      } catch { case e: Throwable =>
        Some(n -> ("PLANAUDIT " + e.toString
          .replaceAll("[\"\\\\\n\r\t]", " ").take(80)))
      }
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val perQuery = names.map { n =>
      val r = scaled(n) / math.max(base(n), 1e-9)
      n -> (base(n), scaled(n), r)
    }
    val ratios = perQuery.map(_._2._3).sorted
    val median = ratios(ratios.length / 2)

    // Self-adjudicating throttle recheck (r12 verdict ask #4): any query
    // whose growth ratio lands >3× the median — two rounds running, every
    // such outlier turned out to be the host's CPU-throttle window, which
    // both in-probe passes can share — is re-measured in a FRESH forked
    // JVM (same classpath/add-opens/heap as this one, minutes later by
    // construction), and BOTH numbers land in the artifact so no prose
    // adjudication is needed. Sub-second scaled times are exempt: at that
    // magnitude a big ratio is fixed-overhead noise, not a throttle
    // artifact worth a JVM fork. SPARK_GRAFT_SCALE_RECHECK=off disables.
    val recheckOn =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_RECHECK", "on") != "off"
    // forked-JVM measurement shared with Bench's round-close rechecks
    def cleanJvmWall(name: String, dir: String): Option[Double] =
      CleanFork.wall(name, dir, cpus, timeoutSec)
    // A fork reading SLOWER than in-probe contradicts the throttle
    // hypothesis the recheck exists to test — every confirmed case so
    // far was the FORK landing in the throttle window (r14:
    // dedup_minhash_lsh forked 107.6 s vs 27.2 in-probe while a
    // neighboring fork ran 1.5× FASTER than in-probe). Such a
    // contradictory reading gets up to ATTEMPTS-1 more forks (each
    // fork's ~2-min startup is the spacing); noise only adds time, so
    // min across attempts remains the defensible estimate.
    val attempts = sys.env
      .getOrElse("SPARK_GRAFT_SCALE_RECHECK_ATTEMPTS", "2").toInt
    // SPARK_GRAFT_SCALE_RECHECK_NAMES=a,b forces a clean-JVM recheck
    // for the named queries even when their ratio is unremarkable —
    // for watch-listed operators whose artifact entry must carry an
    // independently measured number, not only the in-probe one
    val forceRecheck: Set[String] =
      sys.env.get("SPARK_GRAFT_SCALE_RECHECK_NAMES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(Set.empty)
    val rechecks: Map[String, (Double, Double)] =
      if (!recheckOn) Map.empty
      else perQuery.collect {
        case (n, (b, s, r))
            if (r > 3 * median && s >= 1.0) || forceRecheck(n) =>
          // name the true trigger: a forced recheck with an
          // unremarkable ratio must not log a false ratio claim
          if (r > 3 * median && s >= 1.0)
            System.err.println(f"[scale] recheck $n (ratio $r%.2f > " +
              f"3x median $median%.2f) in a clean JVM")
          else
            System.err.println(f"[scale] recheck $n (forced by " +
              f"SPARK_GRAFT_SCALE_RECHECK_NAMES; ratio $r%.2f " +
              f"unremarkable) in a clean JVM")
          cleanJvmWall(n, outDir).map { w1 =>
            var w = w1
            var att = 1
            while (att < attempts && w >= s) {
              System.err.println(f"[scale] recheck $n fork read " +
                f"$w%.3f s >= in-probe ${s}%.3f s — one spaced retry")
              cleanJvmWall(n, outDir).foreach(w2 => w = math.min(w, w2))
              att += 1
            }
            System.err.println(
              f"[scale] recheck $n clean-JVM wall $w%.3f s " +
                f"(in-probe ${s}%.3f s)")
            n -> (w, w / math.max(b, 1e-9))
          }
      }.flatten.toMap
    val json = new StringBuilder
    json ++= "{\"base_dir\":\"" + baseDir + "\",\"scale_dir\":\"" +
      outDir + "\",\"copies\":" + copies +
      ",\"base_lineitem_rows\":" + baseRows +
      ",\"scaled_lineitem_rows\":" + scaledRows +
      ",\"base_passes\":" + basePasses +
      ",\"scaled_passes\":" + scaledPasses +
      ",\"base_total\":" + num(base.values.sum) +
      ",\"scaled_total\":" + num(scaled.values.sum) +
      ",\"total_ratio\":" + num(scaled.values.sum / base.values.sum) +
      ",\"median_ratio\":" + num(median) +
      ",\"errors\":{" + errors.toSeq.sorted.map { case (k, v) =>
        "\"" + k + "\":\"" + v + "\"" }.mkString(",") + "}" +
      ",\"plan_drift\":{" + planDrift.sortBy(_._1).map { case (k, v) =>
        "\"" + k + "\":\"" + v + "\"" }.mkString(",") + "}" +
      ",\"queries\":{"
    json ++= perQuery.map { case (n, (b, s, r)) =>
      "\"" + n + "\":{\"base\":" + num(b) + ",\"scaled\":" + num(s) +
        ",\"ratio\":" + num(r) +
        rechecks.get(n).map { case (w, rc) =>
          // ratio_best is the no-prose adjudicator: every run (in-probe
          // min-of-2, fork min-of-2) executes the same code on the same
          // data and noise only ADDS time, so min across all of them is
          // the defensible point estimate. clean << in-probe ⇒ throttle
          // confirmed; clean ≥ in-probe ⇒ the in-probe number stands
          // (fork paid a throttle window or an unshared memoized
          // component).
          ",\"recheck\":{\"scaled_clean\":" + num(w) +
            ",\"ratio_clean\":" + num(rc) +
            ",\"ratio_best\":" + num(math.min(s, w) /
              math.max(b, 1e-9)) + "}"
        }.getOrElse("") + "}"
    }.mkString(",")
    json ++= "}}"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "SCALE_PROBE.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (json.toString + "\n").getBytes("UTF-8"))
    System.err.println(s"[scale] wrote $outFile")
    spark.stop()
    println(json.toString)
  }
}
