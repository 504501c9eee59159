package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * base data, no driver loop.
    */
  private def replicate(spark: SparkSession, baseDir: String,
      outDir: String, table: String, copies: Int): Unit = {
    val base = spark.read.parquet(s"$baseDir/$table.parquet")
    val cdf = broadcast(
      spark.range(0, copies).select(col("id").as("__copy")))
    val shiftedCols = base.columns.map { c =>
      if (shifted(table).contains(c))
        (col(c) + col("__copy") * lit(Off)).as(c)
      else if (table == "documents" && c == "text")
        // near-dup, not identical: dedup exercises real candidate paths
        when(col("__copy") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" copytag"), col("__copy")))
          .as(c)
      else col(c)
    }
    base.crossJoin(cdf).select(shiftedCols.toIndexedSeq: _*)
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

  private def warm(spark: SparkSession, dir: String): Unit =
    try {
      SparkEntry.queries("entry_pipeline")(spark, dir).count()
      Tables.events(spark, dir).count()
      Tables.documents(spark, dir).count()
      Tables.embeddings(spark, dir).count()
    } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val baseDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/root/repo/target/scale-sf1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val Array(basePasses, scaledPasses) =
      sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "2,1")
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

    val names = Bench.standingSetR8.toSeq.sorted
    val errors = scala.collection.mutable.Map.empty[String, String]
    def run(dir: String, passes: Int): Map[String, Double] = {
      warm(spark, dir)
      val samples =
        scala.collection.mutable.Map.empty[String, List[Double]]
      for (p <- 1 to passes; name <- names) {
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, dir).count()
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
    val scaled = run(outDir, scaledPasses)

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val perQuery = names.map { n =>
      val r = scaled(n) / math.max(base(n), 1e-9)
      n -> (base(n), scaled(n), r)
    }
    val ratios = perQuery.map(_._2._3).sorted
    val median = ratios(ratios.length / 2)
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
      ",\"queries\":{"
    json ++= perQuery.map { case (n, (b, s, r)) =>
      "\"" + n + "\":{\"base\":" + num(b) + ",\"scaled\":" + num(s) +
        ",\"ratio\":" + num(r) + "}"
    }.mkString(",")
    json ++= "}}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("SCALE_PROBE.json"),
      (json.toString + "\n").getBytes("UTF-8"))
    System.err.println("[scale] wrote SCALE_PROBE.json")
    spark.stop()
    println(json.toString)
  }
}
