package graft
import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <queryName> [sfDir]` prints the
  * formatted physical plan and wall-clock for one SparkEntry query —
  * the `.explain`-and-iterate loop the scale work relies on.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mk() = SparkEntry.queries(name)(spark, sfDir)
    mk().explain("formatted")
    // SPARK_GRAFT_EXPLAIN_PASSES=2 lets pass 1 absorb cold codegen/scan
    // and reports the min — the shape ScaleProbe's clean-JVM recheck
    // needs (a single cold pass can read 2-3x the steady-state time and
    // mis-adjudicate a borderline outlier). The final line is the only
    // one carrying "wall=", which is what the recheck parses.
    val passes =
      sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_PASSES", "1").toInt
    // Pass 0 (untimed, default on): warm the per-(session, dir) MEMOIZED
    // components — spread-table checkpoints, persisted index/fingerprint
    // store builds, decoded-media frames — exactly as ScaleProbe's
    // in-probe suite warms them (its warm() hook + 160 earlier queries).
    // Without this a clean-JVM fork charged the whole one-time store
    // build to the query it was adjudicating (dedup_minhash_lsh read
    // 53.6 s forked vs 31.1 s in-probe at 100× — the store, not the
    // query), so fork-vs-in-probe was never apples-to-apples. Timed
    // passes then construct the frame FRESH inside the timed region —
    // the same construct+execute shape Bench and the probe measure.
    if (sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_WARM", "1") != "0") {
      try {
        Tables.names.foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet").count()
        }
        Tables.events(spark, sfDir).count()
        Tables.documents(spark, sfDir).count()
        Tables.embeddings(spark, sfDir).count()
        Tables.lineitemSpread(spark, sfDir).count()
      } catch { case _: Throwable => () }
      mk().count()
    }
    var n = 0L
    val walls = (1 to passes).map { p =>
      val t0 = System.nanoTime()
      n = mk().count()
      val t = (System.nanoTime() - t0) / 1e9
      if (passes > 1) println(f"[explain] $name pass $p: $t%.2f s")
      t
    }
    println(f"[explain] $name rows=$n wall=${walls.min}%.2f s" +
      (if (passes > 1) s" (min of $passes)" else ""))
    spark.stop()
  }
}
