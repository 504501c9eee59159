package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed-artifact dual of ScaleProbeSpec's forced-engage recall
  * pins (r15 verdict ask #6): engage the sub-bucket guardrail
  * deliberately (cap far below the fixture's cell/bucket sizes) and
  * record what share of the EXACT near-dup pair set survives the
  * split, for both the trained-cell (SemDeDup) and SRP-bucket
  * geometries, into `RECALL.json` — so future rounds regress against a
  * measured number instead of re-reading test assertions. The same
  * computation as the spec (identical fixture, thresholds, caps);
  * collects are pair-set-sized on the sf0.01 fixture (tens of rows).
  *
  * Usage: `sbt "runMain graft.RecallProbe"` (env: SPARK_GRAFT_SF_DIR,
  * default /root/testdata/sf0.01; SPARK_GRAFT_RECALL_OUT, default
  * RECALL.json).
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val e = Tables.embeddings(spark, dir)
    val cents = graft.operators.KMeansOps.lloyd(e, "vec_id", "embedding",
      seedIds = (100L until 108L).toSeq, iters = 2)
    def cellPairs(cap: Long): Set[(Long, Long)] =
      graft.operators.DedupOps
        .semanticNearDupPairs(cents, threshold = 0.35, cellCap = cap)(e)
        .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val cellExact = cellPairs(Long.MaxValue)
    val cellCapped = cellPairs(16L)
    require(cellExact.nonEmpty, "fixture produced no near-dup pairs")
    require(cellCapped.subsetOf(cellExact),
      "sub-bucketing must only LOSE pairs, never invent them")

    def srpPairs(cap: Long): Set[(Long, Long)] =
      graft.operators.DedupOps.embeddingNearDupPairs(
        threshold = 0.35, planes = 4, bucketCap = cap)(e)
        .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val srpExact = srpPairs(Long.MaxValue)
    val srpCapped = srpPairs(8L)
    require(srpExact.nonEmpty && srpCapped.subsetOf(srpExact),
      "SRP path: empty exact set or invented pairs")

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val json =
      "{\"purpose\":\"forced-engage recall of the bucketizeCells " +
        "SRP-prefix split + hash backstop (ScaleProbeSpec's pins, " +
        "as a committed artifact)\"," +
        "\"fixture\":\"" + dir + "\"," +
        "\"cell\":{\"threshold\":0.35,\"cap\":16," +
        "\"exact_pairs\":" + cellExact.size +
        ",\"kept_pairs\":" + cellCapped.size +
        ",\"recall\":" + num(cellCapped.size.toDouble / cellExact.size) +
        ",\"history\":\"0.174 pre-r15 uniform hash split, 0.314 " +
        "r15 prefix-only, level-2 backstop since eb5a0e8\"}," +
        "\"srp\":{\"threshold\":0.35,\"planes\":4,\"cap\":8," +
        "\"exact_pairs\":" + srpExact.size +
        ",\"kept_pairs\":" + srpCapped.size +
        ",\"recall\":" + num(srpCapped.size.toDouble / srpExact.size) +
        ",\"history\":\"0.132 pre-r15 uniform hash split, 0.421 " +
        "r15 prefix-only, level-2 backstop since eb5a0e8\"}}"
    val out = sys.env.getOrElse("SPARK_GRAFT_RECALL_OUT", "RECALL.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    System.err.println(s"[recall] wrote $out")
    spark.stop()
    println(json)
  }
}
