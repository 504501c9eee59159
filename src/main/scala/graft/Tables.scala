package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * At cluster scale these would be partitioned external tables; the API is
  * kept to plain parquet reads so Catalyst's pushdown/pruning applies
  * unimpeded (scan nodes show PushedFilters/ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The driver's test parquet files are written as a single row group, so
    * a scan gets exactly ONE task no matter the cluster size — every
    * CPU-heavy narrow stage (JSON encode/decode, shingling, hashing)
    * would serialize on one core. Spread the hot tables across the
    * default parallelism up front (a ~MB-scale shuffle, trivial).
    *
    * The lazy localCheckpoint truncates lineage at the repartition:
    * without it, Catalyst pushes query predicates below the new Exchange
    * into the single-task scan stage — for the injector queries that
    * re-materializes the whole JSON encode+decode up to 3× per row on one
    * core (measured 10-100× slowdowns). With the barrier, all query
    * compute runs post-shuffle across every core with common-subexpression
    * elimination intact. Local-harness concern only: a real deployment's
    * sources arrive pre-partitioned (Kafka partitions, many files) and
    * early predicate pushdown at a parallel scan is exactly what you want.
    */
  private def spread(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(false)

  /** Memoized spread tables, keyed by (session, dir, table). Without this,
    * every one of the ~46 registered queries re-shuffles and re-persists
    * its input inside one Verify/Bench JVM — dozens of live checkpointed
    * copies of the same table, enough storage-memory pressure to throw the
    * whole run into GC thrash (and a flood of stale-accumulator ERRORs as
    * the ContextCleaner races the stragglers). One materialization per
    * table is also simply what a warm table cache does on a real cluster.
    */
  private val spreadCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def cachedSpread(spark: SparkSession, dir: String, name: String)(
      mk: => DataFrame): DataFrame =
    spreadCache.getOrElseUpdate((spark, dir, name), spread(spark, mk))

  /** Release one dir's memoized spread tables (the ScaleProbe hook:
    * after the base-scale passes, the base checkpoints are dead weight —
    * dropping the references lets the ContextCleaner reclaim the blocks
    * before the scaled passes measure).
    */
  def dropSpread(dir: String): Unit =
    spreadCache.keys.filter(_._2 == dir).foreach(spreadCache.remove)

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects
    * outright — read as long nanos via spark.sql.legacy.parquet.nanosAsLong
    * and truncate with integer division, no double-mantissa loss) and plain
    * TIMESTAMP(MICROS) (read natively). Branch on the decoded type so both
    * generations load identically; downstream comparisons are at ms
    * precision (the reference's own unit).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    cachedSpread(spark, dir, "events") {
      val raw = load(spark, dir, "events")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              org.apache.spark.sql.functions.expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          // NTZ parquet (isAdjustedToUTC=false). Sessions pin UTC, so the
          // cast is wall-clock-preserving and matches DuckDB's naive read;
          // downstream code (unix_millis, window()) needs TIMESTAMP.
          raw.withColumn("ts",
            raw("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    cachedSpread(spark, dir, "documents")(load(spark, dir, "documents"))
  /** Spread lineitem for CPU-heavy whole-table aggregates (the wide
    * decimal moment sums of es_matrix_stats serialize on the single
    * row-group scan otherwise). TPC-H queries deliberately keep the
    * RAW load — their predicate pushdown into the scan is plan-pinned
    * and is what a parallel row-group scan wants at scale.
    */
  def lineitemSpread(spark: SparkSession, dir: String): DataFrame =
    cachedSpread(spark, dir, "lineitem")(load(spark, dir, "lineitem"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    cachedSpread(spark, dir, "embeddings")(load(spark, dir, "embeddings"))
}
