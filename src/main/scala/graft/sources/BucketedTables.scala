package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table writes — the co-located-join primitive for repeated
  * large-fact joins at 100 TB: two tables bucketed (and sorted) on the
  * same key with the same bucket count sort-merge join with ZERO
  * exchanges, because the on-disk layout IS the shuffle, paid once at
  * write time. This is the standing answer to
  * "this fact-fact join shuffles both sides every night": bucket both
  * once, join free forever after (BucketedJoinSpec pins the plan).
  *
  * Bucket count is a layout contract: pick it for the TARGET scale
  * (files-per-bucket grow with data, bucket count cannot change without
  * a rewrite), and keep it a multiple of the cluster's parallelism so
  * every core gets whole buckets.
  */
object BucketedTables {

  /** Write `df` as an external parquet table bucketed+sorted on `key`.
    * External (explicit `path`) so the data lives where the caller
    * says; the catalog entry carries the bucket spec Spark's planner
    * needs to elide the exchange.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    // repartition on the key with numPartitions == buckets uses the
    // same murmur3-pmod assignment as the bucket spec, so every write
    // task owns exactly one bucket → ONE sorted file per bucket
    // (without it each task writes a file into every bucket it sees:
    // tasks×buckets small files). Note Spark ≥3 still inserts a
    // partition-LOCAL sort at read (bucket-file order is only trusted
    // behind the legacy outputOrdering flag); the exchange is what the
    // layout eliminates.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
