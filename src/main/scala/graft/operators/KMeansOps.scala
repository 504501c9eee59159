package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the centroid
  * TRAINING step whose output feeds [[SimilarityOps.ivfTopK]] (which takes
  * deterministic seed centroids so its query stays oracle-checkable; a
  * production IVF index trains these instead). Absent from the reference
  * (SURVEY.md §2.1: no aggregation at all).
  *
  * Scale shape per iteration:
  *  - ASSIGNMENT is a pure map: the k centroids are model state (k×dim
  *    doubles), carried to executors as literal arrays; each row scores k
  *    codegen'd dot products ([[graft.functions.VectorExprs]]) and takes
  *    the argmax via a k-element array — no crossJoin row amplification,
  *    no per-row shuffle, no window.
  *  - UPDATE is ONE shuffle: posexplode to (cell, dim, value), partial
  *    map-side sums, final per-(cell, dim) mean. k×dim result rows.
  *  - The k-row centroid table is collected to the driver between
  *    iterations — that is model state (kilobytes), not data; the corpus
  *    itself is only ever scanned, never shuffled.
  *
  * Determinism: per-dimension sums go through DECIMAL(38,10) (exact,
  * order- and partitioning-independent) with ONE double division at the
  * end; cosine ties break to the lowest centroid index (array_position
  * returns the first maximum). Two runs on any cluster layout produce
  * bit-identical centroids.
  */
object KMeansOps {

  import DedupOps.{dot, norm}

  /** @param seedIds corpus `idCol` values whose vectors seed the centroids
    *                (deterministic initialization, same convention as
    *                [[SimilarityOps.ivfTopK]])
    * @return (cell, centroid: array<double>) — `cell` is the 1-based
    *         centroid index, stable across iterations
    */
  def lloyd(corpus: DataFrame, idCol: String, vecCol: String,
      seedIds: Seq[Long], iters: Int): DataFrame = {
    val spark = corpus.sparkSession
    var cents: Seq[(Int, Seq[Double])] = corpus
      .filter(col(idCol).isInCollection(seedIds))
      .orderBy(col(idCol))
      .select(col(vecCol).cast("array<double>"))
      .collect().toSeq
      .zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](0)) }

    for (_ <- 1 to iters)
      cents = step(corpus, vecCol, cents)
    toDF(spark, cents)
  }

  /** One Lloyd iteration: assign every row to its argmax-cosine centroid,
    * return the per-cell exact-decimal mean vectors (empty cells keep
    * their previous centroid).
    */
  private def step(corpus: DataFrame, vecCol: String,
      cents: Seq[(Int, Seq[Double])]): Seq[(Int, Seq[Double])] = {
    // zero norms (degenerate centroid or row — e.g. an all-zero PQ
    // subspace slice) are NaN explicitly: under ANSI mode the raw double
    // division THROWS instead of yielding NaN
    val scores = array(cents.map { case (_, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) lit(Double.NaN)
      else when(norm(col("__v")) === 0.0, lit(Double.NaN))
        .otherwise(dot(col("__v"), typedlit(v)) /
          (norm(col("__v")) * lit(n)))
    }: _*)
    // NaN must rank FIRST like ORDER BY s DESC (the oracle's replay) and
    // codegen array_position MISSES a NaN needle (Java NaN == NaN is
    // false), so NaN maps to +∞ before the argmax — same discipline as
    // SimilarityOps.assignHome.
    val safe = transform(col("__s"),
      s => when(isnan(s), lit(Double.PositiveInfinity)).otherwise(s))
    // two-stage select: __s holds the k dot products ONCE; CollapseProject
    // keeps the stages apart because __s is non-cheap and referenced twice
    val assigned = corpus
      .select(col(vecCol).as("__v"))
      .select(col("__v"), scores.as("__s"))
      .select(col("__v"),
        array_position(safe, array_max(safe)).cast("int")
          .as("__cell"))
    val means = assigned
      .select(col("__cell"), posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy(col("__cell"), col("__d"))
      .agg((sum(col("__x").cast("decimal(38,10)")).cast("double") /
        count(lit(1)).cast("double")).as("__m"))
      .groupBy(col("__cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("__d"), col("__m")))),
        e => e.getField("__m")).as("__c"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .toMap
    cents.map { case (cell, prev) => (cell, means.getOrElse(cell, prev)) }
  }

  private def toDF(spark: SparkSession,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import spark.implicits._
    cents.toDF("cell", "centroid")
  }
}
