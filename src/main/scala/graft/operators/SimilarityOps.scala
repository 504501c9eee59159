package graft.operators

import graft.functions.PortableHash.h15
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`), for the `embeddings` table
  * (`vec_id, embedding[64], label`).
  *
  * Two paths, per the scale playbook:
  *  - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *    against the corpus, per-partition cosine, global top-k per query via
  *    window rank. Correctness anchor; O(|Q|·n) but embarrassingly
  *    parallel, zero corpus shuffle (queries broadcast).
  *  - [[srpTopK]]: the scale path — sign-random-projection LSH buckets
  *    (deterministic hyperplanes derived from the portable hash, so the
  *    oracle can recompute them); only same-bucket candidates are scored.
  *    Bucket join is an equi-join → shuffle on an 8-bit key; recall is
  *    tunable by `planes` and multi-probe unioning.
  */
object SimilarityOps {

  import DedupOps.{cosine, dot}

  /** Deterministic ±1 hyperplane component for (plane p, dimension j):
    * sign of a portable hash — reproducible in DuckDB, unlike an RNG.
    */
  private def planeSign(p: Int, j: Column): Column =
    when(h15(concat(lit(s"plane$p:"), j.cast("string")))
      .bitwiseAND(1) === 1, 1.0).otherwise(-1.0)

  /** SRP bucket id: bit p = sign(dot(v, plane_p)). `planes` bits.
    * Implemented as a fold over dimensions per plane — integer/± double
    * adds in fixed order, bit-exact in the oracle.
    */
  def srpBucket(v: Column, planes: Int, dim: Int): Column = {
    // per plane: dot(v, hyperplane) > 0
    val planeBits = (0 until planes).map { p =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)),
          (x, j) => x.cast("double") * planeSign(p, j)),
        lit(0.0), (acc, x) => acc + x)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planeBits.reduce(_ + _)
  }

  /** Exact cosine top-k: for each query vector (rows of `queries`), the k
    * nearest corpus rows by cosine, deterministic tiebreak on neighbor id.
    * `queries` is expected small → broadcast; the corpus is never shuffled,
    * the only wide op is the per-query top-k (window over ≤ n rows hash-
    * partitioned by query id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    val scored = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }

  /** SRP-LSH approximate top-k: score only corpus vectors in the query's
    * bucket. Same output shape as [[bruteForceTopK]]; approximate recall.
    */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 6, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bc = corpus.select(col("vec_id").as("neighbor_id"), col("embedding"),
      srpBucket(col("embedding"), planes, dim).as("bucket"))
    val bq = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      srpBucket(col("embedding"), planes, dim).as("bucket")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    bc.join(bq, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
  }
}
