package graft.queries

import graft.Tables
import graft.operators.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search queries over `embeddings`: exact brute-force cosine
  * top-k (correctness anchor) and SRP-LSH approximate top-k (the scale
  * path). The query set is the first 8 vectors — stands in for a
  * broadcast-able probe batch.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  private val K = 5
  private val NQ = 8
  // IVF centroid seeds: a fixed corpus subset, disjoint from the queries
  private val SEEDS = 100 until 108

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
  private def queriesOf(df: DataFrame): DataFrame =
    df.filter(col("vec_id") < NQ)

  val all: Map[String, Q] = Map(
    "sim_bruteforce_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilarityOps.bruteForceTopK(e, queriesOf(e), K)
    }),
    "sim_srp_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilarityOps.srpTopK(e, queriesOf(e), K, planes = 6)
    }),
    "sim_ivf_topk" -> ((s, dir) => {
      val e = embs(s, dir)
      SimilarityOps.ivfTopK(e, queriesOf(e), K, seedIds = SEEDS.map(_.toLong))
    }),

    // Lloyd-trained centroid summary (graft.operators.KMeansOps): the IVF
    // training step. Deterministic (exact-decimal means, seeded init) but
    // k-means has no tractable SQL dual — the driver records the weaker
    // rows-only check; KMeansSpec asserts convergence, determinism, and
    // blob recovery.
    "sim_kmeans_cells" -> ((s, dir) => {
      val cents = graft.operators.KMeansOps.lloyd(
        embs(s, dir), "vec_id", "embedding",
        seedIds = SEEDS.map(_.toLong), iters = 2)
      cents.select(col("cell").cast("long").as("cell"),
        size(col("centroid")).cast("long").as("dim"))
    })
  )

  import Duck._

  val oracles: Map[String, String] = Map(
    "sim_bruteforce_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                     FROM embeddings WHERE vec_id < $NQ),
          scored AS (SELECT query_id, e.vec_id AS neighbor_id,
                       ${cosine("qe", "e.embedding")} AS cos
                     FROM q CROSS JOIN embeddings e
                     WHERE e.vec_id <> query_id)
          SELECT query_id, neighbor_id, rank, cos FROM (
            SELECT query_id, neighbor_id, cos,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= $K""",
    "sim_srp_topk" ->
      s"""WITH g AS (SELECT vec_id, embedding,
                  ${srpBucket("embedding", 6, 64)} AS bucket
                FROM embeddings),
          q AS (SELECT vec_id AS query_id, embedding AS qe, bucket
                FROM g WHERE vec_id < $NQ),
          scored AS (SELECT query_id, g.vec_id AS neighbor_id,
                       ${cosine("qe", "g.embedding")} AS cos
                     FROM q JOIN g USING (bucket)
                     WHERE g.vec_id <> query_id)
          SELECT query_id, neighbor_id, rank, cos FROM (
            SELECT query_id, neighbor_id, cos,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= $K""",
    "sim_ivf_topk" -> {
      val seedList = (100 until 108).mkString("(", ", ", ")")
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
                         FROM embeddings WHERE vec_id IN $seedList),
          asn AS (SELECT vec_id, embedding, cent_id,
                    ${cosine("embedding", "cent_emb")} AS cscore
                  FROM embeddings CROSS JOIN cents),
          cell AS (SELECT vec_id, embedding, cent_id AS cell FROM (
                     SELECT vec_id, embedding, cent_id, cscore,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY cscore DESC, cent_id) AS crn
                     FROM asn) WHERE crn = 1),
          q AS (SELECT vec_id AS query_id, embedding AS q_emb, cell
                FROM cell WHERE vec_id < $NQ),
          scored AS (SELECT query_id, c.vec_id AS neighbor_id,
                       ${cosine("q_emb", "c.embedding")} AS cos
                     FROM q JOIN cell c USING (cell)
                     WHERE c.vec_id <> query_id)
          SELECT query_id, neighbor_id, rank, cos FROM (
            SELECT query_id, neighbor_id, cos,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
          WHERE rank <= $K"""
    }
  )
}
