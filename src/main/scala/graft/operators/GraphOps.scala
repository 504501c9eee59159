package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * canonical cluster-resolution step after near-duplicate PAIR generation
  * (MinHash/SimHash/cosine buckets emit pairs; dedup needs per-document
  * cluster ids so one canonical doc per component survives). Absent from
  * the reference (no joins at all, SURVEY.md §2.1) and from Spark SQL's
  * built-ins (GraphX is RDD-based and unmaintained).
  *
  * Algorithm: iterated min-label propagation. Every node starts labeled
  * with itself; each round, a node's label becomes the minimum label in
  * its closed neighborhood (its own plus all neighbors'). The per-round
  * plan is one shuffle (groupBy dst over the symmetrized edge list joined
  * to current labels) plus a broadcast-free equi-join back to labels —
  * hash-partitioned on node id throughout, no driver-side state, spill-
  * friendly, AQE-skewable: exactly the shape that survives a 100 TB edge
  * list. Convergence needs at most `diameter` rounds; near-dup graphs are
  * tiny star/chain clusters (diameter ≤ ~6), and the loop exits as soon
  * as a round changes nothing. The convergence probe is a single
  * `sum(label)` aggregate — labels only ever decrease, so an unchanged
  * sum IS a fixpoint (no expensive frame diff). Each round's result is
  * `localCheckpoint`ed to truncate lineage (iterative plans otherwise
  * grow exponentially in the optimizer).
  *
  * For graphs with pathological diameters (long chains at billions of
  * edges) the production-grade refinement is alternating large-star /
  * small-star (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14), which converges in O(log n) rounds with the same
  * per-round shuffle shape; min-label propagation is chosen here for its
  * determinism-obvious single primitive.
  */
object GraphOps {

  /** @param edges two-column DataFrame of undirected edges
    * @return (id, component) — every node that appears in `edges`, labeled
    *         with the smallest node id reachable from it
    */
  def connectedComponents(
      edges: DataFrame, a: String = "a", b: String = "b",
      maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint(false)
    var labels = sym.select(col("src").as("id"))
      .distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(false)
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("label"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0) // null ⇔ empty edge list
    }
    var converged = false
    var iter = 0
    var prevSum = labelSum(labels)
    while (!converged && iter < maxIter) {
      // min over the closed neighborhood: neighbors' labels ∪ own label
      val nbrMin = sym
        .join(labels, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, col("id") === col("dst"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("label"))
        .localCheckpoint(false)
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
