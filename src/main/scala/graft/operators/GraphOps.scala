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
  * Two interchangeable algorithms behind one API, both pure DataFrame
  * plans — hash-partitioned on node id, no driver-side state, spill-
  * friendly, AQE-skewable:
  *
  *  - `minlabel` (default): iterated min-label propagation. Every node
  *    starts labeled with itself; each round a node's label becomes the
  *    minimum over its closed neighborhood. One shuffle per round,
  *    converges in `diameter` rounds — the right choice for near-dup
  *    graphs (tiny star/chain clusters, diameter ≤ ~6).
  *  - `star`: alternating large-star / small-star contraction (Kiveris
  *    et al., "Connected Components in MapReduce and Beyond", SoCC'14).
  *    Each round rewires edges toward local minima, so component trees
  *    flatten multiplicatively: O(log n) rounds regardless of diameter —
  *    the scale path for pathological chains in billion-edge graphs.
  *
  * Both converge to the identical labeling (component = min reachable
  * id); `GraphOpsSpec` property-tests them equal on random graphs.
  * Convergence probes are exact: label/edge-hash sums aggregate through
  * DECIMAL(38,0), so a 2^64 wrap can never fake a fixpoint. Exhausting
  * `maxIter` without reaching the fixpoint throws — a partially-merged
  * labeling that LOOKS complete is the one failure mode a dedup pipeline
  * cannot detect downstream. Each round's result is `localCheckpoint`ed
  * to truncate lineage (iterative plans otherwise grow exponentially in
  * the optimizer).
  */
object GraphOps {

  /** @param edges two-column DataFrame of undirected edges
    * @param algorithm "minlabel" (O(diameter) rounds, 1 shuffle/round) or
    *                  "star" (Kiveris large-star/small-star, O(log n)
    *                  rounds)
    * @return (id, component) — every node that appears in `edges`, labeled
    *         with the smallest node id reachable from it
    * @throws IllegalStateException if `maxIter` rounds pass without
    *         reaching the fixpoint (the result would be silently wrong)
    */
  def connectedComponents(
      edges: DataFrame, a: String = "a", b: String = "b",
      maxIter: Int = 50, algorithm: String = "minlabel"): DataFrame =
    algorithm match {
      case "minlabel" => minLabel(edges, a, b, maxIter)
      case "star" => largeSmallStar(edges, a, b, maxIter)
      case other => throw new IllegalArgumentException(
        s"unknown connected-components algorithm $other")
    }

  /** Exact sum probe: labels only ever decrease (minlabel) / edge targets
    * only ever decrease (star), so an unchanged DECIMAL(38,0) sum IS a
    * fixpoint — no expensive frame diff, and no 64-bit wrap collision.
    */
  private def decSum(df: DataFrame, expr: org.apache.spark.sql.Column) = {
    val r = df.agg(sum(expr.cast("decimal(38,0)"))).head()
    if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
  }

  private def notConverged(algorithm: String, maxIter: Int): Nothing =
    throw new IllegalStateException(
      s"connectedComponents($algorithm) did not reach its fixpoint in " +
        s"$maxIter rounds — raise maxIter (result would be partially " +
        "merged components)")

  // ------------------------------------------------- min-label propagation

  private def minLabel(edges: DataFrame, a: String, b: String,
      maxIter: Int): DataFrame = {
    // NOTE (r16, measured): a keyed-checkpoint variant (repartition by
    // src + AQE-off checkpoint so hash(src) survives into every round,
    // making the round join exchange-free) was tried and REGRESSED the
    // bench 1.7-2.8× across the CC consumers: the per-round exchanges
    // it removes are exactly where AQE's partition coalescing adapts
    // task counts to the live frame sizes, and pinning the layout pins
    // 32 near-empty sort/join tasks per round at verify scale. The
    // per-round exchange is edge-grain and AQE-coalesced — the
    // scale-adaptive choice — so sym stays a plain checkpoint.
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint(false)
    var labels = sym.select(col("src").as("id"))
      .distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint(false)
    var converged = false
    var iter = 0
    var prevSum = decSum(labels, col("label"))
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
      val nextSum = decSum(next, col("label"))
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    if (!converged) notConverged("minlabel", maxIter)
    labels.select(col("id"), col("label").as("component"))
  }

  // ---------------------------------------- large-star/small-star (SoCC'14)

  /** One large-star round: symmetrize, then for each node u with
    * neighborhood N(u) and m = min(N(u) ∪ u), rewire every LARGER
    * neighbor to m: emit (v, m) for v ∈ N(u), v > u.
    */
  private def largeStar(p: DataFrame): DataFrame = {
    val sym = p.union(p.select(col("v").as("u"), col("u").as("v"))).distinct()
    val mins = sym.groupBy(col("u"))
      .agg(least(min(col("v")), first(col("u"))).as("m"))
    sym.join(mins, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** One small-star round: orient every edge (larger → smaller), then for
    * each node u with smaller-neighborhood N(u) and m = min(N(u) ∪ u),
    * link every member of N(u) ∪ {u} except m itself to m.
    */
  private def smallStar(p: DataFrame): DataFrame = {
    val oriented = p.select(
      greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v")).distinct()
    val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    val withM = oriented.join(mins, Seq("u"))
    withM.filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .union(withM.select(col("u"), col("m").as("v")))
      .distinct()
  }

  private def largeSmallStar(edges: DataFrame, a: String, b: String,
      maxIter: Int): DataFrame = {
    val nodes = edges.select(col(a).as("id"))
      .union(edges.select(col(b).as("id")))
      .distinct()
      .localCheckpoint(false)
    var p = edges.select(col(a).as("u"), col(b).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    def probe(df: DataFrame) =
      (df.count(), decSum(df, xxhash64(col("u"), col("v"))))
    var converged = false
    var iter = 0
    var prev = probe(p)
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(p)).localCheckpoint(false)
      val sig = probe(next)
      converged = sig == prev
      prev = sig
      p = next
      iter += 1
    }
    if (!converged) notConverged("star", maxIter)
    // converged p is a star forest: (child, root). Roots and isolated
    // nodes (self-edges only) label themselves.
    nodes.join(p, nodes("id") === p("u"), "left_outer")
      .select(col("id"), coalesce(col("v"), col("id")).as("component"))
  }

  /** PageRank over a DIRECTED edge list in EXACT integer fixed-point —
    * ranks live in units of 1/`scale`, damping is the rational 17/20
    * (0.85), and every step is Long multiply / integer `div` / Long
    * sum, so the result is bit-identical at any partitioning, addition
    * order, or engine (no IEEE accumulation anywhere). The fixed-point
    * trades exact mass conservation for determinism: each `div` floors,
    * and dangling nodes (no out-edges) leak their mass rather than
    * redistributing it — both standard simplifications, both replayed
    * identically by the oracle. Scale: the per-iteration shape is the
    * Pregel one — edges join ranks on src (one shuffle), contributions
    * aggregate on dst (one shuffle); the (src, dst, deg) frame is
    * materialized ONCE and reused by every iteration, and `iters` is a
    * fixed small constant so the unrolled plan stays shallow. The only
    * driver value is n (one Long).
    *
    * @param edges    (src, dst) directed edges
    * @param vertices one `id` column — ALL vertices, including isolated
    * @param iters    fixed iteration count (unrolled; keep small)
    * @param inEdgeComplete caller-asserted precondition: `vertices` is
    *                 EXACTLY the distinct `dst` set of `edges` (every
    *                 vertex has ≥1 in-edge, no in-edge-only strays).
    *                 Holds for any symmetrized edge list whose vertex
    *                 set is derived from the edges (text_textrank).
    *                 When true, the per-round vertex restore join is
    *                 provably the identity — contrib's key set IS the
    *                 vertex set and `coalesce(c, 0)` never fires — so
    *                 each round drops to contrib-join + one aggregate:
    *                 one shuffle exchange per round instead of two plus
    *                 two SMJ sorts (guide §2.4; the restore join
    *                 re-exchanged + re-sorted the SAME checkpointed
    *                 vertex frame every round). Arithmetic and row set
    *                 are bit-identical by the precondition; default
    *                 false keeps the general contract (graph_pagerank's
    *                 kNN graph HAS vertices nobody points at).
    * @return (id, rank_fp) with rank_fp ≈ rank · scale
    */
  def pageRank(edges: DataFrame, vertices: DataFrame, iters: Int,
      scale: Long = 1000000000000L,
      inEdgeComplete: Boolean = false): DataFrame = {
    // the vertex frame is read by EVERY iteration's restore join (plus
    // init) — materialize once or a derived frame (a distinct over the
    // edge list, say) re-runs its shuffle `iters + 1` times
    val verts = DedupOps.materialize(vertices.select(col("id")))
    val n = verts.count()
    require(n > 0, "pageRank: empty vertex set")
    val init = scale / n
    val teleport = (3L * init) / 20L
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = DedupOps.materialize(edges.join(deg, Seq("src")))
    var ranks = verts.select(col("id"), lit(init).as("r"))
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("id"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      ranks =
        if (inEdgeComplete)
          contrib.select(col("dst").as("id"),
            (lit(teleport) + expr("(17 * c) div 20")).as("r"))
        else verts
          .join(contrib, verts("id") === contrib("dst"), "left_outer")
          .select(col("id"),
            (lit(teleport) +
              expr("(17 * coalesce(c, CAST(0 AS BIGINT))) div 20")).as("r"))
    }
    ranks.select(col("id"), col("r").as("rank_fp"))
  }

  /** Per-node triangle count and local clustering coefficient over a
    * directed edge list (symmetrized + deduped internally) — the
    * density view of a k-NN graph: high-coefficient vectors sit inside
    * tight near-duplicate neighborhoods. Triangles are counted EXACTLY
    * by ordered wedge closure (each triangle a<b<c found once as wedge
    * (a,b,c) closed by edge (b,c)); the coefficient is the integer
    * fixed-point `(2·scale·tri) div (deg·(deg−1))` — all Long, no IEEE,
    * bit-identical at any partitioning. Scale: wedge volume is
    * Σ deg_lo(v)² — bounded-degree graphs (k-NN: deg ≤ 2k) stay linear;
    * for power-law graphs order wedge pivots by degree instead of id
    * (not needed here, documented trade). Three shuffles: the wedge
    * self-join key, the closing (b,c) join, the per-node aggregate.
    */
  def triangleStats(edges: DataFrame, vertices: DataFrame,
      scale: Long = 1000000L): DataFrame = {
    val und = DedupOps.materialize(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct())
    val deg = und.select(col("lo").as("id"))
      .unionAll(und.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val e1 = und.select(col("lo").as("a"), col("hi").as("b"))
    val wedge = e1.join(e1.select(col("a"), col("b").as("c")), Seq("a"))
      .filter(col("b") < col("c"))
    val tri = wedge.join(
      und.select(col("lo").as("b"), col("hi").as("c")), Seq("b", "c"))
    val nodeTri = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
    vertices
      .join(deg, Seq("id"), "left_outer")
      .join(nodeTri, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(coalesce(col("deg"), lit(0L)) >= 2,
          expr(s"(${2 * scale} * coalesce(n_tri, CAST(0 AS BIGINT)))" +
            " div (deg * (deg - 1))"))
          .otherwise(lit(0L)).as("cc_fp"))
  }

  /** Link prediction over an undirected graph (symmetrized + deduped
    * internally): for every NON-adjacent pair sharing at least one
    * neighbor, the common-neighbor count and the Jaccard coefficient of
    * the two neighborhoods — the "which near-duplicates did the k-NN
    * cutoff miss" / "which docs should be related" ranking. Jaccard is
    * the integer fixed-point `(scale·cn) div (deg_a + deg_b − cn)` —
    * all Long, bit-identical at any partitioning. Candidate volume is
    * wedge-bounded (Σ deg(v)² over common-neighbor pivots — linear on
    * bounded-degree k-NN graphs, the same bound as triangleStats); the
    * existing-edge anti-join and the two degree joins all run on
    * node/edge-grain frames, and the top-N is a TakeOrdered (no global
    * sort exchange).
    */
  def linkPrediction(edges: DataFrame, topN: Int,
      scale: Long = 1000000L): DataFrame = {
    val und = DedupOps.materialize(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct())
    val sym = und.select(col("lo").as("id"), col("hi").as("nb"))
      .unionAll(und.select(col("hi").as("id"), col("lo").as("nb")))
    val deg = sym.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // wedge pivot: common neighbor id links (a, b), a < b
    val cn = sym.select(col("id"), col("nb").as("a"))
      .join(sym.select(col("id"), col("nb").as("b")), Seq("id"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    cn.join(und, cn("a") === und("lo") && cn("b") === und("hi"),
        "left_anti")
      .join(deg.select(col("id").as("a"), col("deg").as("deg_a")),
        Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("deg_b")),
        Seq("b"))
      .select(col("a"), col("b"), col("cn"), col("deg_a"), col("deg_b"),
        expr(s"($scale * cn) div (deg_a + deg_b - cn)").as("jaccard_fp"))
      .orderBy(col("jaccard_fp").desc, col("cn").desc, col("a"), col("b"))
      .limit(topN)
  }

  /** Per-cluster Newman modularity contribution over an undirected edge
    * list and a (id, component) cluster table: q_c = e_c/m − (d_c/2m)²
    * — the "are these clusters actually denser than chance" check on any
    * component resolution (near-dup CC, DBSCAN, semantic cells). e_c and
    * d_c are exact Long counts; the two divisions and the square are the
    * IDENTICAL double expression in both engines (each IEEE op exactly
    * rounded ⇒ bit-equal). m is a 1-row aggregate broadcast back
    * (allowlisted Q22 shape); everything else is edge/node-grain.
    * Nodes absent from `clusters` (never paired) are ignored — a
    * singleton contributes 0 to every term anyway.
    */
  def modularity(edges: DataFrame, clusters: DataFrame): DataFrame = {
    val und = DedupOps.materialize(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct())
    val m = und.agg(count(lit(1)).as("m"))
    val cl = clusters.select(col("id"), col("component"))
    val deg = und.select(col("lo").as("id"))
      .unionAll(und.select(col("hi").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val dTot = deg.join(cl, Seq("id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_tot"))
    val eIn = und
      .join(cl.select(col("id").as("lo"), col("component").as("ca")),
        Seq("lo"))
      .join(cl.select(col("id").as("hi"), col("component").as("cb")),
        Seq("hi"))
      .filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("component"))
      .agg(count(lit(1)).as("e_in"))
    val md = col("m").cast("double")
    val half = col("d_tot").cast("double") / (lit(2.0) * md)
    dTot.join(eIn, Seq("component"), "left_outer")
      .crossJoin(broadcast(m))
      .select(col("component"), col("n_nodes"), col("d_tot"),
        coalesce(col("e_in"), lit(0L)).as("e_in"),
        (coalesce(col("e_in"), lit(0L)).cast("double") / md -
          half * half).as("q_part"))
  }

  /** Fixed-round k-core peel: `iters` rounds of "recompute degrees
    * within the surviving set, drop nodes below `k`", then a final
    * recount — the density-core view (which vectors sit in mutually
    * dense neighborhoods, the complement of the rare/outlier tail).
    * Fixed `iters` rather than peel-to-convergence keeps the plan a
    * deterministic unrollable chain (the PageRank discipline — both
    * engines replay the same rounds); `in_core` therefore means
    * "survived `iters` peels", an upper bound on the true k-core that
    * the oracle replays exactly. Each round is one degree aggregate +
    * one semi-join pair, all hash-partitioned on node id; the alive
    * frame only shrinks.
    */
  def kCore(edges: DataFrame, vertices: DataFrame, k: Int, iters: Int)
      : DataFrame = {
    // Materialize the SYMMETRIZED frame (not just und): every peel
    // round (and the final recount) consumes sym, and the previous
    // shape — a checkpointed und with sym derived per use — re-ran the
    // union projection and fed 2× the rows through each round's first
    // exchange from scratch. und has no other consumer, so ONE
    // edge-grain checkpoint replaces the old one; the two union
    // branches share the distinct's exchange via reuse inside the
    // single materialization job. (A keyed variant — repartition(id) +
    // partitioning-preserving checkpoint, making the round join
    // exchange-free — measured 1.7× SLOWER at verify scale: it pins 32
    // near-empty tasks per round where AQE-coalesced exchanges adapt;
    // see minLabel's note.)
    val undPlan = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    val sym = DedupOps.materialize(
      undPlan.select(col("lo").as("id"), col("hi").as("nb"))
        .unionAll(undPlan.select(col("hi").as("id"), col("lo").as("nb"))))
    def degreesWithin(alive: DataFrame): DataFrame =
      sym.join(alive, Seq("id"))
        .join(alive.select(col("id").as("nb")), Seq("nb"))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var alive = vertices.select(col("id"))
    for (_ <- 1 to iters)
      alive = DedupOps.materialize(
        degreesWithin(alive).filter(col("deg") >= k).select(col("id")))
    val coreDeg = degreesWithin(alive)
    vertices.select(col("id"))
      .join(alive.withColumn("__in", lit(true)), Seq("id"), "left_outer")
      .join(coreDeg, Seq("id"), "left_outer")
      .select(col("id"),
        coalesce(col("__in"), lit(false)).as("in_core"),
        coalesce(when(col("__in"), col("deg")), lit(0L)).as("core_deg"))
  }

  /** Bounded-hop BFS from a literal seed set over the symmetrized
    * graph: every node reachable within `rounds` hops, with its exact
    * hop distance (min over paths — each node enters the frontier the
    * first round it is seen and never again). Fixed-round unrolling,
    * the PageRank/kCore discipline, so the oracle replays the identical
    * chain. Scale shape: each round is ONE frontier semi-join + ONE
    * visited anti-join, both hash-partitioned on node id; the frontier
    * is the only thing that moves, and the round count bounds the plan
    * depth (diameter-bounded traversals unroll the same way at any
    * corpus size). Unreached nodes are absent — the honest contract.
    */
  def bfsHops(edges: DataFrame, seeds: Seq[Long], rounds: Int)
      : DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // same discipline as kCore: one checkpoint of the symmetrized
    // frame — each round is its own job (the per-round
    // materializations), so without it every round re-derived sym
    // from the und checkpoint from scratch
    val undPlan = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .filter(col("lo") =!= col("hi")).distinct()
    val sym = DedupOps.materialize(
      undPlan.select(col("lo").as("src"), col("hi").as("dst"))
        .unionAll(undPlan.select(col("hi").as("src"), col("lo").as("dst"))))
    var visited = seeds.toDF("id").withColumn("dist", lit(0))
    var frontier = visited.select(col("id"))
    for (i <- 1 to rounds) {
      val nxt = DedupOps.materialize(
        sym.join(frontier.select(col("id").as("src")), Seq("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited.select(col("id")), Seq("id"), "left_anti")
          .withColumn("dist", lit(i)))
      visited = DedupOps.materialize(visited.unionByName(nxt))
      frontier = nxt.select(col("id"))
    }
    visited
  }
}
