package graft

import graft.operators.GraphOps

/** Unit tests for distributed connected components (dedup cluster
  * resolution).
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("singleton pair, chain, and separate component") {
    // chain 1-2-3-4 takes several propagation rounds; 7-8 is disjoint
    val cc = components(Seq((3L, 4L), (1L, 2L), (2L, 3L), (7L, 8L)))
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L))
  }

  test("long chain converges past a single round (diameter > 1)") {
    val n = 40L
    val cc = components((1L until n).map(i => (i, i + 1)))
    assert(cc.size == n)
    assert(cc.values.forall(_ == 1L))
  }

  test("star and triangle merge through a bridge edge") {
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val bridged = components(star ++ tri :+ (13L, 22L))
    assert(bridged.values.toSet == Set(10L))
    val separate = components(star ++ tri)
    assert(separate.values.toSet == Set(10L, 20L))
  }

  test("empty edge list yields empty labeling") {
    assert(components(Seq.empty).isEmpty)
  }

  test("large-star/small-star equals min-label on random graphs (property)") {
    // brute-force union-find ground truth on the driver
    def bruteForce(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(50)
      val edges = Seq.fill(n) {
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)
      }.filter { case (a, b) => a != b }
      val expect = bruteForce(edges)
      val star = GraphOps.connectedComponents(edges.toDF("a", "b"),
        algorithm = "star").as[(Long, Long)].collect().toMap
      val minl = components(edges)
      assert(star == expect, s"trial $trial: star != union-find")
      assert(minl == expect, s"trial $trial: minlabel != union-find")
    }
  }

  test("star contraction handles a long chain in O(log n) rounds") {
    val n = 120L
    val edges = (1L until n).map(i => (i, i + 1))
    // diameter 120 would blow the round budget for propagation; star
    // contraction must finish well inside it
    val cc = GraphOps.connectedComponents(edges.toDF("a", "b"),
      maxIter = 15, algorithm = "star").as[(Long, Long)].collect().toMap
    assert(cc.size == n)
    assert(cc.values.forall(_ == 1L))
  }

  test("exhausting maxIter throws instead of returning partial merges") {
    val edges = (1L until 30L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      GraphOps.connectedComponents(edges.toDF("a", "b"), maxIter = 3)
    }
  }

  test("edge direction is irrelevant (undirected symmetrization)") {
    assert(components(Seq((5L, 2L), (2L, 9L))) ==
      Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("triangleStats: K4 has 3 triangles per node, coefficient 1") {
    // complete graph on {1,2,3,4} given as DIRECTED duplicated edges —
    // symmetrize/dedup must collapse them; deg 3, tri 3 per node,
    // cc = (2e6·3) div (3·2) = 1e6. Node 9 is isolated: all zeros.
    val dir = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val got = GraphOps.triangleStats(dir.toDF("src", "dst"),
      (Seq(9L) ++ (1L to 4L)).toDF("id"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    for (v <- 1L to 4L) assert(got(v) == ((3L, 3L, 1000000L)))
    assert(got(9L) == ((0L, 0L, 0L)))
  }

  test("pageRank: exact integer fixed-point, hand-checked one iteration") {
    // 1⇄2 plus 3→2: n=3, scale 1e6 → init 333333, teleport
    // (3·333333)/20 = 49999; after one iteration
    //   r(1) = 49999 + (17·333333)/20 = 333332   (in-mass from 2)
    //   r(2) = 49999 + (17·666666)/20 = 616665   (from 1 and 3)
    //   r(3) = 49999                             (no in-edges)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L).toDF("id")
    val got = GraphOps.pageRank(edges, verts, iters = 1,
      scale = 1000000L).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 333332L, 2L -> 616665L, 3L -> 49999L))
    // determinism across partitioning: 1-partition run is identical
    val got1 = GraphOps.pageRank(edges.coalesce(1), verts.coalesce(1),
      iters = 1, scale = 1000000L).as[(Long, Long)].collect().toMap
    assert(got1 == got)
  }

  test("pageRank: inEdgeComplete skip-restore-join path is identical " +
    "on a symmetrized graph (the text_textrank shape)") {
    // symmetrize a path 1-2-3-4 plus triangle 4-5-6: vertex set ==
    // distinct src == distinct dst, the inEdgeComplete precondition
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (4L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val verts = edges.select($"src".as("id")).distinct()
    for (iters <- Seq(1, 3, 10)) {
      val general = GraphOps.pageRank(edges, verts, iters,
        scale = 1000000000L).as[(Long, Long)].collect().toMap
      val fast = GraphOps.pageRank(edges, verts, iters,
        scale = 1000000000L, inEdgeComplete = true)
        .as[(Long, Long)].collect().toMap
      assert(fast == general, s"iters=$iters")
    }
  }

  test("linkPrediction: cycle + pendant, hand-checked Jaccard") {
    // square 1-2-3-4-1 with pendant 5 on node 1. Non-adjacent pairs
    // with a common neighbor: (2,4) cn={1,3} jac 2/2; (1,3) cn={2,4}
    // jac 2/3; (2,5),(4,5) cn={1} jac 1/2. (3,5) shares nothing.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.linkPrediction(edges, topN = 10)
      .select("a", "b", "cn", "jaccard_fp")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 4L, 2L, 1000000L),
      (1L, 3L, 2L, 666666L),
      (2L, 5L, 1L, 500000L),
      (4L, 5L, 1L, 500000L)))
    // topN truncates under the same total order
    val top2 = GraphOps.linkPrediction(edges, topN = 2)
      .select("a", "b").as[(Long, Long)].collect().toSeq
    assert(top2 == Seq((2L, 4L), (1L, 3L)))
  }

  test("modularity: two bridged triangles, hand-checked q") {
    // triangles {1,2,3} and {4,5,6} bridged by (3,4): m=7,
    // each cluster has e_in=3, d_tot=7 → q = 3/7 − (7/14)² each
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("id", "component")
    val got = GraphOps.modularity(edges, clusters)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val q = 3.0 / 7.0 - 0.25
    assert(got == Map(1L -> ((3L, 7L, 3L, q)), 4L -> ((3L, 7L, 3L, q))))
  }

  test("bfsHops: exact hop distances, round bound, unreached absent") {
    // path 1-2-3-4-5-6 plus disjoint 9-10; 4 rounds from seed 1
    // reach 1..5 at dist 0..4; 6 (5 hops) and 9/10 are absent. Edge
    // direction must not matter (symmetrized): edges point both ways.
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L), (5L, 6L),
      (9L, 10L)).toDF("src", "dst")
    val got = GraphOps.bfsHops(edges, Seq(1L), rounds = 4)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
    // two seeds: distance is min over seeds (6 now enters via seed 6)
    val two = GraphOps.bfsHops(edges, Seq(1L, 6L), rounds = 2)
      .as[(Long, Int)].collect().toMap
    assert(two == Map(1L -> 0, 6L -> 0, 2L -> 1, 5L -> 1,
      3L -> 2, 4L -> 2))
  }
}
