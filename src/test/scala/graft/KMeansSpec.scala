package graft

import graft.operators.{DedupOps, KMeansOps}
import org.apache.spark.sql.functions._

/** Lloyd k-means: blob recovery, determinism, empty-cell survival. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directional blobs in 4-d (cosine geometry):
  // base axes e1/e2/e3 with small fixed perturbations
  private def blobs = {
    def around(axis: Int, wiggle: Double, id: Long) = {
      val v = Array.fill(4)(wiggle)
      v(axis) = 1.0
      (id, v.toSeq)
    }
    val pts = (0 until 30).map { i =>
      val axis = i % 3
      around(axis, 0.05 * ((i % 5) + 1), i.toLong)
    }
    pts.toDF("vec_id", "embedding")
  }

  test("recovers the three blobs and is deterministic") {
    // seeds 0,1,2 are one point from each blob (i%3 cycles the axis)
    val c1 = KMeansOps.lloyd(blobs, "vec_id", "embedding",
      seedIds = Seq(0L, 1L, 2L), iters = 3)
    val c2 = KMeansOps.lloyd(blobs, "vec_id", "embedding",
      seedIds = Seq(0L, 1L, 2L), iters = 3)
    val r1 = c1.as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    val r2 = c2.as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(r1 == r2, "two identical runs must be bit-identical")
    assert(r1.size == 3)
    // each centroid is dominated by a distinct axis
    val domAxes = r1.map { case (_, v) => v.indexOf(v.max) }.toSet
    assert(domAxes == Set(0, 1, 2), s"centroids $r1")
  }

  test("every point lands nearest its own blob centroid") {
    val cents = KMeansOps.lloyd(blobs, "vec_id", "embedding",
      seedIds = Seq(0L, 1L, 2L), iters = 3)
      .as[(Int, Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val pts = blobs.as[(Long, Seq[Double])].collect()
    pts.foreach { case (id, v) =>
      val best = cents.maxBy { case (_, c) => cos(v, c) }._1
      assert(best == (id % 3 + 1).toInt,
        s"point $id assigned to $best, expected ${id % 3 + 1}")
    }
  }

  test("a seed far from all points keeps its centroid (empty cell)") {
    val pts = ((0 until 10).map(i => (i.toLong, Seq(1.0, 0.02 * i, 0.0))) :+
      (99L, Seq(-1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    // seed 99's cell goes empty once every point prefers seed 0's side —
    // but 99 itself stays in its own cell, so instead drop 99 from the
    // corpus after seeding is impossible; assert the run just completes
    // with 2 cells and finite centroids
    val cents = KMeansOps.lloyd(pts, "vec_id", "embedding",
      seedIds = Seq(0L, 99L), iters = 2)
      .as[(Int, Seq[Double])].collect()
    assert(cents.length == 2)
    assert(cents.forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
  }

  test("zero-norm vector and centroid survive training (no ANSI throw)") {
    // a zero vector both IN the corpus and AS a seed: every cosine
    // against it is NaN, which must rank first (ORDER BY DESC parity)
    // instead of throwing DIVIDE_BY_ZERO under ANSI or being missed by
    // codegen array_position — the trap trainPqBooks' 16-dim slices can
    // hit on sparse embeddings
    val pts = Seq(
      0L -> Array(1.0, 0.0), 1L -> Array(0.9, 0.1),
      2L -> Array(0.0, 0.0), 3L -> Array(0.1, 1.0)
    ).toDF("vec_id", "embedding")
    val cents = KMeansOps.lloyd(pts, "vec_id", "embedding",
      seedIds = Seq(0L, 2L), iters = 2)
      .as[(Int, Seq[Double])].collect()
    assert(cents.length == 2) // completed, one row per cell
  }

  test("farthestFirst: picks the most orthogonal vector each round") {
    // seed (1,0); the near-opposite (-1,0.1) is farthest (cos ≈ −0.995),
    // then the orthogonal (0,1) (max-cos to {seed, pick2} ≈ 0.0995);
    // the near-duplicate (0.9,0.44) is never picked
    val pts = Seq(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.9, 0.44),
      3L -> Seq(0.0, 1.0), 4L -> Seq(-1.0, 0.1)
    ).toDF("vec_id", "embedding")
    val got = graft.operators.SimilarityOps.farthestFirst(pts, 3, 1L)
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 1L), (2L, 4L),
      (3L, 3L)))
    assert(got(0)._3.isEmpty)
    assert(math.abs(got(1)._3.get - (-0.995)) < 0.01)
    assert(math.abs(got(2)._3.get - 0.0995) < 0.01)
  }

  test("dbscan: core, border, isolated-core, and noise hand case") {
    // unit vectors at 0°/10°/20°/50°/90°/97° in one cell, eps = 0.98
    // (cos 10° ≈ .985 passes, cos 20° ≈ .940 fails), minPts = 2:
    //  - 2 sees both 1 and 3 → the only core; no core-core edge →
    //    singleton cluster 2
    //  - 1 and 3 are sub-minPts WITH a core neighbor → border, cluster 2
    //  - 5 and 6 are mutual neighbors but NEITHER is core → both noise
    //    (the pair-below-minPts trap a naive "has a neighbor" tag hits)
    //  - 4 has no neighbor at all → noise
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r))
    }
    val pts = Seq(1L -> at(0), 2L -> at(10), 3L -> at(20), 4L -> at(50),
      5L -> at(90), 6L -> at(97)).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0))).toDF("cell", "centroid")
    val got = DedupOps.dbscan(cents, eps = 0.98, minPts = 2)(pts)
      .as[(Long, Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      1L -> ((1L, "border", Some(2L))),
      2L -> ((2L, "core", Some(2L))),
      3L -> ((1L, "border", Some(2L))),
      4L -> ((0L, "noise", None)),
      5L -> ((1L, "noise", None)),
      6L -> ((1L, "noise", None))))
  }

  test("silhouette: separated clusters score high, boundary scores 0") {
    // centroids on the axes; members at ±5° of their own axis score
    // near 1; a 45° vector is equidistant (a = b) and scores exactly 0
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r), math.sin(r))
    }
    val pts = Seq(1L -> at(5), 2L -> at(-5), 3L -> at(85), 4L -> at(95),
      5L -> at(45)).toDF("vec_id", "embedding")
    val cents = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("cell", "centroid")
    val got = graft.operators.SimilarityOps.silhouette(cents)(pts)
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(1L, 2L))
    val (n1, mean1, min1, _) = got(1L)
    val (n2, _, min2, _) = got(2L)
    assert(n1 == 3L && n2 == 2L) // 45° ties to the smaller cell id
    assert(min2 > 0.8 && got(2L)._4 <= 1.0)
    assert(math.abs(min1) < 1e-9) // the tied vector scores exactly 0
    assert(mean1 > 0.5 && mean1 < 1.0)
  }
}
