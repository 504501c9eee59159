package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval join — all pairs (probe, anchor) with equal key and
  * `anchor.t < probe.t <= anchor.t + window`: "events that follow an
  * anchor within the window". The classic attribution/follow-up operator
  * (purchase → next clicks, alert → subsequent errors); the reference has
  * no joins at all (SURVEY.md §2.1) and Spark executes a raw
  * `a.t < p.t AND p.t <= a.t + w` condition as a broadcast-nested-loop (or
  * an inequality sort-merge with per-row rescans) — quadratic per key and
  * a non-starter at 100 TB.
  *
  * Formulation: quantize time into buckets of exactly `window` width. A
  * probe at bucket b can only match anchors in buckets b and b-1, so the
  * ANCHOR side is exploded to its own bucket and the next one (bounded 2×
  * duplication of the smaller side), the join becomes an EQUI-join on
  * (key, bucket) — one hash shuffle, AQE-skew-splittable, no range scan —
  * and the exact half-open band predicate filters the candidates.
  */
object BandJoin {

  /** @param probe   rows looking backward for their anchor ("follow-ups")
    * @param anchor  rows opening a window forward in time
    * @param window  band width in the time columns' unit (exclusive start,
    *                inclusive end: anchorT < probeT <= anchorT + window)
    * @return one row per matching pair: all probe columns plus the anchor
    *         columns renamed `anchor_<name>`
    */
  def bandJoin(
      probe: DataFrame, probeKey: String, probeTime: String,
      anchor: DataFrame, anchorKey: String, anchorTime: String,
      window: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val a = anchor.columns.foldLeft(anchor) { (df, c) =>
      df.withColumnRenamed(c, s"anchor_$c")
    }
    val ak = col(s"anchor_$anchorKey")
    val at = col(s"anchor_$anchorTime")
    // exact long floor-division (pmod-correct for negative times; the
    // subtraction makes the numerator a multiple of window, so the double
    // division is exact for |t| < 2^53) — a float `floor(t / w)` could
    // misround at bucket boundaries and silently drop true pairs
    def bucket(t: org.apache.spark.sql.Column) =
      ((t - pmod(t, lit(window))) / window).cast("long")
    val exploded = a.withColumn("__b",
      explode(array(bucket(at), bucket(at) + 1)))
    probe
      .join(exploded,
        col(probeKey) === ak &&
          bucket(col(probeTime)) === col("__b") &&
          col(probeTime) > at && col(probeTime) <= at + window)
      .drop("__b")
  }
}
