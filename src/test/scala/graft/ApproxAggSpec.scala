package graft

import org.apache.spark.sql.functions._

/** Accuracy bounds for the sketch-based aggregates exposed by
  * `approx_user_stats` (no cross-engine oracle exists for sketches, so
  * the bounds are asserted here against exact values).
  */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within default rsd of exact") {
    val df = (0 until 20000).map(i => i % 1700).toDF("u")
    val approx = df.agg(approx_count_distinct($"u")).as[Long].head()
    assert(math.abs(approx - 1700L) <= 1700 * 0.05)
  }

  test("percentile_approx close to the exact median") {
    val df = (1 to 10001).map(_.toDouble).toDF("v")
    val m = df.agg(percentile_approx($"v", lit(0.5), lit(10000)))
      .as[Double].head()
    assert(math.abs(m - 5001.0) <= 10.0)
  }
}
