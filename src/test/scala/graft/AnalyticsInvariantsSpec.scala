package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the session's analytics additions — the
  * properties that must hold for ANY input, checked on the real corpus
  * (the oracle pins exact values; these pin the THEOREMS, so a future
  * fixture regeneration that silently degenerates a query fails here
  * with a readable message instead of a hash diff).
  */
class AnalyticsInvariantsSpec extends SparkSpec {
  private val Sf = "/root/testdata/sf0.001"

  test("survival: S non-increasing in [0,1], risk set conserved") {
    val rows = SparkEntry.queries("events_survival")(spark, Sf)
      .orderBy("age_weeks").collect()
    assert(rows.nonEmpty)
    var prevS = 1.0
    var expectedRisk = -1L
    for (r <- rows) {
      val s = r.getAs[Double]("survival")
      val n = r.getAs[Long]("n_risk")
      val d = r.getAs[Long]("n_churned")
      val c = r.getAs[Long]("n_censored")
      assert(s >= 0.0 && s <= 1.0 && s <= prevS + 1e-12,
        s"survival not monotone: $s after $prevS")
      if (expectedRisk >= 0)
        assert(n === expectedRisk, s"risk-set leak: $n vs $expectedRisk")
      expectedRisk = n - d - c
      prevS = s
    }
    assert(expectedRisk === 0L, "risk set did not drain to zero")
  }

  test("holt-winters: fitted is the one-step-ahead state prediction") {
    val rows = SparkEntry.queries("events_holt_winters")(spark, Sf)
      .orderBy("day").collect()
    assert(rows.length >= 15, "needs two seasons past init")
    // from the 8th output row on, the states that formed `fitted` are
    // themselves in the output: l/b one row back, s seven rows back
    for (t <- 7 until rows.length) {
      val f = rows(t).getAs[Double]("fitted")
      val pred = rows(t - 1).getAs[Double]("level") +
        rows(t - 1).getAs[Double]("trend") +
        rows(t - 7).getAs[Double]("seasonal")
      assert(math.abs(f - pred) < 1e-6,
        s"fitted drifted from state at row $t: $f vs $pred")
    }
  }

  test("abc: classes partition the catalog, revenue ordered A > B > C") {
    val m = SparkEntry.queries("orders_abc_analysis")(spark, Sf)
      .collect().map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_parts"), r.getAs[Double]("class_revenue")))
      .toMap
    val nParts = Tables.load(spark, Sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(m.values.map(_._1).sum === nParts, "parts not partitioned")
    assert(m("A")._2 > m("B")._2 && m("B")._2 > m("C")._2,
      s"revenue ordering violated: $m")
  }

  test("bounce rate: bounded, engaged duration positive") {
    val rows = SparkEntry.queries("events_bounce_rate")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val ns = r.getAs[Long]("n_sessions")
      val nb = r.getAs[Long]("n_bounce")
      assert(nb >= 0 && nb <= ns)
      val br = r.getAs[Double]("bounce_rate")
      assert(br >= 0.0 && br <= 1.0)
      if (!r.isNullAt(r.fieldIndex("mean_engaged_ms")))
        assert(r.getAs[Double]("mean_engaged_ms") > 0.0)
    }
  }

  test("recall curve: monotone in nprobe") {
    val rows = SparkEntry.queries("sim_recall_curve")(spark, Sf)
      .orderBy("nprobe").collect()
    assert(rows.length === 3)
    val rs = rows.map(_.getAs[Double]("recall"))
    assert(rs(0) <= rs(1) && rs(1) <= rs(2),
      s"recall not monotone: ${rs.toSeq}")
  }

  test("new-vs-returning: classes partition daily actives; day 1 all new") {
    val rows = SparkEntry.queries("events_new_vs_returning")(spark, Sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    for (r <- rows)
      assert(r.getAs[Long]("n_new") + r.getAs[Long]("n_returning") ===
        r.getAs[Long]("n_users"))
    assert(rows.head.getAs[Long]("n_returning") === 0L,
      "someone returned on the corpus's first day")
  }
}
