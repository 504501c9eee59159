package graft

import graft.queries.EsDslQueries
import org.apache.spark.sql.functions._

/** Kernels behind the ES geo family: geohash bit-interleave and
  * Web-Mercator tiling against PUBLISHED test vectors (the encodings are
  * specified, so a wrong bit order fails loudly here, not as a silent
  * cross-engine coincidence), plus partition/conservation invariants of
  * the bucketing queries on real data.
  */
class EsDslSpec extends SparkSpec {
  private val Sf = "/root/testdata/sf0.001"

  private def encode(lat: Double, lon: Double, sql: String): String = {
    import spark.implicits._
    Seq((lat, lon)).toDF("lat", "lon")
      .withColumn("__gx", expr(EsDslQueries.gxSql))
      .withColumn("__gy", expr(EsDslQueries.gySql))
      .withColumn("__gg",
        expr(EsDslQueries.interleaveSql(EsDslQueries.sparkShr)))
      .withColumn("out", expr(sql))
      .select("out").as[String].head()
  }

  test("geohash3: published test vectors") {
    val gh = EsDslQueries.ghashSql(EsDslQueries.sparkShr)
    assert(encode(57.64911, 10.40744, gh) === "u4p") // Wikipedia vector
    assert(encode(42.605, -5.603, gh) === "ezs")     // classic ezs42
    assert(encode(0.0001, 0.0001, gh) === "s00")
    assert(encode(-25.382708, -49.265506, gh) === "6gk") // Curitiba
  }

  test("geotile z4: published slippy-map vectors") {
    assert(encode(40.7128, -74.006, EsDslQueries.geotileSql) === "4/4/6")
    assert(encode(-33.8688, 151.2093, EsDslQueries.geotileSql) === "4/14/9")
  }

  test("geo_distance: haversine agrees with the spherical law of cosines") {
    import spark.implicits._
    // (0,0) → Berlin (52.5200 N, 13.4050 E): check the haversine kernel
    // against the INDEPENDENT law-of-cosines formula on the same sphere
    // (cos Δσ = cos φ · cos Δλ when the origin is (0,0)); the two
    // derivations share no code, so a dropped /2 or swapped axis in the
    // kernel cannot cancel out.
    val km = Seq((52.52, 13.405)).toDF("lat", "lon")
      .withColumn("km", expr(EsDslQueries.distKmSql))
      .select("km").as[Double].head()
    val expected = 6371.0 * math.acos(
      math.cos(math.toRadians(52.52)) * math.cos(math.toRadians(13.405)))
    assert(math.abs(km - expected) < 1e-6, s"haversine off: $km vs $expected")
  }

  test("geo buckets partition the corpus (counts conserved)") {
    val total = Tables.events(spark, Sf).count()
    val rings = SparkEntry.queries("es_geo_distance")(spark, Sf)
    assert(rings.agg(sum("doc_count")).head().getLong(0) === total)
    val box = SparkEntry.queries("es_geo_bounding_box")(spark, Sf)
    val inBox = box.agg(sum("doc_count")).head().getLong(0)
    assert(inBox > 0 && inBox < total, "bounding box vacuous")
    val bounds = SparkEntry.queries("es_geo_bounds")(spark, Sf)
    val r = bounds.filter(col("event_type") === "purchase").head()
    assert(r.getAs[Double]("bottom") >= -80.0 &&
      r.getAs[Double]("top") < 80.0 &&
      r.getAs[Double]("left") >= -180.0 &&
      r.getAs[Double]("right") < 180.0)
    assert(r.getAs[Double]("centroid_lat") > r.getAs[Double]("bottom") &&
      r.getAs[Double]("centroid_lat") < r.getAs[Double]("top"))
  }

  test("variable_width_histogram: 3 buckets, counts conserved, ordered") {
    val h = SparkEntry.queries("es_variable_width_histogram")(spark, Sf)
      .orderBy("bucket").collect()
    assert(h.length === 3, s"expected 3 buckets, got ${h.length}")
    val nPurch = Tables.events(spark, Sf)
      .filter(col("event_type") === "purchase").count()
    assert(h.map(_.getAs[Long]("doc_count")).sum === nPurch)
    // buckets are ordered, non-overlapping ranges
    assert(h(0).getAs[Double]("max_v") < h(1).getAs[Double]("min_v"))
    assert(h(1).getAs[Double]("max_v") < h(2).getAs[Double]("min_v"))
  }

  test("string_stats: collision kernel bounded, lengths sane") {
    val st = SparkEntry.queries("es_string_stats")(spark, Sf).collect()
    assert(st.nonEmpty)
    for (r <- st) {
      val p = r.getAs[Double]("collision_prob")
      val dc = r.getAs[Long]("distinct_chars")
      // Σp² ∈ [1/k, 1] for k distinct symbols
      assert(p >= 1.0 / dc.toDouble - 1e-12 && p <= 1.0)
      assert(r.getAs[Long]("min_len") <= r.getAs[Long]("max_len"))
      val avg = r.getAs[Double]("avg_len")
      assert(avg >= r.getAs[Long]("min_len").toDouble &&
        avg <= r.getAs[Long]("max_len").toDouble)
    }
  }

  test("moving_percentiles: p25 <= p50 <= p75, inside min/max window") {
    val mp = SparkEntry.queries("es_moving_percentiles")(spark, Sf).collect()
    assert(mp.nonEmpty)
    for (r <- mp) {
      val (a, b, c) = (r.getAs[Double]("win_p25"),
        r.getAs[Double]("win_p50"), r.getAs[Double]("win_p75"))
      assert(a <= b && b <= c)
    }
  }
}
