package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

/** Salted join ≡ plain join on skewed data (salting is a partitioning
  * rewrite, not an approximation).
  */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join under heavy key skew") {
    // one whale key (90% of rows) + a long tail
    val fact = ((1 to 900).map(i => (7L, i.toLong)) ++
      (901 to 1000).map(i => (i.toLong % 13, i.toLong)))
      .toDF("k", "id")
    val dim = (0L to 15L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val salted = SkewOps.saltedJoin(fact, "k", "id", dim, "dk", salts = 4)
      .select($"k", $"id", $"name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    val plain = fact.join(dim, $"k" === $"dk")
      .select($"k", $"id", $"name").as[(Long, Long, String)]
      .collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("dim rows without fact matches contribute nothing (inner join)") {
    val fact = Seq((1L, 10L)).toDF("k", "id")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "name")
    val out = SkewOps.saltedJoin(fact, "k", "id", dim, "dk", salts = 3)
      .select($"name").as[String].collect().toSeq
    assert(out == Seq("a"))
  }
}
