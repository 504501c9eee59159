package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the manual remedy when one join
  * key holds a disproportionate share of the fact rows (a "whale" user, a
  * null-ish default key) and a single reducer partition becomes the
  * straggler. AQE's skew-join splitting (sort-merge only, post-hoc
  * partition splitting) covers many cases at runtime; explicit salting is
  * the planned-ahead form that also works for hash joins and for
  * aggregations feeding a join, so the engine ships it as a first-class
  * rewrite.
  *
  * Shape: the FACT side gets a deterministic per-row salt in [0, salts)
  * (hash of the whole row's unique column — reproducible, no RNG state);
  * the SMALLER side is exploded `salts`× so every (key, salt) bucket finds
  * its match. The join key becomes (key, salt): the whale key's rows now
  * spread over `salts` reducer partitions. Cost: the small side is
  * replicated `salts`× (choose salts ≈ skew factor, not 1000); result
  * equality with the plain join is exact — salting is a partitioning
  * rewrite, not an approximation (asserted in SkewOpsSpec and oracle-
  * checked by the `skew_join_salted` query against the UNsalted SQL).
  */
object SkewOps {

  /** Inner equi-join `fact ⋈ dim` on fact(factKey) = dim(dimKey), salted.
    *
    * @param saltSource fact column whose hash drives salt assignment (an
    *                   id/offset column; any column works, uniform-ish is
    *                   better)
    * @param salts      bucket count the hot keys are spread over
    */
  def saltedJoin(
      fact: DataFrame, factKey: String, saltSource: String,
      dim: DataFrame, dimKey: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn would silently OVERWRITE a caller's __salt column and the
    // final drop would then remove caller data — refuse instead
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin inputs must not already contain a __salt column")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact
      .join(explodedDim,
        col(factKey) === col(dimKey) && saltedFact("__salt") === explodedDim("__salt"))
      .drop("__salt")
  }
}
