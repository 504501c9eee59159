package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single most recent right
  * row with the same key and time ≤ the left row's time. The classic
  * enrichment operator for event streams against slowly-changing reference
  * data (trades⋈quotes, events⋈latest-order, telemetry⋈config-history);
  * absent from both the reference (SURVEY.md §2.1, no joins at all) and
  * Spark's built-ins.
  *
  * Formulation: union both sides, one window pass per key ordered by
  * (time, side, seq), carrying the last-seen right payload forward with
  * `last(_, ignoreNulls)` over an unbounded-preceding frame, then keep the
  * left rows. The carry columns travel as ONE struct through ONE window
  * call, so the output row is always a whole right row — per-column
  * `last(ignoreNulls)` windows would stitch fields from different right
  * rows whenever a right row holds a NULL in one carry column.
  * This is the SCALABLE shape: exactly one shuffle on the key
  * and one sort within partitions — no range-condition join (which Spark
  * executes as a broadcast-nested-loop or inequality sort-merge with
  * per-row scans), no per-key collect. At 100 TB it behaves like any
  * window aggregate: hash-partition on key, spill-friendly sort, AQE skew
  * handling; with 10⁹ keys the window state is one row of carried payload
  * per partition stream.
  *
  * Determinism: right rows tie-broken by `rightSeq` (greater wins, being
  * later in the frame); a right row at exactly the left row's time
  * matches (side 0 sorts before side 1).
  */
object AsofJoin {

  /** @param carry right-side columns to attach to each left row (null when
    *              no right row precedes it)
    */
  def asofBackward(
      left: DataFrame, leftKey: String, leftTime: String, leftSeq: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightSeq: String, carry: Seq[String]): DataFrame = {
    val lcols = left.columns.toSeq
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map(c => right.schema(c).copy(name = c)))
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__s", col(leftSeq))
      .withColumn("__side", lit(1))
      .select(Seq(col("__k"), col("__t"), col("__s"), col("__side")) ++
        lcols.map(col) :+
        lit(null).cast(carryType).as("__c"): _*)
    val r = right.select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        col(rightSeq).as("__s"), lit(0).as("__side")) ++
        lcols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carry.map(c => col(c).as(c)): _*).as("__c"): _*)
    val win = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .select(Seq(col("__side")) ++ lcols.map(col) :+
        last(col("__c"), ignoreNulls = true).over(win).as("__c"): _*)
      .filter(col("__side") === 1)
      .select(lcols.map(col) ++
        carry.map(c => col("__c").getField(c).as(c)): _*)
  }
}
