package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: print the trained-model cell-size distribution
  * at a given sf dir (the sub-bucket cap's inertness precondition).
  */
object CellSizes {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.embeddings(spark, dir)
    val cents = graft.operators.KMeansOps.lloyd(e, "vec_id", "embedding",
      seedIds = (100L until 108L).toSeq,
      iters = 2)
    graft.operators.SimilarityOps.assignCells(cents)(e)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).show(20, false)
    spark.stop()
  }
}
