package graft

/** Scratch audit tool (test scope, not shipped): dump per-query counts
  * of CartesianProduct / BroadcastNestedLoopJoin nodes in the formatted
  * physical plans, to bake the PlanSpec global-sweep allowlist from
  * measured reality instead of guesses.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Logs.quietBenignErrors()
    // "(n) <Node>" detail headers: exactly one per node instance in
    // FormattedMode (the tree line interposes join build/type args
    // between name and paren, so name-paren matching undercounts)
    def count(h: String, n: String): Int =
      ("""\(\d+\) """ + n).r.findAllIn(h).length
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.queryExecution.executedPlan
        val p = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val cart = count(p, "CartesianProduct")
        val bnlj = count(p, "BroadcastNestedLoopJoin")
        if (cart > 0 || bnlj > 0)
          println(s"PLANDUMP $name cart=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP $name ERROR ${e.toString.take(80)}")
      }
    }
    spark.stop()
  }
}
