package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.execution.FormattedMode

/** The co-location contract: bucketed tables join with no exchange and
  * no per-query sort — the write-once shuffle that makes repeated
  * fact-fact joins free at 100 TB.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan
    df.queryExecution.explainString(FormattedMode)
  }

  test("same-key bucketed tables sort-merge join with zero exchanges") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-bucketed").toString
    val facts = (0L until 400L).map(i => (i % 40, i)).toDF("k", "a")
    val dims = (0L until 200L).map(i => (i % 40, i * 2)).toDF("k", "b")
    BucketedTables.writeBucketed(facts, "bj_facts", s"$base/facts", "k", 8)
    BucketedTables.writeBucketed(dims, "bj_dims", s"$base/dims", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bj_facts")
        .join(spark.table("bj_dims"), Seq("k"))
      // same rows as the unbucketed join...
      val expect = facts.join(dims, Seq("k")).count()
      assert(joined.count() == expect && expect > 0)
      // ...but the bucketed plan has NO exchange: the on-disk bucket
      // layout IS the shuffle. (A partition-LOCAL Sort remains: since
      // 3.0 Spark only trusts bucket-file sort order behind the legacy
      // outputOrdering flag — no network, cheap, accepted.)
      val p = plan(joined)
      assert(p.contains("SortMergeJoin"), p.take(1500))
      assert(!p.contains("Exchange"),
        "bucketed join still shuffles — bucket spec not picked up\n" +
          p.take(2000))
      // control: the same join over plain parquet DOES shuffle, so the
      // pin above cannot pass vacuously
      val c = plan(facts.join(dims, Seq("k")))
      assert(c.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bj_facts")
      spark.sql("DROP TABLE IF EXISTS bj_dims")
    }
  }
}
