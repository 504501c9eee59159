package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Loader normalization guards. The driver regenerates testdata between
  * rounds and has already shipped `events.ts` under two different
  * physical encodings (TIMESTAMP(NANOS) read as long, then
  * TIMESTAMP_NTZ(µs)) — round 8's end-of-round gate lost 59
  * events-derived queries to exactly that drift. These tests pin the
  * loader contract — whatever the parquet says, consumers see a plain
  * TIMESTAMP column that `unix_millis`/`window()` accept — against the
  * CURRENT testdata, so a third encoding fails here first, not at the
  * driver.
  */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("events.ts normalizes to TIMESTAMP under the current encoding") {
    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType,
      s"ts decoded as ${e.schema("ts").dataType}")
    // unix_millis is the strictest consumer (rejects TIMESTAMP_NTZ)
    val row = e.select(unix_millis(col("ts")).as("ms")).limit(1).collect()
    assert(row.nonEmpty && row.head.getLong(0) > 0L)
  }

  test("every driver table loads with rows") {
    for (n <- Tables.names) {
      val df = n match {
        case "events" => Tables.events(spark, dir)
        case _        => Tables.load(spark, dir, n)
      }
      assert(df.limit(1).count() == 1L, s"$n is empty")
    }
  }
}
