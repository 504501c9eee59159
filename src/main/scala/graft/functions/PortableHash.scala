package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A 60-bit hash computable bit-identically in Spark and DuckDB, used
  * wherever a hash value is part of an oracle-checked result (fingerprints,
  * MinHash signatures, LSH band keys, SimHash).
  *
  * Spark:  `cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)`
  * DuckDB: `('0x' || substring(md5(s), 1, 15))::BIGINT`
  *
  * 15 hex digits = 60 bits, always positive in a signed 64-bit long in both
  * engines. md5 here is a *portability* device, not a security one; xxhash64
  * would be faster but is not reproducible inside DuckDB SQL. At 100 TB the
  * md5 cost is per-row CPU inside whole-stage codegen — no shuffle impact —
  * and can be swapped for xxhash64 once oracle parity is no longer needed.
  */
object PortableHash {

  /** h15(s): 60-bit hash of a string column. */
  def h15(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash families for MinHash permutations /
    * LSH hyperplanes. Seed is folded into the input, goavro-style
    * (reference caches one codec per schema id the same way:
    * src/kafka/encode_decode.go:122-134 — per-key derived function).
    */
  def h15(seed: Int, s: Column): Column =
    h15(concat(lit(s"$seed:"), s))

  /** Driver/executor-side Scala replica of [[h15]], for model state built
    * or probed outside a Column expression (broadcast weight maps etc.).
    * Must stay bit-identical to the Column and DuckDB forms.
    */
  def h15Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** DuckDB SQL fragment equivalents, used when assembling oracle SQL. */
  def duckH15(sqlExpr: String): String =
    s"('0x' || substring(md5($sqlExpr), 1, 15))::BIGINT"
  def duckH15(seed: Int, sqlExpr: String): String =
    duckH15(s"concat('$seed:', $sqlExpr)")
}
