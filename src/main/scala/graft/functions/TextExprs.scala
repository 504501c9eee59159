package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels for the shingle/minhash hot path. Same results as
  * the declarative HOF formulations (and the DuckDB oracles), minus the
  * per-element interpreted-lambda dispatch that dominates their cost:
  * one JVM method call per ROW instead of per element.
  */
object TextExprs {

  /** Distinct k-token shingles: indices 0..max(n-k, 0), shingle i =
    * tokens[i..i+k) joined with ' ', first-occurrence order — exactly
    * `array_distinct(transform(sequence(0, greatest(n-k, 0)),
    * i => concat_ws(' ', slice(toks, i+1, k))))`.
    */
  case class ShingleSet(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType)
    override def prettyName: String = "shingle_set"

    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[ArrayData]
      val n = toks.numElements()
      val last = math.max(n - k, 0)
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= last) {
        val sb = new java.lang.StringBuilder()
        var j = i
        val end = math.min(i + k, n)
        while (j < end) {
          if (j > i) sb.append(' ')
          val t = toks.getUTF8String(j)
          if (t != null) sb.append(t.toString)
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** h15 of every element: md5 hex[0,15) as long (== PortableHash.h15,
    * == DuckDB `('0x' || substring(md5(x), 1, 15))::BIGINT`).
    */
  case class H15Array(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType)
    override def prettyName: String = "h15_array"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Any](n)
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        out(i) = if (s == null) null else {
          md.reset()
          val d = md.digest(s.getBytes)
          var h = 0L
          var j = 0
          while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
          h >>> 4 // first 15 hex chars = high 60 of first 64 bits
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** All `perms` MinHash mins in ONE pass over the base-hash array:
    * sig[p] = min over h of rotl60(h, 7p mod 60) xor salt(p) — exactly
    * DedupOps.rotl60/permSalt (and the generated DuckDB mirror).
    */
  case class MinhashSig(child: Expression, perms: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType)
    override def prettyName: String = "minhash_sig"

    @transient private lazy val rots: Array[Int] =
      (0 until perms).map(p => (7 * p) % 60).toArray
    @transient private lazy val salts: Array[Long] =
      (0 until perms).map(graft.operators.DedupOps.permSalt).toArray

    override def nullSafeEval(input: Any): Any = {
      val base = input.asInstanceOf[ArrayData]
      val n = base.numElements()
      val mins = Array.fill(perms)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (!base.isNullAt(i)) {
          val h = base.getLong(i)
          var p = 0
          while (p < perms) {
            val r = rots(p)
            val rot = if (r == 0) h
              else ((h % (1L << (60 - r))) << r) + (h >>> (60 - r))
            val v = rot ^ salts(p)
            if (v < mins(p)) mins(p) = v
            p += 1
          }
        }
        i += 1
      }
      new GenericArrayData(mins.map(m =>
        if (m == Long.MaxValue) null else m: Any))
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Ascending sort of a long array (null elements dropped — the shingle
    * pipeline never produces them). Sorting the signature/shingle-set
    * arrays ONCE at build lets every downstream pair verification run a
    * linear merge instead of a per-pair hash build.
    */
  case class SortedLongs(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType)
    override def prettyName: String = "sorted_longs"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Long](n)
      var i = 0; var m = 0
      while (i < n) {
        if (!arr.isNullAt(i)) { out(m) = arr.getLong(i); m += 1 }
        i += 1
      }
      val trimmed = if (m == n) out else java.util.Arrays.copyOf(out, m)
      java.util.Arrays.sort(trimmed)
      new GenericArrayData(trimmed)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** |A ∩ B| — count of distinct common values, same result as
    * `size(array_intersect(a, b))` (which dedups). Fast path: when both
    * arrays are ASCENDING-sorted (the normal case — build them with
    * `sorted_longs`), a linear merge at O(|A|+|B|) primitive ops with zero
    * allocation. The merge VALIDATES sortedness as it advances (including
    * null elements and the unconsumed tails); any inversion or null makes
    * it recompute via a hash intersect, so unsorted input degrades to the
    * hash cost instead of silently returning a wrong count. This is the
    * AllPairs/PPJoin verify kernel: the interpreted array_intersect was
    * ~360 µs per candidate pair (boxed hash set per call), turning a
    * 1 M-pair verify into minutes.
    */
  case class IntersectCountSorted(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "intersect_count_sorted"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements(); val ny = y.numElements()
      var i = 0; var j = 0; var c = 0
      var px = Long.MinValue; var py = Long.MinValue
      var mergeable = true
      while (mergeable && i < nx && j < ny) {
        if (x.isNullAt(i) || y.isNullAt(j)) mergeable = false
        else {
          val xv = x.getLong(i); val yv = y.getLong(j)
          if (xv < px || yv < py) mergeable = false
          else {
            px = xv; py = yv
            if (xv < yv) i += 1
            else if (xv > yv) j += 1
            else {
              c += 1
              while (i < nx && !x.isNullAt(i) && x.getLong(i) == xv) i += 1
              while (j < ny && !y.isNullAt(j) && y.getLong(j) == yv) j += 1
            }
          }
        }
      }
      // an inversion (or null) in the unconsumed tail could hide matches
      // the merge skipped — keep validating to the end before trusting c
      while (mergeable && i < nx) {
        if (x.isNullAt(i)) mergeable = false
        else { val v = x.getLong(i)
          if (v < px) mergeable = false else { px = v; i += 1 } }
      }
      while (mergeable && j < ny) {
        if (y.isNullAt(j)) mergeable = false
        else { val v = y.getLong(j)
          if (v < py) mergeable = false else { py = v; j += 1 } }
      }
      if (mergeable) c else hashIntersectCount(x, y)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Fallback for unsorted/null-bearing inputs — distinct-value intersect
    * count with array_intersect's null semantics (null ∈ both sides counts
    * once).
    */
  private def hashIntersectCount(x: ArrayData, y: ArrayData): Int = {
    val leftVals = new java.util.HashSet[java.lang.Long]()
    var leftNull = false
    var i = 0
    val nx = x.numElements()
    while (i < nx) {
      if (x.isNullAt(i)) leftNull = true
      else leftVals.add(x.getLong(i))
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    var c = 0; var bothNull = false
    var j = 0
    val ny = y.numElements()
    while (j < ny) {
      if (y.isNullAt(j)) { if (leftNull) bothNull = true }
      else {
        val v: java.lang.Long = y.getLong(j)
        if (leftVals.contains(v) && seen.add(v)) c += 1
      }
      j += 1
    }
    if (bothNull) c + 1 else c
  }

  def shingleSet(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(tokens), k))
  def h15Array(strings: Column): Column =
    ColumnBridge.column(H15Array(ColumnBridge.expression(strings)))
  def minhashSig(base: Column, perms: Int): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(base), perms))
  def sortedLongs(a: Column): Column =
    ColumnBridge.column(SortedLongs(ColumnBridge.expression(a)))
  def intersectCountSorted(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCountSorted(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
