package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Custom codegen kernels for the hot loops that Spark's higher-order
  * functions (`zip_with`/`aggregate`) leave interpreted — HOFs are
  * CodegenFallback with per-element lambda dispatch and boxing, ~100× the
  * cost of a primitive loop at 64-dim × millions of candidate pairs.
  * Values are bit-identical to the HOF formulations (same IEEE fold
  * order), so the DuckDB oracles are unchanged.
  */
object VectorExprs {

  /** Sequential double-precision dot product over two numeric arrays
    * (float or double elements), left-to-right fold — the exact semantics
    * of `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
    * y.cast(double)), 0.0, _+_)` and of DuckDB
    * `list_reduce(list_transform(list_zip(a, b), ...), ...)`.
    */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val getL = CodeGenerator.getValue(a, elemType(left), i)
        val getR = CodeGenerator.getValue(b, elemType(right), i)
        s"""
          int $n = java.lang.Math.min($a.numElements(), $b.numElements());
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += (double)($getL) * (double)($getR);
          }
          ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** 60-bit SimHash of a string array: per element, the portable 60-bit
    * hash (md5 hex[0,15) as long — identical to [[PortableHash.h15]])
    * votes ±1 on each bit; output bit b is set iff the vote sum is
    * positive. Integer math — order-independent, equal to both the HOF
    * formulation and the DuckDB relational oracle. One tight JVM loop per
    * row instead of tokens×60 interpreted lambda evals (the md5 dominates;
    * CodegenFallback costs nothing measurable here).
    */
  case class SimHash60(child: Expression) extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash60"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](60)
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          md.reset()
          val d = md.digest(s.getBytes)
          // first 15 hex chars = high 60 bits of the first 8 digest bytes,
          // exactly h15's conv(substring(md5, 1, 15), 16, 10)
          var h = 0L
          var j = 0
          while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
          h = h >>> 4 // 64 -> 60 bits (drop the 16th hex char)
          var b = 0
          while (b < 60) {
            votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def simhash60(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))
}
