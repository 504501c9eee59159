package graft

import graft.functions.{TextExprs, VectorExprs}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers the engine's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works next to the Column API —
  * the `SparkSessionExtensions` hook (enable with
  * `spark.sql.extensions=graft.GraftExtensions`, or `.withExtensions` in
  * code). No custom optimizer rules are injected: every graft plan is
  * built from declarative operators Catalyst already optimizes (SURVEY.md
  * §4 — the faithful surface needs none).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  /** Register into an already-built session (same set as the extensions
    * hook — handy for notebooks/tests where the session exists).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        new FunctionIdentifier(name), info, builder)
    }

  private val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = {
    Seq(
      ("vec_dot",
        new ExpressionInfo(classOf[VectorExprs.DotProduct].getName, "vec_dot"),
        (args: Seq[Expression]) => VectorExprs.DotProduct(args(0), args(1))),
      ("simhash60",
        new ExpressionInfo(classOf[VectorExprs.SimHash60].getName, "simhash60"),
        (args: Seq[Expression]) => VectorExprs.SimHash60(args(0))),
      ("shingle_set",
        new ExpressionInfo(classOf[TextExprs.ShingleSet].getName, "shingle_set"),
        (args: Seq[Expression]) =>
          TextExprs.ShingleSet(args(0), intArg(args(1), "k"))),
      ("h15_array",
        new ExpressionInfo(classOf[TextExprs.H15Array].getName, "h15_array"),
        (args: Seq[Expression]) => TextExprs.H15Array(args(0))),
      ("minhash_sig",
        new ExpressionInfo(classOf[TextExprs.MinhashSig].getName, "minhash_sig"),
        (args: Seq[Expression]) =>
          TextExprs.MinhashSig(args(0), intArg(args(1), "perms"))),
      ("sorted_longs",
        new ExpressionInfo(classOf[TextExprs.SortedLongs].getName, "sorted_longs"),
        (args: Seq[Expression]) => TextExprs.SortedLongs(args(0))),
      ("intersect_count_sorted",
        new ExpressionInfo(classOf[TextExprs.IntersectCountSorted].getName,
          null, "intersect_count_sorted",
          "intersect_count_sorted(a, b) - Count of distinct common values " +
            "of two BIGINT arrays (= size(array_intersect(a, b))). Fast " +
            "O(|a|+|b|) merge when both arrays are ASCENDING-sorted (build " +
            "with sorted_longs); unsorted or null-bearing input is detected " +
            "and recomputed via a hash intersect.",
          ""),
        (args: Seq[Expression]) =>
          TextExprs.IntersectCountSorted(args(0), args(1))))
  }
}
