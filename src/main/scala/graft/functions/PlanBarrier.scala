package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports itself NON-deterministic so the optimizer
  * will not inline the wrapped expression through an alias. Use on an
  * expensive projection (a JSON/Avro parse) that a downstream filter
  * references: without the barrier, PushDownPredicates substitutes the
  * alias into the filter condition and the parse runs once in the Filter
  * and again in the Project (2× the dominant cost of a decode stage).
  * With it, the filter stays above the projection and reads the computed
  * attribute. Codegen passes through to the child, so the wrapped
  * expression itself stays compiled.
  */
case class Opaque(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): Opaque =
    copy(child = newChild)
}

object PlanBarrier {
  /** `opaque(c)` — evaluate `c` exactly where it is projected; downstream
    * predicates will not be pushed into or duplicated below it.
    */
  def opaque(c: Column): Column =
    ColumnBridge.column(Opaque(ColumnBridge.expression(c)))
}
