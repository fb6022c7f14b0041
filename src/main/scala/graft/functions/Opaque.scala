package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity pass-through that is declared nondeterministic: an
  * optimizer barrier. Evaluates (and codegens) exactly as its child,
  * but because the optimizer may not duplicate, reorder, or push
  * predicates across nondeterministic expressions, a projection
  * containing `Opaque(expensive)` guarantees `expensive` is evaluated
  * exactly once per row at exactly this point in the plan.
  *
  * Used by [[graft.cdc.Envelope.extractNewRecordState]]: without the
  * barrier, PushDownPredicates rewrites the tombstone filter below the
  * parse projection by substituting the `from_json` codec into the
  * filter condition — re-running the full JSON parse up to two extra
  * times per row below any repartition (measured 4x wall-clock on the
  * envelope-roundtrip bench at sf0.1).
  */
case class Opaque(child: Expression) extends UnaryExpression with Nondeterministic {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "opaque"
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(input: InternalRow): Any = child.eval(input)
  override def genCode(ctx: CodegenContext): ExprCode = child.genCode(ctx)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw new IllegalStateException("genCode delegates to child")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
