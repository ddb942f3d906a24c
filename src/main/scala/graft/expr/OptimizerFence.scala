package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer fence for an EXPENSIVE, pure expression (guide §4.4 applied
  * to the JVM: the optimizer pushes inferred `isnotnull`/predicate
  * filters through Project aliases by SUBSTITUTING the aliased
  * expression, so a filter above the span-parse projection turns into a
  * second — and with several conjuncts, third and fourth — evaluation of
  * the parse below it; codegen subexpression elimination dedupes within
  * one operator but not across the Filter/Project pair, leaving the hot
  * parse evaluated twice per row).
  *
  * The wrapper is a transparent codegen/eval delegate that only reports
  * `deterministic = false`. The wrapped call IS pure (same input -> same
  * output — task retries recompute identical values, so shuffles over
  * derived columns stay exactly-once), but the flag forbids exactly the
  * rewrites that duplicate it: filter pushdown through the alias,
  * project collapse, and constant-factoring. Downstream operators see
  * plain attributes (aliases), so joins/aggregates/range-partitioning
  * over the RESULTS are planned normally.
  *
  * Semantics are unchanged: inferred null-filters evaluate ABOVE the
  * projection instead of below it, which admits and drops exactly the
  * same rows an inner join / null-propagating predicate would.
  */
case class OpaquePure(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OpaquePure =
    copy(child = newChild)
}
