package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `filter(rn <= k)` over a lone
  * `row_number().over(partitionBy … orderBy …)` window into the bounded-heap
  * [[TopKPerKeyNode]] — user queries written in the idiomatic window style
  * get the O(n log k) per-key-top-k physical operator automatically, with
  * the rank attribute preserved under its original exprId so downstream
  * references keep resolving.
  *
  * Conservative by design: exactly one window expression, it is
  * row_number, the filter is a standalone `rn <= k` / `rn < k` / `rn = 1`
  * on that attribute, and the window has a nonempty ORDER BY (without one,
  * row_number is nondeterministic and we leave the plan alone). Spark's own
  * InferWindowGroupLimit may already have inserted a WindowGroupLimit below
  * the window; it is subsumed and stripped.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = w match {
    // partitionSpec must be nonempty: a GLOBAL top-k has no clustering key
    // (ClusteredDistribution(Nil) is illegal) and Spark's own
    // WindowGroupLimit/TakeOrdered path already handles it well.
    case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
        partitionSpec, orderSpec, child, _)
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      limitFromCondition(cond, alias).map { k =>
        val rankAttr = AttributeReference(alias.name, IntegerType, nullable = false)(
          exprId = alias.exprId, qualifier = alias.qualifier)
        // Spark's InferWindowGroupLimit may have inserted its own
        // pre-filtering node below the window — our operator subsumes it.
        val realChild = child match {
          case WindowGroupLimit(_, _, _, _, inner) => inner
          case other => other
        }
        TopKPerKeyNode(k, partitionSpec, orderSpec, rankAttr, realChild)
      }
    case _ => None
  }

  private def limitFromCondition(cond: Expression, alias: Alias): Option[Int] = {
    def isRank(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == alias.exprId
      case _ => false
    }
    cond match {
      case LessThanOrEqual(a, IntegerLiteral(k)) if isRank(a) && k >= 1 => Some(k)
      case LessThan(a, IntegerLiteral(k)) if isRank(a) && k >= 2 => Some(k - 1)
      case EqualTo(a, IntegerLiteral(1)) if isRank(a) => Some(1)
      case EqualTo(IntegerLiteral(1), a) if isRank(a) => Some(1)
      case _ => None
    }
  }
}
