package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous
  *
  *   SELECT ... FROM (SELECT *, row_number() OVER
  *     (PARTITION BY g ORDER BY o) rn FROM t) WHERE rn <= k
  *
  * into the two-phase bounded-heap TopKPerGroup operator. Spark 3.5+'s
  * InferWindowGroupLimit already prunes rows below the Window, but still
  * pays the full per-partition window sort; this rewrite removes the
  * Window entirely (heap merge instead of sort). Only fires for small k
  * (heaps must stay bounded) and a lone row_number window expression. */
object TopKRewrite extends Rule[LogicalPlan] {
  private val maxK = 1000

  /** rn <= k / rn < k / k >= rn / k > rn → Some(effective k). */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
      case Literal(v: Long, org.apache.spark.sql.types.LongType) if v <= Int.MaxValue => Some(v.toInt)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order, _)), _)), _, _, wchild, _)) =>
      // strip a WindowGroupLimit Spark may already have inserted below
      val child = wchild match {
        case WindowGroupLimit(_, _, _, _, c) => c
        case c => c
      }
      val rn = alias.toAttribute
      limitOf(cond, rn) match {
        case Some(k) if k > 0 && k <= maxK && part.nonEmpty =>
          // TopKPerGroup output = child.output :+ rn — same as the Window's
          TopKPerGroup(part, order, k, rn, child)
        case _ => f
      }
  }
}
