package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Limit, LogicalPlan,
  Sort, Window => WindowNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rewrite for the global top-k anti-pattern that
  * [[GlobalWindowGuard]] only lints:
  *
  * {{{ Filter(rn <= k, Window(rn := row_number() OVER (ORDER BY s), child)) }}}
  *
  * The window has an empty partition spec, so it physically plans as
  * `Exchange SinglePartition` + one global sort — the whole frame through
  * one task. But a row survives the filter iff it is among the first `k`
  * rows of the global sort order, so the plan is equivalent to
  *
  * {{{ Window(rn := row_number(), Limit(k, Sort(s, global, child))) }}}
  *
  * which Spark plans as `TakeOrderedAndProject` (per-partition top-k heaps,
  * then a k-row merge — no full sort, no unbounded single-partition
  * exchange); the residual window then renumbers k rows, a bounded input
  * that [[GlobalWindowGuard]] exempts. Same tie ambiguity as the original:
  * `row_number` over a non-total order was already nondeterministic among
  * peers.
  *
  * Fires only when the rewrite is provably safe: single window expression
  * (another expression would need the full frame), empty partition spec,
  * non-empty order spec, and a conjunct of the literal shapes
  * `rn <= k | rn < k | k >= rn | k > rn | rn = 1`. Other conjuncts are
  * preserved above the rewritten window. `rank`/`dense_rank` are left
  * alone — their filters keep tied peers, which a row limit would drop.
  */
case class TopKRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def intLit(e: Expression): Option[Long] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(v: Long, LongType) => Some(v)
    case _ => None
  }

  /** Extracts (rankAttr, inclusive-k) from a prefix-limiting conjunct. */
  private object RnPrefix {
    def unapply(e: Expression): Option[(Attribute, Long)] = e match {
      case LessThanOrEqual(a: Attribute, l) => intLit(l).map(k => (a, k))
      case LessThan(a: Attribute, l) => intLit(l).map(k => (a, k - 1))
      case GreaterThanOrEqual(l, a: Attribute) => intLit(l).map(k => (a, k))
      case GreaterThan(l, a: Attribute) => intLit(l).map(k => (a, k - 1))
      case EqualTo(a: Attribute, l) => intLit(l).filter(_ == 1L).map(k => (a, k))
      case EqualTo(l, a: Attribute) => intLit(l).filter(_ == 1L).map(k => (a, k))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, w: WindowNode)
        if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
          w.windowExpressions.size == 1 =>
      w.windowExpressions.head match {
        case al @ Alias(WindowExpression(_: RowNumber, _), _) =>
          val rn = al.toAttribute
          val conjs = splitAnd(cond)
          val ks = conjs.collect {
            case RnPrefix(a, k) if a.semanticEquals(rn) => k
          }
          if (ks.isEmpty || ks.min <= 0 || ks.min > Int.MaxValue) f
          else {
            val k = ks.min
            val rest = conjs.filter {
              case RnPrefix(a, kk) if a.semanticEquals(rn) && kk >= k => false
              case _ => true
            }
            val limited = Limit(Literal(k.toInt),
              Sort(w.orderSpec, global = true, w.child))
            val topk = w.copy(child = limited)
            if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
          }
        case _ => f
      }
  }
}
