package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit,
  LogicalPlan, Window => WindowNode}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer lint for the classic distributed-plan scale-killer: a window
  * with an EMPTY partition spec. Such a window physically plans as
  * `Exchange SinglePartition` + one sort, funneling the entire frame
  * through one task — correct at test scale, dead at 100 TB. This engine's
  * own operators avoid the pattern entirely (see `RankOps` for the
  * two-phase alternative — since round 6 even the calendar-bounded
  * `w11_cum_uniques` runs through it), but user queries composed on top of
  * the library can reintroduce it silently; this rule makes it visible.
  * `graft.Verify` and `graft.Bench` run with the strict mode ON, so a
  * regression fails the round instead of warning.
  *
  * Behavior: logs a warning per offending window. With
  * `spark.graft.failOnGlobalWindow=true` (strict/CI mode) it raises
  * instead. Windows over a `LIMIT`-bounded child are exempt — their input
  * is bounded by construction.
  *
  * Registered through [[graft.expressions.GraftExtensions]]
  * (`--conf spark.sql.extensions=graft.expressions.GraftExtensions`); the
  * rule only inspects and returns the plan unchanged, so it composes with
  * any optimizer configuration.
  */
case class GlobalWindowGuard(spark: SparkSession) extends Rule[LogicalPlan] {

  private def limitBounded(p: LogicalPlan): Boolean = p match {
    case _: GlobalLimit | _: LocalLimit => true
    case u if u.children.size == 1 => limitBounded(u.children.head)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case w: WindowNode if w.partitionSpec.isEmpty && !limitBounded(w.child) =>
        val msg = "GlobalWindowGuard: window with empty PARTITION BY plans as " +
          "Exchange SinglePartition (whole frame through one task). Partition " +
          "the window, or use graft.operators.RankOps for exact global ranks. " +
          "Set spark.graft.failOnGlobalWindow=true to make this an error. " +
          s"Offending node: ${w.simpleString(60)}"
        if (spark.conf.getOption("spark.graft.failOnGlobalWindow").exists(_.toBoolean))
          throw new IllegalStateException(msg)
        else logWarning(msg)
      case _ => ()
    }
    plan
  }
}
