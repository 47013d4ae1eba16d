package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans graft's custom logical operators. Injected via
  * [[graft.functions.GraftExtensions]] (`injectPlannerStrategy`) or
  * registered per session with `spark.experimental.extraStrategies`.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(left, right, lk, rk, lt, rt, strict) =>
      AsOfJoinExec(lk, rk, lt, rt, strict, planLater(left), planLater(right)) :: Nil
    case _ => Nil
  }
}
