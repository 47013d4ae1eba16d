package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook: makes graft's native functions available in
  * every session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Iterates [[GraftFunctions.builders]] — the same table
  * [[GraftFunctions.register]] uses — so the two registration paths are in
  * lockstep by construction: a function added to the table is available on
  * both, and neither can silently lag the other.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, cls, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    e.injectOptimizerRule(_ => graft.plans.JaccardSizePrefilter)
  }
}
