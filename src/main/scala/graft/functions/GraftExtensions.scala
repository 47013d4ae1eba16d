package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook: makes graft's native functions available in
  * every session built with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.DOT),
      new ExpressionInfo(classOf[DotProduct].getName, GraftFunctions.DOT),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.INTERSECT_COUNT),
      new ExpressionInfo(classOf[IntersectCountSorted].getName, GraftFunctions.INTERSECT_COUNT),
      exprs => IntersectCountSorted(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.SHINGLE3),
      new ExpressionInfo(classOf[ShingleHashes].getName, GraftFunctions.SHINGLE3),
      exprs => ShingleHashes(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())))
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    e.injectOptimizerRule(_ => graft.plans.JaccardSizePrefilter)
  }
}
