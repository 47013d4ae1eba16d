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
      FunctionIdentifier(GraftFunctions.INTERSECT_SORTED),
      new ExpressionInfo(classOf[IntersectSorted].getName, GraftFunctions.INTERSECT_SORTED),
      exprs => IntersectSorted(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.SHINGLE3),
      new ExpressionInfo(classOf[ShingleHashes].getName, GraftFunctions.SHINGLE3),
      exprs => ShingleHashes(exprs(0), GraftFunctions.intArg(exprs(1)))))
    // the remaining six of GraftFunctions.register's nine — the extension
    // must stay in lockstep or spark.sql.extensions-configured sessions
    // silently lack functions register() provides
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.MINHASH),
      new ExpressionInfo(classOf[MinHashSignature].getName, GraftFunctions.MINHASH),
      exprs => MinHashSignature(exprs(0), GraftFunctions.intArg(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.SIMHASH),
      new ExpressionInfo(classOf[SimHash60].getName, GraftFunctions.SIMHASH),
      exprs => SimHash60(exprs(0))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.CHARGRAMS),
      new ExpressionInfo(classOf[CharGramHashes].getName, GraftFunctions.CHARGRAMS),
      exprs => CharGramHashes(exprs(0), GraftFunctions.intArg(exprs(1)),
        GraftFunctions.intArg(exprs(2)))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.WORDGRAMS),
      new ExpressionInfo(classOf[WordGrams].getName, GraftFunctions.WORDGRAMS),
      exprs => WordGrams(exprs(0), GraftFunctions.intArg(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.GRAM_GEN),
      new ExpressionInfo(classOf[GramGenerator].getName, GraftFunctions.GRAM_GEN),
      exprs => GramGenerator(exprs(0), GraftFunctions.intArg(exprs(1)))))
    e.injectFunction((
      FunctionIdentifier(GraftFunctions.WINNOW),
      new ExpressionInfo(classOf[WinnowPositions].getName, GraftFunctions.WINNOW),
      exprs => WinnowPositions(exprs(0), GraftFunctions.intArg(exprs(1)),
        GraftFunctions.intArg(exprs(2)))))
    e.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    e.injectOptimizerRule(_ => graft.plans.JaccardSizePrefilter)
  }
}
