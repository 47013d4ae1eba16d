package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, sqrt}

/** Column-level API for graft's native expressions, registered per session
  * (idempotent). Also injectable at session build time via
  * [[GraftExtensions]].
  */
object GraftFunctions {

  val DOT = "graft_dot"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DOT, exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Fused dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function(DOT, a, b)

  /** L2 norm via the fused dot. */
  def normL2(v: Column): Column = sqrt(call_function(DOT, v, v))
}
