package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, sqrt}

/** Column-level API for graft's native expressions, registered per session
  * (idempotent). Also injectable at session build time via
  * [[GraftExtensions]].
  */
object GraftFunctions {

  val DOT = "graft_dot"
  val INTERSECT_COUNT = "graft_intersect_count"
  val MINHASH = "graft_minhash"
  val SIMHASH = "graft_simhash60"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      DOT, exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      INTERSECT_COUNT, exprs => IntersectCountSorted(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      MINHASH, exprs => MinHashSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    reg.createOrReplaceTempFunction(
      SIMHASH, exprs => SimHash60(exprs(0)), "built-in")
  }

  /** Fused dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = call_function(DOT, a, b)

  /** L2 norm via the fused dot. */
  def normL2(v: Column): Column = sqrt(call_function(DOT, v, v))

  /** Merge-count of common elements of two sorted distinct long arrays. */
  def intersectCount(a: Column, b: Column): Column =
    call_function(INTERSECT_COUNT, a, b)

  /** MinHash signature array over token hashes. */
  def minhash(tokenHashes: Column, numHashes: Int): Column =
    call_function(MINHASH, tokenHashes, org.apache.spark.sql.functions.lit(numHashes))

  /** 60-bit SimHash signature over token hashes. */
  def simhash60(tokenHashes: Column): Column = call_function(SIMHASH, tokenHashes)
}
