package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers sort-merge
  * joins at runtime; explicit salting is the planned-ahead form for joins
  * whose hot keys are known to explode a single reducer partition.
  *
  * `saltedEquiJoin` splits every left-side key into `salts` sub-keys and
  * replicates the right side once per salt, so a hot key's rows spread over
  * `salts` reducers instead of one. Result is row-identical to the plain
  * equi-join (spec-verified).
  */
object Skew {

  /** Inner equi-join on `key`, salted `salts` ways.
    *
    * The left salt must be deterministic but uniform-ish; a hash of the
    * whole left row's unique id would be ideal — callers pass any left
    * column expression to derive it from (`saltSource`).
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
