package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE's runtime skew-join handling — the OTHER half of the skew story
  * next to `Skew.saltedEquiJoin` (planned-ahead salting): with a key that
  * owns ~90% of the left side, the sort-merge join's hot partition must be
  * split at runtime (`skew=true` in the final adaptive plan). Thresholds
  * are lowered so the fixture-scale hot partition qualifies — the point is
  * pinning that the engine configuration path actually engages, since a
  * silently-disabled AQE would only surface as a 100×-scale incident.
  */
class SkewJoinAqeSpec extends AnyFunSuite with SparkSpec {

  test("hot key triggers an AQE skew-join split in the final plan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    val left = s.range(200000)
      .select((when(col("id") < 180000, 0L).otherwise(col("id") % 64)).as("k"),
        col("id").as("v"))
    val right = s.range(64).select(col("id").as("k"), (col("id") * 10).as("w"))
    val joined = left.join(right, "k")
    // execute THIS plan via collect (count() builds a different aggregated
    // plan, and the .rdd/foreach path skips AQE re-optimization); only
    // after execution does the adaptive plan finalize its skew splits
    assert(joined.collect().length == 200000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE skew split did not engage:\n${plan.take(3000)}")
  }
}
