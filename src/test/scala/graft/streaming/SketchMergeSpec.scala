package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** q179's KMV merge. The oracle gate checks the final sketch equals the
  * batch sketch for ONE replay layout; the claim that makes the operator
  * streaming-safe — min-k-of-union is insensitive to batch boundaries and
  * to at-least-once re-delivery — is pinned here across layouts.
  */
class SketchMergeSpec extends AnyFunSuite with SparkSpec {

  private val k = 16

  private def contents(table: String): Seq[(String, Long)] = {
    import spark.implicits._
    spark.table(table).as[(String, Long)].collect().toSeq.sorted
  }

  test("one-shot merge equals 3-way split merge plus a re-delivered batch") {
    freshDatabase("kmv_spec")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id")).persist()

    SketchMaintenance.mergeKmvBatch(ev, "event_type", "user_id",
      "kmv_spec.one_shot", k)

    val splits = (0 to 2).map(i => ev.filter(col("user_id") % 3 === i))
    splits.foreach(b => SketchMaintenance.mergeKmvBatch(
      b, "event_type", "user_id", "kmv_spec.split", k))
    val afterSplits = contents("kmv_spec.split")
    // at-least-once re-delivery: replay split 0 wholesale
    SketchMaintenance.mergeKmvBatch(splits(0), "event_type", "user_id",
      "kmv_spec.split", k)

    assert(contents("kmv_spec.split") == afterSplits,
      "re-delivered batch changed the sketch — merge is not idempotent")
    assert(contents("kmv_spec.split") == contents("kmv_spec.one_shot"),
      "split merge diverged from one-shot merge — not commutative over batches")
    assert(contents("kmv_spec.one_shot").nonEmpty, "sketch is empty — vacuous")
    ev.unpersist()
  }

  test("sketch holds at most k hashes per group, the k smallest") {
    import spark.implicits._
    freshDatabase("kmv_spec2")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("user_id"))
    SketchMaintenance.mergeKmvBatch(ev, "event_type", "user_id",
      "kmv_spec2.sk", k)
    val sizes = spark.table("kmv_spec2.sk").groupBy("event_type").count()
      .as[(String, Long)].collect()
    assert(sizes.nonEmpty && sizes.forall(_._2 <= k))
    // the stored max per group equals the k-th smallest of the full hash set
    val truth = ev.distinct()
      .select(col("event_type"),
        SketchMaintenance.kmvHash(col("user_id")).as("h"))
      .distinct()
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("event_type").agg(max("h").as("hk_true"))
    val stored = spark.table("kmv_spec2.sk")
      .groupBy("event_type").agg(max("h").as("hk_stored"))
    val diff = stored.join(truth, "event_type")
      .filter(col("hk_stored") =!= col("hk_true")).count()
    assert(diff == 0L, s"$diff groups kept hashes that are not the k smallest")
  }
}
