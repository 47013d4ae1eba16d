package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** The typed Aggregator centroid must agree with the relational
  * posexplode-based centroid (q30) — two implementations, one semantics.
  */
class VectorAvgSpec extends AnyFunSuite with SparkSpec {

  test("Aggregator centroids equal posexplode centroids") {
    val sf = "/root/testdata/sf0.001"
    val vecAvg = udaf(new VectorAvg(64))
    val emb = Tables.embeddings(spark, sf)
      .withColumn("v", col("embedding").cast("array<double>"))

    val viaAggregator = emb.groupBy("label")
      .agg(vecAvg(col("v")).as("centroid"))
      .select(col("label"), posexplode(col("centroid")))
      .select(col("label"), col("pos").as("dim"), round(col("col"), 5).as("c"))

    val viaExplode = emb
      .select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos").as("dim"))
      .agg(round(avg("col"), 5).as("c"))

    val a = viaAggregator.collect().map(_.toString).sorted
    val b = viaExplode.collect().map(_.toString).sorted
    assert(a.length == 640)
    assert(a.sameElements(b))
  }
}
