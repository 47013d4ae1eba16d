package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** q168's DSIR importance weighting: the hashed-n-gram model must (a) keep
  * its state bounded at B buckets regardless of vocabulary — the property
  * that lets it fit on 100 TB — (b) actually enrich the target
  * distribution when selecting, and (c) score via a broadcast of the
  * bucket model, not a corpus-side shuffle.
  */
class DsirSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("selection enriches the target language well above the base rate") {
    import spark.implicits._
    val out = Quality.q168DsirSelect.fn(spark, sf)
    val selected = out.select("lang").as[String].collect()
    val en = selected.count(_ == "en").toDouble / selected.length
    val base = {
      val d = Tables.documents(spark, sf)
      d.filter(col("lang") === "en").count().toDouble / d.count()
    }
    assert(en > base + 0.2, s"selected en-rate $en vs base $base")
  }

  test("model state is bounded at 256 buckets however large the vocabulary") {
    val buckets = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("g"))
      .select(pmod(conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long"),
        lit(256)).as("b"))
      .distinct().count()
    assert(buckets <= 256)
  }

  test("the bucket model joins the gram stream as the broadcast side") {
    val plan = Quality.q168DsirSelect.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
