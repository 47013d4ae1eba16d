package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class GramGeneratorSpec extends AnyFunSuite with SparkSpec {

  test("LATERAL VIEW UDTF equals posexplode of the fused word-gram array") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, "a b c d"), (2L, "solo"), (3L, "x y"))
      .toDF("id", "text").createOrReplaceTempView("gram_gen_docs")
    val viaUdtf = spark.sql(
      """SELECT id, pos, gram FROM gram_gen_docs
        |LATERAL VIEW graft_gram_gen(text, 2) g AS pos, gram
        |ORDER BY id, pos""".stripMargin).collect()
    val viaExplode = spark.table("gram_gen_docs")
      .select(col("id"), posexplode(GraftFunctions.wordGrams(col("text"), 2)))
      .orderBy("id", "pos").collect()
    assert(viaUdtf.length == 4) // 3 bigrams + 1 + 0... (id2 "solo" has none)
    assert(viaUdtf.map(_.toString).toSeq == viaExplode.map(_.toString).toSeq)
  }

  test("OUTER LATERAL VIEW keeps gram-less rows") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      """SELECT id, pos, gram FROM gram_gen_docs
        |LATERAL VIEW OUTER graft_gram_gen(text, 2) g AS pos, gram""".stripMargin)
      .count()
    assert(n == 5) // 3 + 1(null row for solo) + 1
  }
}
