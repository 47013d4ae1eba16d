package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class TextSentencesSpec extends AnyFunSuite with SparkSpec {

  test("sentence splitting on punctuation+space boundaries, empties dropped") {
    import spark.implicits._
    val df = Seq(
      "One sentence. Two sentences! Three? Yes.",
      "no punctuation at all",
      "trailing. ",
      ""
    ).toDF("text")
    val got = df.select(Text.sentences(col("text")).as("s"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("One sentence", "Two sentences", "Three", "Yes."))
    assert(got(1) == List("no punctuation at all"))
    assert(got(2) == List("trailing"))
    assert(got(3) == Nil)
  }
}
