package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ShingleHashesSpec extends AnyFunSuite with SparkSpec {

  private def hofShingles(nibbles: Int) = {
    val t = split(col("text"), " ")
    val g = when(size(t) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
    transform(g, s => conv(substring(md5(s), 1, nibbles), 16, 10).cast("long"))
  }

  test("fused word-3-gram hashes equal the HOF chain (8 and 15 nibbles)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", // <3 tokens -> empty
      "x y z",
      "dup dup dup dup dup", // repeated grams collapse at string level
      "trailing space " // split(" ",-1) keeps the empty trailing token
    ).toDF("text")
    for (nib <- Seq(8, 15)) {
      val rows = df.select(
        GraftFunctions.shingle3(col("text"), nib).as("fused"),
        hofShingles(nib).as("ref")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"nib=$nib fused=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
      }
    }
  }

  test("fused char-4-gram hashes equal the HOF chain") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val hof = transform(
      when(length(col("text")) < 4, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), length(col("text")) - 3),
          i => substring(col("text"), i, lit(4))))),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))
    val df = Seq("abcdefgh", "abc", "aaaaaa", "wiederholung und wiederholung").toDF("text")
    val rows = df.select(
      GraftFunctions.charGrams(col("text"), 4, 8).as("fused"), hof.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"fused=${r.getSeq[Long](0)} ref=${r.getSeq[Long](1)}")
    }
  }

  test("fused word-grams equal the HOF chain (duplicates kept)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val t = split(col("text"), " ")
    val hof = when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - 2),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2))))
    val df = Seq(
      "a b c a b c", // duplicate bigrams must survive
      "solo",
      "x y",
      "trailing "
    ).toDF("text")
    val rows = df.select(
      GraftFunctions.wordGrams(col("text"), 2).as("fused"), hof.as("ref")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"fused=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
    }
  }

  test("null text yields null; SQL registration works") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_shingle3(CAST(NULL AS STRING), 8) n, graft_shingle3('a b c d', 8) v")
      .first()
    assert(r.isNullAt(0))
    assert(r.getSeq[Long](1).length == 2)
  }
}
