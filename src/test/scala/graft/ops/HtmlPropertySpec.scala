package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.{SeededGen, SparkSpec}

/** Seeded property pin for q273: synthesize → extract recovers the
  * whitespace-normalized input byte-exactly for ARBITRARY content —
  * words full of HTML metacharacters, entity-looking tokens, quotes, and
  * non-ASCII — because content is entity-escaped on the way in and the
  * page structure is fixed. The chrome must never leak regardless of
  * content.
  */
class HtmlPropertySpec extends AnyFunSuite with SparkSpec with SeededGen {

  private val wordChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('&', '<', '>', '"', '\''),
    1 -> Gen.oneOf('#', ';', 'é', 'ß', '☃'),
    1 -> Gen.const('.'))

  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 9)
    cs <- Gen.listOfN(n, wordChar)
  } yield cs.mkString

  // entity-looking tokens must survive extraction literally
  private val trickyWord: Gen[String] =
    Gen.oneOf("&amp;", "&lt;", "&#32;", "<p>", "</p>", "<script>", "&quot;x")

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 40)
    ws <- Gen.listOfN(n, Gen.frequency(8 -> word, 2 -> trickyWord))
  } yield ws.mkString(" ")

  test("synthesize→extract round-trips arbitrary content byte-exactly") {
    import spark.implicits._
    val texts = sample(textGen, 80, 0x273fL).distinct
    val rows = texts.toDF("t")
      .select(col("t"),
        Html.extractMain(Html.synthesizePage(col("t"))).as("got"))
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    for ((t, got) <- rows)
      assert(got === t, s"round-trip mismatch for: $t")
  }

  test("chrome markers never leak for random content") {
    import spark.implicits._
    val texts = sample(textGen, 20, 0x273eadL).distinct
      // exclude samples that legitimately contain marker words as content
      .filterNot(t => Seq("subscribe", "home", "copyright").exists(t.contains))
    val got = texts.toDF("t")
      .select(Html.extractMain(Html.synthesizePage(col("t"))).as("g"))
      .as[String].collect()
    for (g <- got; marker <- Seq("subscribe today", "copyright example corp"))
      assert(!g.contains(marker), s"chrome '$marker' leaked: $g")
  }
}
