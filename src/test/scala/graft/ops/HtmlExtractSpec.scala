package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q273's HTML synthesize → boilerplate-strip → extract pipeline. The
  * invariant that makes the oracle closed-form: extraction recovers the
  * whitespace-normalized input byte-exactly, for ANY text — including text
  * containing HTML metacharacters (escaped on synthesis, so content can
  * never inject markup) — while the chrome (nav/aside/footer/ad) never
  * leaks into the output.
  */
class HtmlExtractSpec extends AnyFunSuite with SparkSpec {

  private def roundTrip(texts: Seq[String]): Seq[(String, String, String)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(
        trim(regexp_replace(col("text"), "\\s+", " ")).as("t"),
        Html.synthesizePage(
          trim(regexp_replace(col("text"), "\\s+", " "))).as("page"))
      .select(col("t"), col("page"), Html.extractMain(col("page")).as("got"))
      .as[(String, String, String)].collect().toSeq
  }

  test("extraction recovers the exact input for plain and hostile text") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again and again",
      "one two three four five six seven eight nine ten eleven twelve thirteen",
      "short text",
      // HTML metacharacters in content: must be escaped, never parsed
      "a < b & c > d \"quoted\" it's <script>alert(1)</script> done",
      // an entity-looking token in the content must survive literally
      "literal &amp; token and &#32; reference stay as typed",
      "   leading   and   trailing   whitespace   collapses   ",
      // degenerate documents: extraction must yield the normalized form
      "", "   ")
    for ((t, _, got) <- roundTrip(texts))
      assert(got === t, s"round-trip mismatch for: $t")
  }

  test("chrome never leaks: nav/aside/footer/ad text absent from output") {
    val Seq((_, page, got)) =
      roundTrip(Seq("alpha beta gamma delta epsilon zeta eta theta"))
    for (chrome <- Seq("home", "docs", "api", "blog", "about", "related",
        "terms", "privacy", "copyright", "buy now", "subscribe", "document",
        "not content"))
      assert(!got.contains(chrome), s"chrome '$chrome' leaked into: $got")
    // and the hazards are genuinely present in the synthesized page
    assert(page.contains("<nav>") && page.contains("</p><p>not content"))
  }

  test("entity decode is load-bearing: &#32; separators appear in the page") {
    val Seq((t, page, got)) = roundTrip(Seq(
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"))
    assert(page.contains("&#32;"), "synthesizer must emit &#32; separators")
    assert(got === t)
  }

  test("the inline ad is the one density-dropped block") {
    import spark.implicits._
    val d = Seq("alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .toDF("t")
      .select(Html.annotatedBlocks(Html.synthesizePage(col("t"))).as("b"))
      .select(
        size(filter(col("b"), a => a("len") > 0 && a("alen") * 5 > a("len")))
          .as("dropped"),
        expr("filter(b, a -> a.len > 0 AND a.alen * 5 > a.len)[0].txt")
          .as("txt"))
      .as[(Int, String)].head()
    assert(d._1 === 1)
    assert(d._2 === "buy now subscribe today")
  }

  test("q273 is green on the sf0.001 fixture: every doc round-trips") {
    import spark.implicits._
    val out = Html.q273HtmlExtract.fn(spark, "/root/testdata/sf0.001")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        // empty-doc guard mirrors the oracle: split('') is [''], not []
        when(trim(regexp_replace(col("text"), "\\s+", " ")) === "", 0)
          .otherwise(ceil(
            size(split(trim(regexp_replace(col("text"), "\\s+", " ")), " "))
              / lit(12.0)).cast("int")).as("want_kept"))
    val rows = out.join(docs, "doc_id")
      .select(col("roundtrip_ok"), col("n_dropped"),
        (col("n_kept") === col("want_kept")).as("kept_ok"))
      .as[(Boolean, Int, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1), "every document must round-trip byte-exactly")
    assert(rows.forall(_._2 == 1), "exactly the ad block is density-dropped")
    assert(rows.forall(_._3), "kept blocks = ceil(words/12) content paras")
  }
}
