package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.ops.Robots.{RobotsParser, RobotsRule}

/** q275's robots.txt parser and glob matcher: RFC 9309 group selection,
  * wildcard/`$` pattern semantics, and longest-match precedence with the
  * Allow tie-break.
  */
class RobotsSpec extends AnyFunSuite with SparkSpec {

  test("parser: comments, multi-agent groups, empty Disallow, unknown keys") {
    val txt =
      """# policy
        |User-agent: a
        |User-agent: b
        |Disallow: /x/   # trailing comment
        |Disallow:
        |Crawl-delay: 10
        |Sitemap: https://h/sitemap.xml
        |
        |User-agent: *
        |Allow: /
        |""".stripMargin
    val rules = RobotsParser.parse("h", txt)
    // /x/ lands on BOTH agents of the group; the empty Disallow emits none
    assert(rules.count(r => !r.allow && r.segs == Seq("/x/")) === 2)
    assert(rules.map(_.agent).toSet === Set("a", "b", "*"))
    assert(rules.count(_.allow) === 1)
  }

  test("parser: a rule line closes the agent list; next User-agent starts fresh") {
    val txt =
      """User-agent: a
        |Disallow: /one
        |User-agent: b
        |Disallow: /two
        |""".stripMargin
    val rules = RobotsParser.parse("h", txt)
    assert(rules.collect { case r if r.agent == "a" => r.segs.head } === Seq("/one"))
    assert(rules.collect { case r if r.agent == "b" => r.segs.head } === Seq("/two"))
  }

  private def matches(pattern: String, paths: String*): Seq[Boolean] = {
    import spark.implicits._
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    val segs = body.split("\\*", -1).toSeq
    paths.toDF("path")
      .select(Robots.globMatch(col("path"),
        typedLit(segs), lit(anchored)).as("m"))
      .as[Boolean].collect().toSeq
  }

  test("glob matcher: prefix, mid-pattern wildcard, $ anchor, exact anchor") {
    assert(matches("/p/", "/p/doc1", "/q/doc1", "/p/") === Seq(true, false, true))
    assert(matches("/p/*/draft", "/p/doc1/draft", "/p/doc1/draftx",
      "/p/draft", "/x/doc1/draft") === Seq(true, true, false, false))
    assert(matches("/*.pdf$", "/files/a.pdf", "/files/a.pdfx", "/a.pdf")
      === Seq(true, false, true))
    assert(matches("/about$", "/about", "/about/us") === Seq(true, false))
    assert(matches("/", "/anything", "/") === Seq(true, true))
    // ordered-search requirement: both segments must appear IN ORDER
    assert(matches("/a*/b*/c", "/a/b/c", "/a/c/b") === Seq(true, false))
  }

  test("q276: sitemap files are bounded and from_xml recovers every entry") {
    import spark.implicits._
    val out = Robots.q276SitemapFrontier.fn(spark, "/root/testdata/sf0.001")
      .select("host", "n_urls", "n_files").as[(String, Long, Long)].collect()
    assert(out.nonEmpty)
    // every host's file count must satisfy the ≤256-entries-per-file cap:
    // n_files >= ceil(n_urls / 256) — the bound that makes the
    // collect_list safe at any scale factor
    for ((h, urls, fs) <- out)
      assert(fs >= (urls + 255) / 256, s"$h: $urls urls in $fs files")
    // totals must cover the whole fixture: nothing dropped in the
    // serialize → from_xml → explode round-trip
    val total = out.map(_._2).sum
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(total === docs)
  }

  test("precedence: longest pattern wins, tie goes to Allow") {
    import spark.implicits._
    // the q275 aggregation shape on a hand-checkable rule set
    val rules = Seq(
      RobotsRule("h", "*", allow = true, Seq("/p/"), anchored = false, 3),
      RobotsRule("h", "*", allow = false, Seq("/p/", "/draft"), anchored = false, 10),
      RobotsRule("h", "*", allow = false, Seq("/p/"), anchored = false, 3))
      .toDF()
    val urls = Seq("/p/doc1/draft", "/p/doc1", "/elsewhere").toDF("path")
    val out = urls.crossJoin(rules)
      .withColumn("m", Robots.globMatch(col("path"), col("segs"), col("anchored")))
      .groupBy("path")
      .agg(max(when(col("m"),
        struct(col("rlen"), col("allow").cast("int").as("a")))).as("best"))
      .withColumn("allowed", col("best").isNull || col("best.a") === 1)
      .select("path", "allowed").as[(String, Boolean)].collect().toMap
    assert(out("/p/doc1/draft") === false, "longer Disallow beats shorter Allow")
    assert(out("/p/doc1") === true, "equal-length tie goes to Allow")
    assert(out("/elsewhere") === true, "no matching rule means allowed")
  }
}
