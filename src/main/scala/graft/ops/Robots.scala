package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Crawl-politeness filtering — robots.txt (RFC 9309, the Robots Exclusion
  * Protocol) evaluated as a distributed operator: the step between URL
  * frontier and fetch in a web-corpus pipeline, and the filter a re-crawl /
  * takedown audit runs over an EXISTING corpus ("which of our pages would
  * today's policies exclude?").
  *
  * Shape at 100 TB: robots files are parsed executor-side (one bounded rule
  * group per host), URLs join their host's chosen rule group (per-host rule
  * count is bounded ⇒ bounded join fan-out; host skew is AQE's skew-join
  * case), and rule matching is a codegen higher-order fold — RFC wildcards
  * (`*`, trailing `$`) evaluated by ordered segment search with
  * `startsWith`/`locate`, NOT a per-row regex compile. Longest-match
  * precedence (tie → Allow) is a lexicographic struct max inside a partial
  * aggregate. No UDFs, no driver state.
  */
object Robots {

  /** One parsed rule: the agent group it belongs to, allow/disallow, the
    * `*`-split pattern segments, whether `$`-anchored, and the raw pattern
    * length (RFC 9309's specificity measure).
    */
  final case class RobotsRule(host: String, agent: String, allow: Boolean,
      segs: Seq[String], anchored: Boolean, rlen: Int)

  object RobotsParser {
    /** Parse one robots.txt: comment stripping, multi-agent group headers,
      * Allow/Disallow lines (an empty Disallow value is "allow all" and
      * emits no rule), case-insensitive directives. Unknown directives
      * (Crawl-delay, Sitemap) are skipped. Fail-soft: malformed lines are
      * ignored, never thrown on. Scope notes vs RFC 9309: product-token
      * matching is exact (case-insensitive via the lowercased map) per
      * §2.2.1; multiple groups naming the same token merge naturally
      * (rules are emitted per agent); percent-encoding normalization of
      * rule paths and URLs is the caller's job (pair with q185's URL
      * canonicalization upstream).
      */
    def parse(host: String, txt: String): Seq[RobotsRule] = {
      val out = Seq.newBuilder[RobotsRule]
      var agents = List.empty[String] // the current group's User-agent set
      var inRules = false // a rule line closes the group's agent list
      for (raw <- txt.linesIterator) {
        val line = raw.takeWhile(_ != '#').trim
        val c = line.indexOf(':')
        if (c > 0) {
          val key = line.substring(0, c).trim.toLowerCase
          val value = line.substring(c + 1).trim
          key match {
            case "user-agent" =>
              agents = if (inRules) List(value.toLowerCase)
              else value.toLowerCase :: agents
              inRules = false
            case "allow" | "disallow" =>
              inRules = true
              if (value.nonEmpty) {
                val anchored = value.endsWith("$")
                val body = if (anchored) value.dropRight(1) else value
                val segs = body.split("\\*", -1).toSeq
                agents.foreach(a => out += RobotsRule(host, a,
                  key == "allow", segs, anchored, value.length))
              }
            case _ => () // Crawl-delay, Sitemap, unknown keys
          }
        }
      }
      out.result()
    }
  }

  /** Glob match of `path` against `*`-split segments: the first segment
    * must be a path prefix, later segments must appear in order (first-fit
    * ordered search — exact for existence), and an anchored pattern
    * additionally requires the last segment to END the path beyond the
    * preceding fold position. Pure built-ins, codegen-friendly.
    */
  private[ops] def globMatch(path: Column, segs: Column,
      anchored: Column): Column = {
    val first = element_at(segs, 1)
    val n = size(segs)
    def foldTo(upTo: Column): Column = aggregate(
      slice(segs, lit(2), greatest(upTo - 1, lit(0))),
      when(path.startsWith(first), length(first)).otherwise(lit(-1)),
      (pos, sg) => {
        val hit = call_function("locate", sg, path, pos + 1)
        when(pos < 0, lit(-1))
          .when(hit === 0, lit(-1))
          .otherwise(hit + length(sg) - 1)
      })
    val last = element_at(segs, n)
    when(!anchored, foldTo(n) >= 0)
      .when(n === 1, path === first)
      .otherwise(path.endsWith(last) &&
        foldTo(n - 1).between(lit(0), length(path) - length(last)))
  }

  /** The fixed crawl policy synthesized per host (in production this is
    * the fetched robots.txt; the DuckDB oracle hand-evaluates this exact
    * policy per URL kind). Exercises: specific-agent group selection over
    * `*` and over a stricter foreign-bot group, Allow overridden by a
    * LONGER Disallow, wildcard mid-pattern, `$` end anchor, comments.
    */
  private[ops] val PolicyTxt =
    """# graft crawl policy
      |User-agent: megabot
      |Disallow: /
      |
      |User-agent: graftbot
      |Allow: /p/
      |Disallow: /p/*/draft
      |Disallow: /private/
      |Disallow: /*.pdf$
      |
      |User-agent: *
      |Disallow: /p/
      |Disallow: /private/
      |""".stripMargin

  val CrawlerAgent = "graftbot"

  /** Robots evaluation over a synthetic URL frontier: six deterministic
    * path kinds per document (private tree, draft under an allowed prefix,
    * `$`-anchored pdf, unruled page, two allowed article paths). Output
    * per host: url counts, allowed/blocked, and `n_overridden` — URLs
    * where an Allow rule matched but a more specific Disallow won, the
    * RFC 9309 precedence case.
    */
  val q275RobotsFilter = GraftQuery(
    "q275_robots_filter",
    (s, dir) => {
      import s.implicits._
      val pid = col("doc_id").cast("string")
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(col("source"), lit(".example.com")).as("host"),
          (col("doc_id") % 6).as("kind"))
        .withColumn("path",
          when(col("kind") === 0, concat(lit("/private/doc"), pid))
            .when(col("kind") === 1, concat(lit("/p/doc"), pid, lit("/draft")))
            .when(col("kind") === 2, concat(lit("/files/doc"), pid, lit(".pdf")))
            .when(col("kind") === 3, lit("/about"))
            .otherwise(concat(lit("/p/doc"), pid)))
      val rulesAll = urls.select("host").distinct()
        .withColumn("robots", lit(PolicyTxt))
        .as[(String, String)]
        .flatMap { case (h, txt) => RobotsParser.parse(h, txt) }
        .toDF()
      // RFC group selection: the crawler's own token beats the `*` group;
      // hosts where neither exists contribute no rules (allow by default)
      val pri = when(col("agent") === CrawlerAgent, 2)
        .when(col("agent") === "*", 1).otherwise(0)
      val chosen = rulesAll.withColumn("pri", pri)
        .filter(col("pri") > 0)
      val best = chosen.groupBy("host").agg(max(col("pri")).as("best_pri"))
      val rules = chosen.join(best, "host")
        .filter(col("pri") === col("best_pri"))
        .drop("pri", "best_pri", "agent")
      val matched = urls.join(rules, Seq("host"), "left")
        .withColumn("m", globMatch(col("path"), col("segs"), col("anchored")))
      // longest pattern wins, tie → Allow: lexicographic max over
      // (pattern length, allow) inside a partial agg — no window, no sort
      val dec = matched.groupBy("doc_id", "host")
        .agg(
          max(when(col("m"), struct(col("rlen"),
            col("allow").cast("int").as("a")))).as("best"),
          max(when(col("m") && col("allow"), 1).otherwise(0)).as("am"))
        .withColumn("allowed", col("best").isNull || col("best.a") === 1)
      dec.groupBy("host")
        .agg(
          count(lit(1)).as("n_urls"),
          sum(when(col("allowed"), 1L).otherwise(0L)).as("n_allowed"),
          sum(when(!col("allowed"), 1L).otherwise(0L)).as("n_blocked"),
          sum(when(col("am") === 1 && !col("allowed"), 1L).otherwise(0L))
            .as("n_overridden"))
        .orderBy("host")
    },
    // the oracle hand-evaluates PolicyTxt for the graftbot group per kind:
    // 0 /private/ blocked, 1 draft blocked by the LONGER Disallow over the
    // matching Allow (the overridden count), 2 blocked by the $ anchor,
    // 3 unruled → allowed, 4/5 allowed by Allow /p/
    Some("""WITH u AS (
           |  SELECT doc_id, source || '.example.com' AS host,
           |    doc_id % 6 AS kind
           |  FROM documents)
           |SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
           |  CAST(sum(CASE WHEN kind >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_allowed,
           |  CAST(sum(CASE WHEN kind < 3 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_blocked,
           |  CAST(sum(CASE WHEN kind = 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_overridden
           |FROM u GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Sitemap-based frontier discovery — the complement of [[q275RobotsFilter]]
    * (robots says what NOT to fetch; sitemaps advertise what exists): per
    * host, URL entries with `<lastmod>` dates are serialized into sitemap
    * FILES capped at a fixed entry count (the protocol's 50k-URL cap is
    * why real sitemaps are indexes of bounded files — file count grows
    * with the corpus, per-file state stays bounded, the q274 discipline),
    * parsed back through Spark 4's built-in `from_xml` (q272 covers the
    * xml SOURCE; this is the column function over synthesized markup),
    * and rolled up into the per-host discovery summary a crawl scheduler
    * consumes: url/file counts and the lastmod recency split that decides
    * re-crawl priority.
    *
    * Scale shape: the per-(host, bucket) collect_list is bounded at the
    * bucket width regardless of SF (buckets come from doc_id ranges, not
    * a per-host row_number — no per-host window over unbounded rows);
    * parsing is map-side; the rollup is one partial agg. The oracle is
    * closed form over `documents` (counts, bucket cardinality, date
    * arithmetic on doc_id).
    */
  val q276SitemapFrontier = GraftQuery(
    "q276_sitemap_frontier",
    (s, dir) => {
      val pid = col("doc_id").cast("string")
      val urls = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(col("source"), lit(".example.com")).as("host"),
          (col("doc_id") % 6).as("kind"))
        .withColumn("path",
          when(col("kind") === 0, concat(lit("/private/doc"), pid))
            .when(col("kind") === 1, concat(lit("/p/doc"), pid, lit("/draft")))
            .when(col("kind") === 2, concat(lit("/files/doc"), pid, lit(".pdf")))
            .when(col("kind") === 3, lit("/about"))
            .otherwise(concat(lit("/p/doc"), pid)))
        .withColumn("lastmod",
          date_add(to_date(lit("2026-01-01")), (col("doc_id") % 28).cast("int")))
      val entry = concat(
        lit("<url><loc>https://"), col("host"), col("path"),
        lit("</loc><lastmod>"), date_format(col("lastmod"), "yyyy-MM-dd"),
        lit("</lastmod></url>"))
      // fixed-width doc_id buckets bound every sitemap file at ≤256
      // entries at ANY scale factor — the 50k-cap discipline in miniature
      val files = urls
        .withColumn("e", entry)
        .groupBy(col("host"), (col("doc_id") / 256).cast("long").as("file_no"))
        .agg(concat(lit("<urlset>"),
          array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("e")))),
            _("e")), ""),
          lit("</urlset>")).as("xml"))
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "url ARRAY<STRUCT<loc: STRING, lastmod: DATE>>")
      val parsed = files
        .withColumn("p", from_xml(col("xml"), schema))
        .select(col("host"), col("file_no"), explode(col("p.url")).as("u"))
        .select(col("host"), col("file_no"),
          col("u.loc").as("loc"), col("u.lastmod").as("lastmod"))
      parsed.groupBy("host")
        .agg(
          count(lit(1)).as("n_urls"),
          countDistinct(col("file_no")).as("n_files"),
          min(col("lastmod")).as("oldest"),
          max(col("lastmod")).as("newest"),
          sum(when(col("lastmod") >= to_date(lit("2026-01-15")), 1L)
            .otherwise(0L)).as("n_recent"))
        .orderBy("host")
    },
    Some("""SELECT source || '.example.com' AS host,
           |  CAST(count(*) AS BIGINT) AS n_urls,
           |  CAST(count(DISTINCT doc_id // 256) AS BIGINT) AS n_files,
           |  min(DATE '2026-01-01' + CAST(doc_id % 28 AS INT)) AS oldest,
           |  max(DATE '2026-01-01' + CAST(doc_id % 28 AS INT)) AS newest,
           |  CAST(sum(CASE WHEN doc_id % 28 >= 14 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_recent
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q275RobotsFilter, q276SitemapFrontier)
}
