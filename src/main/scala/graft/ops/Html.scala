package graft.ops

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** HTML → main-content text extraction — the first step of every web-corpus
  * training-data pipeline (Common Crawl WARC → WET): strip the page chrome
  * (head/script/style/nav/header/footer/aside, comments), then classify the
  * remaining block-level segments by LINK DENSITY (the jusText/trafilatura
  * heuristic: a block whose characters are mostly anchor text is navigation,
  * not content) and keep only the low-density blocks, entity-decoded.
  *
  * Everything is built-in string/array/higher-order expressions over one
  * scan — no UDFs, no shuffle before the final sort — so at 100 TB the
  * extraction is a map-only pass with pushdown and whole-stage codegen
  * intact, exactly like the codec family (mapPartitions there, pure
  * expressions here because HTML is text, not binary).
  *
  * The fixture has no raw HTML, so q273 round-trips like the codecs do:
  * a deterministic page is SYNTHESIZED around each document (chrome +
  * nav + a link-dense inline ad + the text as 12-word paragraphs, with
  * every third intra-paragraph separator written as the `&#32;` character
  * reference so entity decoding is load-bearing), then extracted back.
  * Extraction must recover the original text exactly; the DuckDB oracle is
  * closed-form over the payload (paragraph count, one density-dropped
  * block, byte-identical round-trip) with no HTML logic at all.
  */
object Html {

  private val ParaWords = 12

  /** `&`→`&amp;` first so later entities are not double-escaped. */
  private val Entities = Seq(
    "&" -> "&amp;", "<" -> "&lt;", ">" -> "&gt;",
    "\"" -> "&quot;", "'" -> "&#39;")

  private[ops] def escapeHtml(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (raw, ent)) =>
      replace(acc, lit(raw), lit(ent))
    }

  /** Inverse of [[escapeHtml]] plus the `&#32;` space reference the
    * synthesizer emits; `&amp;` decoded LAST (the standard discipline —
    * decoding it first would re-interpret `&amp;lt;` as a tag opener).
    */
  private[ops] def unescapeHtml(c: Column): Column =
    (("&#32;" -> " ") +: Entities.tail.map(_.swap) :+ ("&amp;" -> "&"))
      .foldLeft(c) { case (acc, (ent, raw)) =>
        replace(acc, lit(ent), lit(raw))
      }

  /** Deterministic page around a whitespace-normalized text column: full
    * chrome (head with title/style/script — the script body contains a
    * literal `</p>` so anything that block-splits before pruning breaks),
    * a 5-link nav, the content as `<p>` paragraphs of [[ParaWords]] words
    * with a link-dense ad `<div>` after the first paragraph, a 3-link
    * aside, and a footer. Content is entity-escaped on the way in, so
    * hostile text (`<script>` in a document) can never inject markup.
    */
  private[ops] def synthesizePage(t: Column): Column = {
    val words = split(escapeHtml(t), " ")
    val nParas = ceil(size(words) / lit(ParaWords.toDouble)).cast("int")
    val paras = transform(sequence(lit(0), nParas - lit(1)), i => {
      val ws = slice(words, i * ParaWords + 1, lit(ParaWords))
      // separator before word j (j ≥ 1): every third one is the &#32;
      // character reference, so entity decode is exercised mid-content
      val body = array_join(
        transform(ws, (w, j) =>
          concat(
            when(j === 0, lit(""))
              .when(j % 3 === 0, lit("&#32;"))
              .otherwise(lit(" ")),
            w)),
        "")
      concat(lit("<p>"), body, lit("</p>"))
    })
    val ad = lit("<div class=\"ad\"><a href=\"/buy\">buy now</a> " +
      "<a href=\"/sub\">subscribe today</a></div>")
    val mainDiv = concat_ws("\n",
      lit("<div id=\"main\">"),
      element_at(paras, 1),
      ad,
      // length = size(paras) always covers "the rest"; an Int.MaxValue
      // literal overflows slice's start+length math and drops the tail
      array_join(slice(paras, lit(2), size(paras)), "\n"),
      lit("</div>"))
    concat_ws("\n",
      lit("<html><head><title>graft &amp; docs</title>"),
      lit("<style>p{margin:0;}</style>"),
      lit("<script>var decoy = \"</p><p>not content\";</script></head>"),
      lit("<body><!-- chrome starts -->"),
      lit("<header><h1>document</h1></header>"),
      lit("<nav><ul><li><a href=\"/\">home</a></li>" +
        "<li><a href=\"/docs\">docs</a></li><li><a href=\"/api\">api</a></li>" +
        "<li><a href=\"/blog\">blog</a></li>" +
        "<li><a href=\"/about\">about</a></li></ul></nav>"),
      mainDiv,
      lit("<aside><a href=\"/r1\">related one</a> " +
        "<a href=\"/r2\">related two</a> <a href=\"/r3\">related three</a>" +
        "</aside>"),
      lit("<footer><a href=\"/tos\">terms</a> " +
        "<a href=\"/privacy\">privacy</a> copyright example corp</footer>"),
      lit("</body></html>"))
  }

  /** Structural prune: subtrees that are chrome by TAG, independent of
    * their text (head incl. script/style, comments, nav/header/footer/
    * aside). Non-greedy dotall matches; the synthesizer never nests a
    * pruned tag inside itself (real extractors need a tree parser for
    * that — out of scope, documented).
    */
  private val PruneTags =
    Seq("(?s)<!--.*?-->", "(?s)<head>.*?</head>", "(?s)<script\\b.*?</script>",
      "(?s)<style\\b.*?</style>", "(?s)<nav\\b.*?</nav>",
      "(?s)<header\\b.*?</header>", "(?s)<footer\\b.*?</footer>",
      "(?s)<aside\\b.*?</aside>")

  /** Per-block annotation after pruning: visible text (tags stripped,
    * whitespace collapsed — entities still encoded so the measure can't be
    * confused by decoded markup), its length, and the total anchor-text
    * length. A block is CONTENT iff it has text and anchor chars are ≤ 20%
    * of it (integer compare — no float). Returns struct array.
    */
  private[ops] def annotatedBlocks(html: Column): Column = {
    val pruned = PruneTags.foldLeft(html)((c, p) => regexp_replace(c, p, " "))
    val blocks = split(pruned, "</(?:p|div|li|h[1-6])>")
    transform(blocks, b => {
      val txt = trim(regexp_replace(regexp_replace(b, "<[^>]*>", " "),
        "\\s+", " "))
      val anchors = array_join(
        regexp_extract_all(b, lit("(?s)<a\\b[^>]*>(.*?)</a>"), lit(1)), "")
      struct(txt.as("txt"), length(txt).as("len"),
        length(anchors).as("alen"))
    })
  }

  private def isContent(a: Column): Column =
    a("len") > 0 && a("alen") * 5 <= a("len")

  /** Main-content text: kept blocks joined with a single space, entity
    * decoded. Inverse of [[synthesizePage]] on normalized input.
    */
  private[ops] def extractMain(html: Column): Column =
    extractFromBlocks(annotatedBlocks(html))

  /** Same, over already-annotated blocks — callers that also need the
    * block stats reuse one annotation pass instead of re-running the
    * regex pipeline per consumer (HOF expressions sit outside
    * whole-stage codegen, so common-subexpression reuse isn't free).
    */
  private[ops] def extractFromBlocks(blocks: Column): Column =
    extractFromKept(filter(blocks, isContent(_)))

  /** Final assembly over the already-filtered content blocks. */
  private[ops] def extractFromKept(kept: Column): Column =
    unescapeHtml(array_join(transform(kept, _("txt")), " "))

  /** Boilerplate removal round-trip over every document: synthesize the
    * page, extract, and report per doc the kept/dropped block counts and
    * byte-exact recovery. Oracle is closed form over the raw text — the
    * content paragraphs are ⌈words/12⌉, exactly one non-empty block (the
    * ad) fails the density test, and extraction is lossless.
    */
  val q273HtmlExtract = GraftQuery(
    "q273_html_extract",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
        .withColumn("blocks", annotatedBlocks(synthesizePage(col("t"))))
        // kept is materialized once: n_kept and the extraction both read
        // the column instead of re-running the content filter per output
        .withColumn("kept", filter(col("blocks"), isContent(_)))
        .withColumn("extracted", extractFromKept(col("kept")))
      d.select(
        col("doc_id"),
        size(col("kept")).as("n_kept"),
        size(filter(col("blocks"),
          a => a("len") > 0 && !isContent(a))).as("n_dropped"),
        length(col("extracted")).as("extracted_chars"),
        (col("extracted") === col("t")).as("roundtrip_ok"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (
           |  SELECT doc_id, trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(CASE WHEN t = '' THEN 0
           |    ELSE ceil(len(string_split(t, ' ')) / 12.0) END AS INT)
           |    AS n_kept,
           |  1 AS n_dropped,
           |  CAST(length(t) AS INT) AS extracted_chars,
           |  TRUE AS roundtrip_ok
           |FROM d ORDER BY doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q273HtmlExtract)
}
