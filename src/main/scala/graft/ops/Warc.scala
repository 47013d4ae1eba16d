package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** WARC (Web ARChive, ISO 28500 / the Common Crawl container) ingestion —
  * the step BEFORE q273's HTML extraction in a real web-corpus pipeline:
  * crawls land as multi-record WARC files (a `warcinfo` record followed by
  * `response` records, each an HTTP response wrapping the page HTML), and
  * the engine must frame records by the `Content-Length` header, NOT by
  * scanning for the version line — page bodies may legally contain
  * `WARC/1.0` at a line start, and only length framing sails past it.
  *
  * [[WarcCodec]] follows the media-codec discipline (`ops/Multimodal.scala`):
  * pure-JVM byte-level parser, fail-soft on hostile bytes (skips forward to
  * the next record boundary, never throws or hangs — CodecFuzzSpec flips
  * every byte), runs executor-side in mapPartitions.
  */
object Warc {

  object WarcCodec {
    val Version = "WARC/1.0"
    private val Crlf = "\r\n".getBytes("US-ASCII")

    /** One parsed record: lowercased header map + raw body bytes. */
    final case class WarcRecord(headers: Map[String, String], body: Array[Byte])

    /** Serialize one record: version line, headers, blank line, body,
      * record terminator (two CRLFs). `Content-Length` is appended from
      * the actual body byte count — callers never supply it.
      */
    def record(headers: Seq[(String, String)], body: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder(Version).append("\r\n")
      headers.foreach { case (k, v) => sb.append(k).append(": ").append(v).append("\r\n") }
      sb.append("Content-Length: ").append(body.length).append("\r\n\r\n")
      val head = sb.toString.getBytes("US-ASCII")
      val out = new Array[Byte](head.length + body.length + 4)
      System.arraycopy(head, 0, out, 0, head.length)
      System.arraycopy(body, 0, out, head.length, body.length)
      System.arraycopy(Crlf, 0, out, head.length + body.length, 2)
      System.arraycopy(Crlf, 0, out, head.length + body.length + 2, 2)
      out
    }

    private def startsWith(p: Array[Byte], i: Int, s: String): Boolean =
      i >= 0 && i + s.length <= p.length &&
        s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** Index of the next `\r\n` at or after `from`, or -1. */
    private def eol(p: Array[Byte], from: Int): Int = {
      var i = math.max(0, from)
      while (i + 1 < p.length) {
        if (p(i) == '\r' && p(i + 1) == '\n') return i
        i += 1
      }
      -1
    }

    /** Parse every well-formed record in a WARC blob. Fail-soft: a corrupt
      * record (bad version line, malformed header, unparseable or
      * out-of-range Content-Length, missing terminator) is abandoned and
      * parsing RESYNCS at the next `WARC/1.0` version line AT OR AFTER the
      * failure point, so one flipped byte costs at most its own record —
      * the remaining records still parse. Never throws; every path
      * advances the cursor, so hostile bytes can't hang it.
      */
    def parseRecords(blob: Array[Byte]): Vector[WarcRecord] = {
      val out = Vector.newBuilder[WarcRecord]
      var i = 0
      // resync target is the bare version line, NOT "\r\n" + version: when
      // the corruption hit the CRLF just before a healthy record's version
      // line (e.g. the previous record's terminator), requiring the prefix
      // would skip that record too — one flipped byte must cost at most
      // its own record. The scan starts AT `from`, not past it: a corrupt
      // Content-Length can land the cursor exactly on the next intact
      // version line (body swallowed its own terminator), and skipping
      // that position would drop the healthy record. Every caller passes a
      // `from` beyond the position it failed at, so the loop still always
      // advances. A decoy version line inside a body can still catch a
      // post-corruption resync (wrong-but-bounded, fail-soft); the clean
      // path never resyncs, so framing integrity is unaffected.
      def resync(from: Int): Int = {
        var j = math.max(from, 0)
        while (j < blob.length) {
          if (startsWith(blob, j, Version + "\r\n")) return j
          j += 1
        }
        blob.length
      }
      while (i < blob.length) {
        if (!startsWith(blob, i, Version + "\r\n")) { i = resync(i) }
        else {
          var h = i + Version.length + 2
          var headers = Map.empty[String, String]
          var ok = true
          var done = false
          while (ok && !done) {
            val e = eol(blob, h)
            if (e < 0) ok = false
            else if (e == h) { h = e + 2; done = true } // blank line → body
            else {
              val line = new String(blob, h, e - h, "US-ASCII")
              val c = line.indexOf(':')
              if (c <= 0) ok = false
              else {
                headers += (line.substring(0, c).trim.toLowerCase ->
                  line.substring(c + 1).trim)
                h = e + 2
              }
            }
          }
          val len = headers.get("content-length")
            .flatMap(v => scala.util.Try(v.toLong).toOption)
          if (!ok || len.isEmpty || len.get < 0 || len.get > blob.length - h) {
            i = resync(h)
          } else {
            val n = len.get.toInt
            out += WarcRecord(headers, java.util.Arrays.copyOfRange(blob, h, h + n))
            // record terminator: two CRLFs; tolerate truncation at EOF
            i = h + n
            var eaten = 0
            while (eaten < 2 && startsWith(blob, i, "\r\n")) { i += 2; eaten += 1 }
            if (eaten < 2 && i < blob.length) i = resync(i)
          }
        }
      }
      out.result()
    }
  }

  /** The WARC → WET pipeline end to end, SF-scale shaped: documents are
    * packed 64 to a shard (file COUNT grows with the corpus, per-file
    * content stays bounded — Common Crawl's fixed-size-file discipline),
    * each shard serialized as a real WARC blob (warcinfo + one HTTP
    * `response` record per page, `Content-Length`-framed, with a decoy
    * `WARC/1.0` line INSIDE each response body so line-scanning framing
    * would shear every record), parsed back executor-side by
    * [[WarcCodec]], and every page pushed through q273's extractor. The
    * oracle is closed form: every record survives, every page round-trips
    * to its source text.
    */
  /** One serialized `response` record through [[WarcCodec.record]] — the
    * SAME writer the property tests pin, with byte-correct Content-Length.
    * The HTTP header block carries the decoy: a line that IS the WARC
    * version string at line start, inside Content-Length-counted body.
    */
  private[ops] def responseRecord(docId: Long, html: String): String = {
    val body = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "WARC/1.0\r\n\r\n" + html).getBytes("UTF-8")
    new String(WarcCodec.record(Seq(
      "WARC-Type" -> "response",
      "WARC-Date" -> "2026-01-01T00:00:00Z",
      "WARC-Record-ID" -> s"<urn:graft:$docId>",
      "WARC-Target-URI" -> s"https://corpus.example/doc/$docId"), body),
      "UTF-8")
  }

  val q274WarcWet = GraftQuery(
    "q274_warc_wet",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
      // record assembly is a typed map so the page-synthesis expression
      // tree evaluates ONCE per row (embedding it in a concat alongside
      // its own octet_length re-ran the whole HOF pipeline per reference)
      val recs = docs
        .withColumn("page", Html.synthesizePage(col("t")))
        .select(col("doc_id"), col("page"))
        .as[(Long, String)]
        .map { case (id, page) => (id / 64, id, responseRecord(id, page)) }
        .toDF("shard", "doc_id", "rec")
      val info = "WARC/1.0\r\nWARC-Type: warcinfo\r\n" +
        "WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: 24\r\n\r\n" +
        "software: graft-engine\r\n\r\n\r\n"
      // shard = 64 records per file: collect_list is BOUNDED at 64 rows
      // (the q121 discipline); array_sort on (doc_id, rec) pins record order
      val shards = recs
        .groupBy("shard")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          _("rec")), "").as("body"))
        .select(col("shard"),
          concat(lit(info), col("body")).as("blob"))
      val parsed = shards.select(col("shard"), col("blob"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (shard, blob) =>
          WarcCodec.parseRecords(blob.getBytes("UTF-8")).map { r =>
            val wtype = r.headers.getOrElse("warc-type", "")
            val uri = r.headers.getOrElse("warc-target-uri", "")
            val body = new String(r.body, "UTF-8")
            // response body = HTTP headers, blank line, then the page
            val html = body.indexOf("\r\n\r\n") match {
              case -1 => ""
              case k  => body.substring(k + 4)
            }
            val docId = "/doc/(\\d+)$".r.findFirstMatchIn(uri)
              .map(_.group(1).toLong).getOrElse(-1L)
            (shard, wtype, docId, html)
          }
        }).toDF("shard", "wtype", "doc_id", "html")
      // round-trip check joins 32-char digests, not full text — the
      // shuffle carries hashes, never the corpus twice
      val ext = parsed
        .withColumn("ext_md5", md5(to_binary(
          Html.extractMain(col("html")), lit("utf-8"))))
        .join(docs.select(col("doc_id"),
          md5(to_binary(col("t"), lit("utf-8"))).as("t_md5")),
          Seq("doc_id"), "left")
      ext.groupBy("shard")
        .agg(
          sum(when(col("wtype") === "response", 1L).otherwise(0L))
            .as("n_records"),
          (sum(when(col("wtype") === "warcinfo", 1L).otherwise(0L)) === 1L)
            .as("warcinfo_ok"),
          sum(when(col("ext_md5") === col("t_md5"), 1L).otherwise(0L))
            .as("n_roundtrip"))
        .orderBy("shard")
    },
    Some("""SELECT doc_id // 64 AS shard,
           |  CAST(count(*) AS BIGINT) AS n_records,
           |  TRUE AS warcinfo_ok,
           |  CAST(count(*) AS BIGINT) AS n_roundtrip
           |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q274WarcWet)
}
