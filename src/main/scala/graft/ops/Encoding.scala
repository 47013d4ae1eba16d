package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Byte-level encoding QA for crawl ingestion: UTF-8 validation and
  * U+FFFD-replacement repair per the WHATWG/Unicode "maximal subpart"
  * policy — the step between the WARC body (q274) and text processing,
  * where real crawl data arrives with truncated multi-byte sequences,
  * stray continuation bytes, overlong encodings, and mixed-charset
  * mojibake. A corpus pipeline that skips this either crashes downstream
  * tokenizers or silently corrupts documents.
  *
  * Implementation is the codec discipline (`ops/Multimodal.scala`): a
  * pure-JVM byte state machine run inside `mapPartitions` — payloads
  * never leave the executors, fail-soft by construction (every byte
  * sequence decodes to SOMETHING; there is no malformed input, only
  * replacement characters). Utf8PropertySpec pins the scanner against
  * `new String(bytes, UTF_8)` (the JDK decoder implements the same
  * Unicode TR recommendation) on random byte soup, plus the Unicode
  * standard's Table 3-8..3-11 boundary vectors.
  */
object Encoding {

  /** WHATWG "UTF-8 decode" scanner. Returns (codepoints, invalidSubparts)
    * where every maximal invalid subpart counts as ONE replacement
    * codepoint (Unicode §3.9 "U+FFFD substitution of maximal subparts"):
    * a truncated-but-valid prefix (e.g. E2 82 before a non-continuation)
    * is one subpart; a byte that can never start a sequence (C0, C1,
    * F5..FF, stray 80..BF) is its own subpart.
    */
  def scan(bytes: Array[Byte]): (Int, Int) = {
    var cp = 0; var bad = 0
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b < 0x80) { cp += 1; i += 1 }
      else if (b < 0xc2 || b > 0xf4) { cp += 1; bad += 1; i += 1 }
      else {
        // valid lead byte: how many continuations, and the constrained
        // range of the FIRST continuation (Unicode Table 3-7)
        val (need, lo, hi) =
          if (b < 0xe0) (1, 0x80, 0xbf)
          else if (b == 0xe0) (2, 0xa0, 0xbf)
          else if (b == 0xed) (2, 0x80, 0x9f)
          else if (b < 0xf0) (2, 0x80, 0xbf)
          else if (b == 0xf0) (3, 0x90, 0xbf)
          else if (b == 0xf4) (3, 0x80, 0x8f)
          else (3, 0x80, 0xbf)
        var k = 0
        var ok = true
        while (ok && k < need && i + 1 + k < n) {
          val c = bytes(i + 1 + k) & 0xff
          val (l, h) = if (k == 0) (lo, hi) else (0x80, 0xbf)
          if (c >= l && c <= h) k += 1 else ok = false
        }
        if (ok && k == need) { cp += 1; i += 1 + need } // complete sequence
        else { cp += 1; bad += 1; i += 1 + k } // maximal subpart = lead + k
      }
    }
    (cp, bad)
  }

  /** q280 — UTF-8 validation / repair audit over a synthesized corrupt
    * corpus. The fixture text is pure ASCII, so per-doc corruption injected
    * by `doc_id % 5` has a CLOSED-FORM effect the oracle replays in
    * arithmetic: class 0 clean; class 1 a stray continuation byte (1
    * subpart); class 2 an overlong `C0 AF` (two invalid bytes = 2
    * subparts — the classic path-traversal smuggling encoding, which a
    * validator MUST reject per Unicode §3.9); class 3 a truncated
    * three-byte lead `E2 82` (one maximal subpart); class 4 a valid
    * two-byte `C3 A9` (é — non-ASCII but well-formed, 0 subparts).
    *
    * Scale shape: map-only scan (mapPartitions state machine, no shuffle
    * before the bounded 5-row aggregate). At 100 TB this is the same
    * embarrassingly-parallel profile as the media codecs.
    */
  val q280Utf8Audit = GraftQuery(
    "q280_utf8_audit",
    (s, dir) => {
      import s.implicits._
      // the oracle's closed-form byte/codepoint counts assume a pure-ASCII
      // carrier with n_chars == length(text); ENFORCE that assumption with
      // a symmetric filter (octet_length == char length ⟺ ASCII under
      // UTF-8) instead of documenting it — a regenerated fixture with
      // non-ASCII docs now excludes them on BOTH sides rather than
      // silently diverging
      val scanned = Tables.documents(s, dir)
        .filter(octet_length(col("text")) === length(col("text")) &&
          col("n_chars") === length(col("text")))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          it.map { case (id, text) =>
            // guaranteed ASCII by the filter above; UTF_8 (identical on
            // ASCII) so even an impossible escapee can't collapse to '?'
            val base = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val inject: Array[Byte] = (id % 5) match {
              case 1 => Array(0x80.toByte)
              case 2 => Array(0xc0.toByte, 0xaf.toByte)
              case 3 => Array(0xe2.toByte, 0x82.toByte)
              case 4 => Array(0xc3.toByte, 0xa9.toByte)
              case _ => Array.emptyByteArray
            }
            // classes 1-3 splice mid-document (position bounded by length),
            // class 4 appends — position does not change subpart counts on
            // an ASCII carrier, it just exercises resync mid-stream
            val pos = math.min(base.length, 10)
            val bytes =
              if (id % 5 == 4) base ++ inject
              else base.take(pos) ++ inject ++ base.drop(pos)
            val (cp, bad) = scan(bytes)
            (id % 5, bytes.length.toLong, cp.toLong, bad.toLong)
          }
        }
        .toDF("class", "n_bytes", "n_cp", "n_invalid")
      scanned.groupBy("class")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_bytes").as("total_bytes"),
          sum("n_cp").as("total_codepoints"),
          sum("n_invalid").as("total_invalid"),
          sum(when(col("n_invalid") === 0L, 1L).otherwise(0L)).as("n_clean_docs"))
        .orderBy("class")
    },
    Some("""SELECT doc_id % 5 AS class, count(*) AS n_docs,
           |  CAST(sum(n_chars + CASE doc_id % 5 WHEN 0 THEN 0 ELSE 2 END
           |      - CASE doc_id % 5 WHEN 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS total_bytes,
           |  CAST(sum(n_chars + CASE doc_id % 5
           |      WHEN 0 THEN 0 WHEN 2 THEN 2 ELSE 1 END) AS BIGINT)
           |    AS total_codepoints,
           |  CAST(sum(CASE doc_id % 5
           |      WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS total_invalid,
           |  CAST(sum(CASE WHEN doc_id % 5 IN (0, 4) THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_clean_docs
           |FROM documents
           |WHERE strlen(text) = length(text) AND n_chars = length(text)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q280Utf8Audit)
}
