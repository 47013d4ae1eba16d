package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fixture invariants several oracle pairs silently rely on, so a
  * future fixture change fails HERE with a named reason instead of as an
  * opaque hash mismatch in the driver gate:
  *
  *   - `documents.text` is pure ASCII. The winnowing positions
  *     ([[graft.functions.GraftHashUtil.winnowPositions]]) are computed over
  *     Java UTF-16 units while the Spark/DuckDB `substring` that consumes
  *     them is codepoint-based — identical only when every char is ASCII.
  *     The q131/q140/q142 media oracles likewise equate payload BYTES with
  *     `ascii(substr(text, i, 1))` per char, which only holds single-byte.
  *   - `documents.text` never contains the `(`/`)` delimiters the BPE loop
  *     uses to mark symbol boundaries (q132/q133/q139 would mis-parse a
  *     literal paren as a boundary).
  */
class FixtureInvariantSpec extends AnyFunSuite with SparkSpec {

  private val dirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d + "/documents.parquet").exists())

  test("documents.text is pure ASCII at every available SF") {
    assert(dirs.nonEmpty, "no testdata fixtures found")
    dirs.foreach { dir =>
      val bad = Tables.documents(spark, dir)
        .filter(not(col("text").rlike("^[\\x00-\\x7F]*$")))
        .count()
      assert(bad == 0L,
        s"$dir: $bad documents contain non-ASCII text — the winnow-position " +
          "and media-decode oracles assume bytes == chars; recompute those " +
          "oracles over codepoints before accepting such fixtures")
    }
  }

  test("documents.text contains no parentheses (BPE symbol delimiters)") {
    dirs.foreach { dir =>
      val bad = Tables.documents(spark, dir)
        .filter(col("text").contains("(") || col("text").contains(")"))
        .count()
      assert(bad == 0L, s"$dir: $bad documents contain ( or ) — the BPE " +
        "delimited-sequence encoding (q132/q133/q139) would mis-parse them")
    }
  }
}
