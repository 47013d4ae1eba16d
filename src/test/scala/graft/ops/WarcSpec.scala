package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Warc.WarcCodec

/** q274's WARC container parser: Content-Length framing (not version-line
  * scanning), resync after a corrupt record, and the record writer /
  * parser round-trip.
  */
class WarcSpec extends AnyFunSuite {

  private def resp(id: Int, body: String): Array[Byte] =
    WarcCodec.record(
      Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> s"https://corpus.example/doc/$id"),
      body.getBytes("UTF-8"))

  private def blob(recs: Array[Byte]*): Array[Byte] =
    recs.reduce(_ ++ _)

  test("writer/parser round-trip preserves headers and body bytes") {
    val recs = WarcCodec.parseRecords(blob(
      resp(1, "hello world"), resp(2, "second body")))
    assert(recs.size === 2)
    assert(recs(0).headers("warc-type") === "response")
    assert(recs(0).headers("warc-target-uri") === "https://corpus.example/doc/1")
    assert(new String(recs(0).body, "UTF-8") === "hello world")
    assert(new String(recs(1).body, "UTF-8") === "second body")
    assert(recs(0).headers("content-length") === "11")
  }

  test("length framing is load-bearing: a WARC/1.0 line inside a body is data") {
    // the decoy is exactly what q274 plants in every HTTP header block: a
    // line-start version string inside Content-Length-counted bytes
    val decoyBody = "HTTP/1.1 200 OK\r\nWARC/1.0\r\n\r\n<html>page</html>"
    val recs = WarcCodec.parseRecords(blob(
      resp(1, decoyBody), resp(2, "after the decoy")))
    assert(recs.size === 2, "line scanning would shear the decoy record")
    assert(new String(recs(0).body, "UTF-8") === decoyBody)
    assert(new String(recs(1).body, "UTF-8") === "after the decoy")
  }

  test("a corrupt Content-Length abandons one record and resyncs to the rest") {
    val bad = new String(resp(1, "good body"), "US-ASCII")
      .replace("Content-Length: 9", "Content-Length: 9x")
      .getBytes("US-ASCII")
    val recs = WarcCodec.parseRecords(blob(bad, resp(2, "survivor")))
    assert(recs.map(r => new String(r.body, "UTF-8")) === Vector("survivor"))
  }

  test("an oversized Content-Length cannot read past the blob") {
    val lying = WarcCodec.record(Seq("WARC-Type" -> "response"), Array[Byte]())
    val huge = new String(lying, "US-ASCII")
      .replace("Content-Length: 0", "Content-Length: 999999999")
      .getBytes("US-ASCII")
    val recs = WarcCodec.parseRecords(blob(huge, resp(2, "tail")))
    assert(recs.map(r => new String(r.body, "UTF-8")) === Vector("tail"))
  }

  test("a corrupted record terminator costs at most its own record") {
    // flipping a terminator CRLF byte destroys the "\r\n" immediately
    // before the NEXT record's version line — resync must still find that
    // record (it matches the bare version line, not "\r\n" + version)
    val r1 = resp(1, "first")
    val whole = blob(r1, resp(2, "second"), resp(3, "third"))
    for (off <- Seq(r1.length - 4, r1.length - 3, r1.length - 2, r1.length - 1)) {
      val mut = whole.clone()
      mut(off) = 'X'.toByte
      val got = WarcCodec.parseRecords(mut).map(r => new String(r.body, "UTF-8"))
      assert(got.contains("second") && got.contains("third"),
        s"records after a terminator flip at $off must survive: $got")
    }
  }

  test("a Content-Length that swallows the terminator still spares the next record") {
    // corrupting '5' -> '9' makes record 1's body consume its own 4-byte
    // terminator, landing the cursor EXACTLY on record 2's intact version
    // line — resync must accept the current position, not scan past it
    val bad = new String(resp(1, "12345"), "US-ASCII")
      .replace("Content-Length: 5", "Content-Length: 9")
      .getBytes("US-ASCII")
    val recs = WarcCodec.parseRecords(blob(bad, resp(2, "second"), resp(3, "third")))
    val bodies = recs.map(r => new String(r.body, "UTF-8"))
    assert(bodies.contains("second") && bodies.contains("third"),
      s"records after a length-swallowed terminator must survive: $bodies")
  }

  test("empty and garbage blobs parse to zero records without throwing") {
    assert(WarcCodec.parseRecords(Array.empty).isEmpty)
    assert(WarcCodec.parseRecords("no records here at all".getBytes).isEmpty)
    assert(WarcCodec.parseRecords("WARC/1.0\r\n".getBytes).isEmpty)
  }
}
