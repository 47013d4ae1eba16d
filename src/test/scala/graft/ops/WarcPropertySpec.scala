package graft.ops

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SeededGen
import graft.ops.Warc.WarcCodec

/** Seeded property tests for the WARC writer/parser pair: arbitrary header
  * sets and bodies — including bodies full of CRLFs, version strings, and
  * high bytes — must round-trip record-for-record through a concatenated
  * blob, because Content-Length framing never looks at the body. Plus the
  * fail-soft guarantee under random single-byte corruption: parsing never
  * throws and never returns MORE records than were written.
  */
class WarcPropertySpec extends AnyFunSuite with SeededGen {

  private val headerName: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield "X-" + cs.mkString

  private val headerValue: Gen[String] = for {
    n <- Gen.chooseNum(0, 30)
    // no CR/LF (header values are line-bound); otherwise printable ASCII
    cs <- Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar))
  } yield cs.mkString.trim

  private val body: Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, 400)
    // raw bytes, biased toward the parser's own sentinels
    bs <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0, 255),
      1 -> Gen.const('\r'.toInt), 1 -> Gen.const('\n'.toInt),
      1 -> Gen.oneOf("WARC/1.0".map(_.toInt))))
  } yield bs.map(_.toByte).toArray

  private val record: Gen[(Seq[(String, String)], Array[Byte])] = for {
    nh <- Gen.chooseNum(1, 5)
    hs <- Gen.listOfN(nh, Gen.zip(headerName, headerValue))
    b <- body
  } yield (hs, b)

  private val blobGen: Gen[Seq[(Seq[(String, String)], Array[Byte])]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, record))

  test("any record sequence round-trips through a concatenated blob") {
    for ((recs, i) <- sample(blobGen, 60, 0x3a7c0L).zipWithIndex) {
      val blob = recs.map { case (hs, b) => WarcCodec.record(hs, b) }
        .reduce(_ ++ _)
      val got = WarcCodec.parseRecords(blob)
      assert(got.size === recs.size, s"sample $i: record count")
      for (((hs, b), r) <- recs.zip(got)) {
        assert(java.util.Arrays.equals(r.body, b), s"sample $i: body bytes")
        for ((k, v) <- hs)
          // duplicate header names keep the LAST value (map overwrite) —
          // only assert names that appear once
          if (hs.count(_._1.equalsIgnoreCase(k)) == 1)
            assert(r.headers(k.toLowerCase) === v, s"sample $i: header $k")
      }
    }
  }

  test("random single-byte corruption never throws and never invents records") {
    for ((recs, i) <- sample(blobGen, 40, 0xc0de2L).zipWithIndex) {
      val blob = recs.map { case (hs, b) => WarcCodec.record(hs, b) }
        .reduce(_ ++ _)
      val pos = (i * 2654435761L % blob.length).toInt.abs
      val mut = blob.clone()
      mut(pos) = (mut(pos) ^ 0x5a).toByte
      val got = WarcCodec.parseRecords(mut) // must not throw
      assert(got.size <= recs.size + 1,
        s"sample $i: corruption at $pos invented records (${got.size} > ${recs.size})")
    }
  }
}
