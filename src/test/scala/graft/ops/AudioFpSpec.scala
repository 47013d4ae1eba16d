package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.ops.AudioFpCodec._

/** Pins the q293 audio-fingerprint family: the FFT itself (against the DFT
  * definition and known closed forms), the synthesis→container→decode→STFT
  * peak chain (peaks == the closed-form tone bins, with the argmax margin
  * that makes the oracle's closed form safe), and the end-to-end
  * constellation match (a clip finds its source track at the right offset
  * even against a decoy sharing a prefix).
  */
class AudioFpSpec extends AnyFunSuite with SparkSpec {

  test("fft matches the O(n^2) DFT definition on a fixed pseudo-random input") {
    val n = 64
    // deterministic LCG input — no Math.random in tests either
    var seed = 12345L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (seed >>> 40).toDouble / (1 << 24) - 0.5
    }
    val x = Array.fill(n)(next())
    val re = x.clone()
    val im = new Array[Double](n)
    fft(re, im)
    var k = 0
    while (k < n) {
      var sr = 0.0
      var si = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        sr += x(t) * math.cos(ang)
        si += x(t) * math.sin(ang)
        t += 1
      }
      assert(math.abs(re(k) - sr) < 1e-9, s"re bin $k")
      assert(math.abs(im(k) - si) < 1e-9, s"im bin $k")
      k += 1
    }
  }

  test("fft of an impulse is flat; of an integer-bin cosine is two lines") {
    val n = 512
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    re(0) = 1.0
    fft(re, im)
    (0 until n).foreach { k =>
      assert(math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12)
    }
    val k0 = 37
    val re2 = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * k0 * t / n))
    val im2 = new Array[Double](n)
    fft(re2, im2)
    (0 until n).foreach { k =>
      val mag = math.sqrt(re2(k) * re2(k) + im2(k) * im2(k))
      if (k == k0 || k == n - k0) assert(math.abs(mag - n / 2.0) < 1e-9)
      else assert(mag < 1e-8, s"leak at $k: $mag")
    }
  }

  test("synthesized track peaks == closed-form tone bins, with >=1000x argmax margin") {
    val payload = "The quick brown fox! 0123".getBytes("US-ASCII")
    val wav = WavCodec.encode(synthesizePcm(payload))
    val pcm = WavCodec.decodeSamples(wav).get
    assert(pcm.length == payload.length * SegLen)
    val peaks = stftPeaks(pcm)
    assert(peaks.toSeq == payload.toSeq.map(toneBin))
    // margin audit on the first frame: dominant line vs runner-up
    val re = new Array[Double](SegLen)
    val im = new Array[Double](SegLen)
    (0 until SegLen).foreach(i => re(i) = pcm(i).toDouble)
    fft(re, im)
    val mags = (1 until SegLen / 2)
      .map(k => math.sqrt(re(k) * re(k) + im(k) * im(k))).sorted.reverse
    assert(mags(0) / math.max(mags(1), 1e-9) > 1000.0,
      s"argmax margin ${mags(0) / mags(1)}")
  }

  test("hashes are collision-free encodings of (f1, f2, dt)") {
    val peaks = Array(5, 17, 61, 2, 33)
    val hs = hashes(peaks)
    // 3 + 3 + 2 + 1 anchor-target pairs for 5 peaks with fan-out 3
    assert(hs.size == 9)
    hs.foreach { case (h, t) =>
      val dt = h % 4
      val f2 = (h / 4) % 64
      val f1 = h / 256
      assert(f1 == peaks(t) && f2 == peaks(t + dt) && dt >= 1 && dt <= 3)
    }
  }

  test("q302 energies: decoded frame energy is A^2/2 within the int16 rounding floor") {
    // bytes mod 8: 0 (silent), 1 (quiet, A=512), 7 (loud, A=3584)
    val payload = Array[Byte](8, 1, 7)
    val pcm = WavCodec.decodeSamples(WavCodec.encode(synthesizeAmPcm(payload))).get
    val es = frameEnergies(pcm)
    assert(es.length == 3)
    assert(es(0) == 0.0)
    assert(math.abs(es(1) - 512.0 * 512 / 2) < 300.0)
    assert(math.abs(es(2) - 3584.0 * 3584 / 2) < 2000.0)
    // the q302 gate margin: quiet is 2.3x below, loud 21x above
    assert(es(1) < 300000.0 / 2 && es(2) > 300000.0 * 2)
  }

  test("end-to-end: a clip identifies its source track at the right offset") {
    import spark.implicits._
    val corpus =
      "alpha beta gamma delta epsilon zeta eta theta" ::
        "alpha beta gamma DIFFERENT TAIL entirely here" :: // shared prefix decoy
        "completely unrelated content with other bytes!" :: Nil
    val tracks = corpus.zipWithIndex
      .map { case (s, i) => Multimodal.MediaRow(i.toLong, s.getBytes("US-ASCII")) }
      .toDS()
    val index = tracks.flatMap { r =>
      fingerprint(r.payload).map { case (h, t) => (r.doc_id, h, t) }
    }.toDF("track_id", "h", "t1")
    // clip = bytes [20, 34) of track 0 — past the decoy's shared prefix
    val clipBytes = corpus.head.getBytes("US-ASCII").slice(20, 34)
    val qfp = Seq(Multimodal.MediaRow(0L, clipBytes)).toDS().flatMap { r =>
      fingerprint(r.payload).map { case (h, t) => (r.doc_id, h, t) }
    }.toDF("query_id", "h", "tq")
    import org.apache.spark.sql.functions.{col, count}
    // vote by (track, offset), exactly like q293: a clip match is a run of
    // hash hits agreeing on one time offset, not a mere hash-overlap count
    val best = index.join(qfp, "h")
      .groupBy(col("query_id"), col("track_id"),
        (col("t1") - col("tq")).as("off"))
      .agg(count("*").as("votes"))
      .orderBy(col("votes").desc)
      .collect()
    assert(best.head.getAs[Long]("track_id") == 0L)
    assert(best.head.getAs[Int]("off") == 20)
    // the true track's votes strictly beat any decoy's
    if (best.length > 1)
      assert(best.head.getAs[Long]("votes") > best(1).getAs[Long]("votes"))
  }
}
