package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

class MultimodalBatchSpec extends AnyFunSuite with SparkSpec {

  test("batched decode equals row-at-a-time decode (batch boundary parity)") {
    import spark.implicits._
    val media = Multimodal.attachBinary(
      Tables.documents(spark, "/root/testdata/sf0.001"))
      .as[Multimodal.MediaRow]
    val rowWise = Multimodal.decodeMeta(media).orderBy("doc_id").collect()
    // batchSize smaller than partition row counts so grouping really kicks in
    val batched = Multimodal.decodeMetaBatched(media, batchSize = 7)
      .orderBy("doc_id").collect()
    assert(rowWise.length == batched.length && rowWise.length > 0)
    assert(rowWise.sameElements(batched))
  }

  test("frame sampling expands payloads one-to-many with correct offsets") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, Array.fill[Byte](1025)(65)), // 3 frames: 0,512,1024
      Multimodal.MediaRow(2L, Array.emptyByteArray) // no frames
    ).toDS()
    val got = Multimodal.sampleFrames(media, 512).orderBy("doc_id", "frame_id").collect()
    assert(got.map(f => (f.doc_id, f.frame_id, f.off)).toSeq ==
      Seq((1L, 0, 0), (1L, 1, 512), (1L, 2, 1024)))
    assert(got.forall(_.frame_w == 64 + 65 % 64))
  }
}
