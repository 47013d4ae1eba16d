package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads ride through
  * the engine as opaque `binary` columns with typed metadata extracted by a
  * partition-batched decoder.
  *
  * The decode step itself is a clearly-marked STUB (this container has no
  * image/audio codecs): [[FakeCodec.decode]] derives deterministic
  * dimensions from the payload's leading bytes. Everything around it — the
  * binary column, the typed Dataset boundary, the `mapPartitions` batch
  * shape (one decoder instantiation per partition, streaming iterator, no
  * per-row setup), and the schema of the decoded output — is the real
  * production plumbing a codec would drop into.
  *
  * Scale: decode runs partition-parallel with no shuffle; metadata
  * aggregation afterwards is a normal partial agg. Payloads never pass
  * through the driver.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int)

  final case class Frame(doc_id: Long, frame_id: Int, off: Int, frame_w: Int)

  /** STUB decoder — stands in for an image codec behind the same signature.
    * Deterministic: dimensions derive from the first two payload bytes.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (64 + b0 % 64, 64 + b1 % 64)
    }

    /** STUB batch decode — the signature a vectorized/native codec needs:
      * one call per batch of payloads, results positionally aligned.
      */
    def decodeBatch(payloads: Array[Array[Byte]]): Array[(Int, Int)] =
      payloads.map(decode)

    /** STUB frame sampler (video stand-in): one frame every `step` bytes,
      * width derived from the byte at the frame offset.
      */
    def sampleFrames(payload: Array[Byte], step: Int): Seq[(Int, Int)] =
      (0 until payload.length by step).map(o => (o, 64 + (payload(o) & 0xff) % 64))
  }

  /** Attach the media payload as an opaque binary column (fixtures carry
    * text; a real pipeline would read image/audio bytes the same way).
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-batched metadata extraction — the mapPartitions boundary a
    * real codec plugs into (decoder init once per partition).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would go here (codec handles, buffers)
      rows.map { r =>
        val (w, h) = FakeCodec.decode(r.payload)
        MediaMeta(r.doc_id, r.payload.length, w, h)
      }
    }
  }

  /** Columnar-batched variant of [[decodeMeta]] — the Scala analogue of a
    * `mapInPandas`/`mapInArrow` batch UDF: rows are staged into fixed-size
    * batches and the codec is invoked ONCE per batch (`decodeBatch`), which
    * is the call shape GPU/native decoders need to amortize transfer and
    * launch overhead. Same results as the row-at-a-time path (parity spec).
    */
  def decodeMetaBatched(media: Dataset[MediaRow], batchSize: Int = 256): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val dims = FakeCodec.decodeBatch(batch.map(_.payload).toArray)
        batch.iterator.zip(dims.iterator).map { case (r, (w, h)) =>
          MediaMeta(r.doc_id, r.payload.length, w, h)
        }
      }
    }
  }

  /** One-to-many decode (frame sampling): each payload expands to its
    * sampled frames, partition-parallel, no shuffle until the caller
    * aggregates.
    */
  def sampleFrames(media: Dataset[MediaRow], step: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        FakeCodec.sampleFrames(r.payload, step).iterator.zipWithIndex.map {
          case ((o, w), i) => Frame(r.doc_id, i, o, w)
        }
      }
    }
  }

  /** End-to-end: binary attach → typed decode → metadata rows. The oracle
    * reproduces the stub's byte arithmetic in SQL (fixture text is ASCII, so
    * bytes = chars).
    */
  val q32MultimodalMeta = GraftQuery(
    "q32_multimodal_meta",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 100))
        .as[MediaRow]
      decodeMeta(media).toDF()
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, length(text) AS n_bytes,
           |  64 + ascii(substr(text, 1, 1)) % 64 AS width,
           |  64 + ascii(substr(text, 2, 1)) % 64 AS height
           |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))

  /** Frame sampling end-to-end through the batched decode boundary: every
    * 512th byte starts a frame (video stand-in), one output row per frame.
    */
  val q62MultimodalFrames = GraftQuery(
    "q62_multimodal_frames",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 100))
        .as[MediaRow]
      sampleFrames(media, 512).toDF()
        .orderBy("doc_id", "frame_id")
    },
    // scalar range()+unnest: DuckDB 1.0's range TABLE function rejects
    // lateral column parameters
    Some("""SELECT doc_id, CAST(i AS INT) AS frame_id, CAST(i * 512 AS INT) AS off,
           |  64 + ascii(substr(text, CAST(i * 512 + 1 AS INT), 1)) % 64 AS frame_w
           |FROM (SELECT doc_id, text,
           |        unnest(range(0, CAST(ceil(length(text) / 512.0) AS BIGINT))) AS i
           |      FROM documents WHERE doc_id < 100) t
           |ORDER BY doc_id, frame_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q32MultimodalMeta, q62MultimodalFrames)
}
