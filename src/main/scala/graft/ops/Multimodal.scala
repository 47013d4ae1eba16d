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

  /** STUB decoder — stands in for an image codec behind the same signature.
    * Deterministic: dimensions derive from the first two payload bytes.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      (64 + b0 % 64, 64 + b1 % 64)
    }
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

  val all: Seq[GraftQuery] = Seq(q32MultimodalMeta)
}
