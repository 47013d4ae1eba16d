package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads ride through
  * the engine as opaque `binary` columns with typed metadata extracted by a
  * partition-batched decoder.
  *
  * Decoding is two-tier. [[HeaderCodec]] is REAL: it sniffs the container
  * magic and parses actual format headers (PNG IHDR, BMP info header, GIF
  * screen descriptor, WAV fmt chunk) in pure JVM byte arithmetic — no
  * native deps, works on genuine files. Full pixel/sample decode stays out
  * of scope (no image/audio codec libs in this container); payloads that
  * match no known magic fall back to the clearly-marked [[FakeCodec]] STUB,
  * which derives deterministic dimensions from leading bytes so the
  * synthetic text fixtures stay oracle-checkable. Everything around the
  * codec — the binary column, the typed Dataset boundary, the
  * `mapPartitions` batch shape (one decoder instantiation per partition,
  * streaming iterator, no per-row setup), and the schema of the decoded
  * output — is the real production plumbing.
  *
  * Scale: decode runs partition-parallel with no shuffle; metadata
  * aggregation afterwards is a normal partial agg. Payloads never pass
  * through the driver.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int)

  final case class Frame(doc_id: Long, frame_id: Int, off: Int, frame_w: Int)

  /** Real header-level media parser: identifies the container by magic
    * bytes and reads dimensions/metadata straight from the format's own
    * header layout. Returns `Some((w, h))` for recognized containers
    * (WAV reports (sampleRate, channels) in the same slot), `None` for
    * anything unrecognized or truncated — callers fall back to
    * [[FakeCodec]] there.
    */
  object HeaderCodec {
    private def u8(p: Array[Byte], i: Int) = p(i) & 0xff
    private def be32(p: Array[Byte], i: Int) =
      (u8(p, i) << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
    private def le16(p: Array[Byte], i: Int) = u8(p, i) | (u8(p, i + 1) << 8)
    private def le32(p: Array[Byte], i: Int) =
      u8(p, i) | (u8(p, i + 1) << 8) | (u8(p, i + 2) << 16) | (u8(p, i + 3) << 24)
    private def ascii(p: Array[Byte], i: Int, s: String) =
      p.length >= i + s.length && s.indices.forall(k => u8(p, i + k) == s.charAt(k))

    /** Container kind by magic, or "unknown". */
    def sniff(p: Array[Byte]): String =
      if (p.length >= 24 && be32(p, 0) == 0x89504e47 && be32(p, 4) == 0x0d0a1a0a) "png"
      // "BM" alone would false-positive on ASCII text payloads; require a
      // plausible DIB header size too (an ASCII run can never produce one)
      else if (p.length >= 26 && ascii(p, 0, "BM") &&
        Set(12, 40, 56, 64, 108, 124).contains(le32(p, 14))) "bmp"
      else if (p.length >= 10 && (ascii(p, 0, "GIF87a") || ascii(p, 0, "GIF89a"))) "gif"
      else if (p.length >= 28 && ascii(p, 0, "RIFF") && ascii(p, 8, "WAVE")) "wav"
      else "unknown"

    def decode(p: Array[Byte]): Option[(Int, Int)] = sniff(p) match {
      // PNG: 8-byte signature, then the IHDR chunk (len+type at 8..15),
      // width/height big-endian at 16/20
      case "png" if p.length >= 24 && ascii(p, 12, "IHDR") =>
        Some((be32(p, 16), be32(p, 20)))
      // BMP: BITMAPINFOHEADER width at 18, height at 22 (LE int32; height
      // may be negative for top-down rows)
      case "bmp" => Some((le32(p, 18), math.abs(le32(p, 22))))
      // GIF: logical screen descriptor, LE uint16 at 6/8
      case "gif" => Some((le16(p, 6), le16(p, 8)))
      // WAV: fmt chunk directly after "WAVE" in canonical files — channels
      // LE uint16 at 22, sample rate LE uint32 at 24
      case "wav" if ascii(p, 12, "fmt ") => Some((le32(p, 24), le16(p, 22)))
      case _ => None
    }
  }

  /** STUB decoder — stands in for a full pixel-level codec behind the same
    * signature. Deterministic: dimensions derive from the first two payload
    * bytes. Only reached for payloads [[HeaderCodec]] doesn't recognize
    * (e.g. the synthetic text fixtures).
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

  /** Dispatching decode: real header parse when the payload is a recognized
    * container, deterministic stub otherwise.
    */
  def decodeDims(payload: Array[Byte]): (Int, Int) =
    HeaderCodec.decode(payload).getOrElse(FakeCodec.decode(payload))

  /** Batch form of [[decodeDims]] — the call shape GPU/native decoders
    * need; stub batches delegate to [[FakeCodec.decodeBatch]].
    */
  def decodeDimsBatch(payloads: Array[Array[Byte]]): Array[(Int, Int)] =
    payloads.map(decodeDims)

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
        val (w, h) = decodeDims(r.payload)
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
        val dims = decodeDimsBatch(batch.map(_.payload).toArray)
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
