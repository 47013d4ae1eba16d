package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Multimodal-column plumbing (SURVEY.md §2.3): media payloads ride through
  * the engine as opaque `binary` columns with typed metadata extracted by a
  * partition-batched decoder.
  *
  * Decoding is tiered, all REAL down to content level for the formats JVM
  * byte arithmetic can reach without native codec libs:
  * [[HeaderCodec]] sniffs container magic and parses actual format headers
  * (PNG IHDR, BMP info header, GIF screen descriptor, WAV fmt chunk);
  * [[BmpCodec]] and [[WavCodec]] go further — full pixel-array /
  * PCM-sample decode of uncompressed 24-bit BMP and 16-bit PCM WAV,
  * header-driven (offset + stride walk, RIFF chunk iteration), exercised
  * end-to-end by q131; [[PngCodec]] decodes a COMPRESSED container too —
  * zlib inflate + all five PNG row filters + chunk CRC verification, pure
  * JVM (q140). Lossy/entropy-coded formats (JPEG, GIF's LZW, compressed
  * audio) are the remaining gap — those need codec libs this container
  * lacks; payloads that match no known magic fall back to the clearly-marked
  * [[FakeCodec]] STUB, which derives deterministic dimensions from leading
  * bytes so the synthetic text fixtures stay oracle-checkable. Everything
  * around the codecs — the binary column, the typed Dataset boundary, the
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

  /** REAL pixel-level codec for uncompressed 24-bit BMP — pure JVM byte
    * arithmetic, no native deps. `encode` emits a genuine BMP container
    * (BITMAPINFOHEADER, bottom-up rows, 4-byte row stride); `decodePixels`
    * is header-driven: it follows the pixel-array offset from the file
    * header and walks rows by the computed stride, so it decodes any
    * conforming 24-bit uncompressed BMP, not just its own output.
    */
  object BmpCodec {
    val W = 16 // fixed encode width: stride = W*3 = 48, already 4-aligned

    private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
      le16(out, i, v & 0xffff); le16(out, i + 2, (v >>> 16) & 0xffff)
    }
    private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def rd32(p: Array[Byte], i: Int) = rd16(p, i) | (rd16(p, i + 2) << 16)

    /** Payload bytes become BGR channel bytes row-major, zero-padded to
      * fill the last row; height = ceil(len/48), min 1.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val h = math.max(1, (payload.length + 47) / 48)
      val dataSize = h * W * 3
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      le32(out, 2, 54 + dataSize) // file size
      le32(out, 10, 54)           // pixel-array offset
      le32(out, 14, 40)           // BITMAPINFOHEADER size
      le32(out, 18, W)
      le32(out, 22, h)            // positive height: bottom-up row order
      le16(out, 26, 1)            // planes
      le16(out, 28, 24)           // bits per pixel
      le32(out, 30, 0)            // BI_RGB (uncompressed)
      le32(out, 34, dataSize)
      // payload rows written bottom-up so a top-down read returns them in
      // original order after the flip in decodePixels
      var row = 0
      while (row < h) {
        val src = row * W * 3
        val n = math.min(W * 3, math.max(0, payload.length - src))
        if (n > 0)
          System.arraycopy(payload, src, out, 54 + (h - 1 - row) * W * 3, n)
        row += 1
      }
      out
    }

    /** Header-driven decode of any uncompressed 24-bit BMP: returns
      * (width, height, channel bytes top-down row-major) or None when the
      * container isn't a BMP this codec handles.
      */
    def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (HeaderCodec.sniff(p) != "bmp") return None
      val off = rd32(p, 10)
      val w = rd32(p, 18)
      val rawH = rd32(p, 22)
      val h = math.abs(rawH)
      val topDown = rawH < 0
      val bpp = rd16(p, 28)
      val comp = rd32(p, 30)
      if (bpp != 24 || comp != 0 || w <= 0 || h == 0) return None
      val stride = ((w * 3 + 3) / 4) * 4
      if (off.toLong + stride.toLong * h > p.length) return None
      val px = new Array[Byte](w * 3 * h)
      var row = 0
      while (row < h) {
        val srcRow = if (topDown) row else h - 1 - row
        System.arraycopy(p, off + srcRow * stride, px, row * w * 3, w * 3)
        row += 1
      }
      Some((w, h, px))
    }
  }

  /** REAL pixel-level codec for 8-bit truecolor PNG — pure JVM: zlib via
    * `java.util.zip.Deflater`/`Inflater`, chunk CRCs via `CRC32`, and the
    * five PNG row filters in byte arithmetic. `encode` emits a genuine
    * filtered PNG (Sub on even rows, Up on odd rows — real filter bytes,
    * not the trivial None row prefix); `decodePixels` walks the chunk list,
    * verifies every CRC, concatenates IDAT, inflates, and reconstructs all
    * five filter types (None/Sub/Up/Average/Paeth), so it decodes any
    * conforming non-interlaced RGB8 PNG, not just its own output.
    */
  object PngCodec {
    val W = 16 // fixed encode width: scanline = 1 filter byte + 48 pixel bytes

    private def wr32(out: Array[Byte], i: Int, v: Int): Unit = {
      out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
      out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
    }
    private def rd32(p: Array[Byte], i: Int): Int =
      ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) |
        ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
    private def crc(buf: Array[Byte], off: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32()
      c.update(buf, off, len)
      c.getValue.toInt
    }
    private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      wr32(out, 0, data.length)
      typ.indices.foreach(k => out(4 + k) = typ.charAt(k).toByte)
      System.arraycopy(data, 0, out, 8, data.length)
      wr32(out, 8 + data.length, crc(out, 4, 4 + data.length))
      out
    }

    /** Payload bytes become RGB channel bytes row-major (zero-padded last
      * row), height = ceil(len/48), min 1 — the same pixel mapping as
      * [[BmpCodec.encode]], so the two containers carry identical images.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val rowB = W * 3
      val h = math.max(1, (payload.length + rowB - 1) / rowB)
      val raw = new Array[Byte](h * (1 + rowB))
      val cur = new Array[Byte](rowB)
      val prev = new Array[Byte](rowB)
      var row = 0
      while (row < h) {
        java.util.Arrays.fill(cur, 0.toByte)
        val src = row * rowB
        val n = math.min(rowB, math.max(0, payload.length - src))
        if (n > 0) System.arraycopy(payload, src, cur, 0, n)
        val base = row * (1 + rowB)
        if (row % 2 == 0) {
          raw(base) = 1 // Sub: delta vs the pixel 3 bytes left
          var i = 0
          while (i < rowB) {
            raw(base + 1 + i) = (cur(i) - (if (i >= 3) cur(i - 3) else 0)).toByte
            i += 1
          }
        } else {
          raw(base) = 2 // Up: delta vs the row above
          var i = 0
          while (i < rowB) { raw(base + 1 + i) = (cur(i) - prev(i)).toByte; i += 1 }
        }
        System.arraycopy(cur, 0, prev, 0, rowB)
        row += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](4096)
      while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
      defl.end()
      val ihdr = new Array[Byte](13)
      wr32(ihdr, 0, W); wr32(ihdr, 4, h)
      ihdr(8) = 8   // bit depth
      ihdr(9) = 2   // color type: truecolor RGB
      // compression 0, filter 0, interlace 0 already zero
      val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      val out = new java.io.ByteArrayOutputStream()
      out.write(sig)
      out.write(chunk("IHDR", ihdr))
      out.write(chunk("IDAT", bos.toByteArray))
      out.write(chunk("IEND", Array.emptyByteArray))
      out.toByteArray
    }

    /** Chunk-walking, CRC-verified decode of any non-interlaced RGB8 PNG:
      * returns (width, height, channel bytes top-down, distinct filter
      * types seen) or None for containers outside that profile.
      */
    def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte], Int)] = {
      if (HeaderCodec.sniff(p) != "png") return None
      var w = 0; var h = 0; var ihdrOk = false
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8
      var done = false
      while (!done && i + 12 <= p.length) {
        val len = rd32(p, i)
        if (len < 0 || i + 12 + len > p.length) return None
        if (crc(p, i + 4, 4 + len) != rd32(p, i + 8 + len)) return None
        val typ = new String(p, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        typ match {
          case "IHDR" =>
            w = rd32(p, i + 8); h = rd32(p, i + 12)
            ihdrOk = p(i + 16) == 8 && p(i + 17) == 2 && p(i + 18) == 0 &&
              p(i + 19) == 0 && p(i + 20) == 0 && w > 0 && h > 0
          case "IDAT" => idat.write(p, i + 8, len)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped
        }
        i += 12 + len
      }
      if (!ihdrOk || idat.size() == 0) return None
      val rowB = w * 3
      val raw = new Array[Byte](h * (1 + rowB))
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !infl.finished()) {
          val n = infl.inflate(raw, got, raw.length - got)
          if (n == 0 && infl.needsInput()) return None // truncated stream
          got += n
        }
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally infl.end()
      if (got != raw.length) return None
      val px = new Array[Byte](h * rowB)
      var kinds = 0 // bitmask of filter types seen
      var row = 0
      while (row < h) {
        val ft = raw(row * (1 + rowB)) & 0xff
        if (ft > 4) return None
        kinds |= 1 << ft
        val base = row * (1 + rowB) + 1
        val out = row * rowB
        val up = out - rowB
        var c = 0
        while (c < rowB) {
          val x = raw(base + c) & 0xff
          val left = if (c >= 3) px(out + c - 3) & 0xff else 0
          val above = if (row > 0) px(up + c) & 0xff else 0
          val upLeft = if (row > 0 && c >= 3) px(up + c - 3) & 0xff else 0
          val recon = ft match {
            case 0 => x
            case 1 => x + left
            case 2 => x + above
            case 3 => x + (left + above) / 2
            case 4 => // Paeth predictor
              val pp = left + above - upLeft
              val pa = math.abs(pp - left); val pb = math.abs(pp - above)
              val pc = math.abs(pp - upLeft)
              x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) above else upLeft)
          }
          px(out + c) = (recon & 0xff).toByte
          c += 1
        }
        row += 1
      }
      Some((w, h, px, java.lang.Integer.bitCount(kinds)))
    }
  }

  /** REAL sample-level codec for PCM WAV — canonical RIFF chunk walk.
    * `encode` emits 16-bit mono PCM at 8 kHz; `decodeSamples` iterates the
    * chunk list (not a fixed layout) to find `fmt ` and `data`, validates
    * PCM/16-bit, and reads little-endian signed samples.
    */
  object WavCodec {
    private def le16(out: Array[Byte], i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(out: Array[Byte], i: Int, v: Int): Unit = {
      le16(out, i, v & 0xffff); le16(out, i + 2, (v >>> 16) & 0xffff)
    }
    private def tag(out: Array[Byte], i: Int, s: String): Unit =
      s.indices.foreach(k => out(i + k) = s.charAt(k).toByte)
    private def rd16(p: Array[Byte], i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    private def rd32(p: Array[Byte], i: Int) = rd16(p, i) | (rd16(p, i + 2) << 16)
    private def isTag(p: Array[Byte], i: Int, s: String) =
      p.length >= i + 4 && s.indices.forall(k => (p(i + k) & 0xff) == s.charAt(k))

    /** Payload byte pairs become LE int16 samples (odd tail padded with a
      * zero high byte); sample count = ceil(len/2), min 1.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val n = math.max(1, (payload.length + 1) / 2)
      val dataSize = n * 2
      val out = new Array[Byte](44 + dataSize)
      tag(out, 0, "RIFF"); le32(out, 4, 36 + dataSize); tag(out, 8, "WAVE")
      tag(out, 12, "fmt "); le32(out, 16, 16)
      le16(out, 20, 1)      // PCM
      le16(out, 22, 1)      // mono
      le32(out, 24, 8000)   // sample rate
      le32(out, 28, 16000)  // byte rate
      le16(out, 32, 2)      // block align
      le16(out, 34, 16)     // bits per sample
      tag(out, 36, "data"); le32(out, 40, dataSize)
      System.arraycopy(payload, 0, out, 44, payload.length)
      out
    }

    /** Chunk-walking decode of any 16-bit PCM WAV: returns the signed
      * sample array or None for non-PCM/non-16-bit/malformed containers.
      */
    def decodeSamples(p: Array[Byte]): Option[Array[Short]] = {
      if (HeaderCodec.sniff(p) != "wav") return None
      var i = 12
      var fmtOk = false
      var data: Option[(Int, Int)] = None
      while (i + 8 <= p.length) {
        val sz = rd32(p, i + 4)
        if (isTag(p, i, "fmt ") && sz >= 16)
          fmtOk = rd16(p, i + 8) == 1 && rd16(p, i + 22) == 16
        else if (isTag(p, i, "data"))
          data = Some((i + 8, math.min(sz, p.length - i - 8)))
        i += 8 + sz + (sz & 1) // chunks are word-aligned
      }
      data.filter(_ => fmtOk).map { case (off, len) =>
        Array.tabulate(len / 2)(k => rd16(p, off + 2 * k).toShort)
      }
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

  final case class MediaContent(doc_id: Long, n_bytes: Int, bmp_w: Int,
      bmp_h: Int, mean_pixel: Double, n_samples: Int, rms_amplitude: Double)

  /** Full content decode through REAL containers: each payload is wrapped
    * into a genuine BMP image and a genuine PCM WAV, then decoded back
    * pixel-by-pixel / sample-by-sample by the header-driven codecs — the
    * encode→decode pair proves the parsers work on actual format bytes,
    * and the extracted features (mean channel value, RMS amplitude) are
    * the standard image/audio summary statistics. Partition-parallel, no
    * shuffle, payloads never touch the driver. Sums are exact integers;
    * the single float division+sqrt happens per row (accumulation-order
    * independent, oracle-safe at 6 digits).
    */
  def decodeContent(media: Dataset[MediaRow]): Dataset[MediaContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decodePixels(BmpCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("BMP roundtrip failed"))
        var psum = 0L
        px.foreach(b => psum += (b & 0xff))
        val samples = WavCodec.decodeSamples(WavCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("WAV roundtrip failed"))
        var sq = 0L
        samples.foreach(s => sq += s.toLong * s)
        MediaContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, samples.length,
          math.sqrt(sq.toDouble / samples.length))
      }
    }
  }

  final case class PngContent(doc_id: Long, n_bytes: Int, png_w: Int,
      png_h: Int, mean_pixel: Double, n_filter_kinds: Int)

  /** Pixel decode through a COMPRESSED container: each payload becomes a
    * genuine filtered RGB8 PNG (Sub/Up filter bytes, zlib-deflated IDAT,
    * CRC'd chunks) and is decoded back through inflate + unfiltering. The
    * extracted mean pixel must equal the BMP path's (same pixel mapping) —
    * any corruption in the deflate→inflate→unfilter chain breaks the
    * oracle hash. Partition-parallel, no shuffle, nothing on the driver.
    */
  def decodeContentPng(media: Dataset[MediaRow]): Dataset[PngContent] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px, kinds) = PngCodec.decodePixels(PngCodec.encode(r.payload))
          .getOrElse(throw new IllegalStateException("PNG roundtrip failed"))
        var psum = 0L
        px.foreach(b => psum += (b & 0xff))
        PngContent(r.doc_id, r.payload.length, w, h,
          psum.toDouble / px.length, kinds)
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

  /** Pixel/sample-level decode end-to-end: payload → real BMP + real WAV →
    * header-driven decode → mean pixel value and RMS amplitude. The oracle
    * reproduces the byte arithmetic from the document text (ASCII fixtures:
    * bytes = chars; BMP pads rows with zero bytes, WAV pads the odd tail
    * with a zero high byte, both mirrored exactly in SQL).
    */
  val q131MultimodalDecode = GraftQuery(
    "q131_multimodal_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContent(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("bmp_w"), col("bmp_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"),
          col("n_samples"),
          round(col("rms_amplitude"), 6).as("rms_amplitude"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, text, len,
           |    greatest(1, (len + 47) // 48) AS h,
           |    greatest(1, (len + 1) // 2) AS n,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum
           |  FROM t),
           |w AS (
           |  SELECT doc_id, len, h, n, bytesum,
           |    list_transform(range(0, n), k ->
           |      (CASE WHEN 2*k + 1 <= len
           |         THEN ascii(substr(text, CAST(2*k + 1 AS INT), 1)) ELSE 0 END)
           |      + 256 * (CASE WHEN 2*k + 2 <= len
           |         THEN ascii(substr(text, CAST(2*k + 2 AS INT), 1)) ELSE 0 END)
           |    ) AS samples
           |  FROM b)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(16 AS INT) AS bmp_w, CAST(h AS INT) AS bmp_h,
           |  round(bytesum::DOUBLE / (h * 48), 6) AS mean_pixel,
           |  CAST(n AS INT) AS n_samples,
           |  round(sqrt(list_sum(list_transform(samples, v -> v * v))::DOUBLE / n), 6)
           |    AS rms_amplitude
           |FROM w ORDER BY doc_id""".stripMargin))

  /** Compressed-container decode end-to-end: payload → real filtered PNG →
    * CRC walk + inflate + unfilter → mean pixel. The oracle reproduces the
    * pixel arithmetic from the document text (same mapping as q131's BMP:
    * 16-wide RGB rows, zero-padded tail), so the hash only matches if the
    * whole compression round-trip is byte-exact. n_filter_kinds comes from
    * the actual filter bytes (Sub everywhere; Up too once there are ≥2
    * rows).
    */
  val q140PngDecode = GraftQuery(
    "q140_png_decode",
    (s, dir) => {
      import s.implicits._
      val media = attachBinary(Tables.documents(s, dir).filter(col("doc_id") < 50))
        .as[MediaRow]
      decodeContentPng(media).toDF()
        .select(col("doc_id"), col("n_bytes"), col("png_w"), col("png_h"),
          round(col("mean_pixel"), 6).as("mean_pixel"), col("n_filter_kinds"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 50),
           |b AS (
           |  SELECT doc_id, len,
           |    greatest(1, (len + 47) // 48) AS h,
           |    COALESCE(list_sum(list_transform(range(1, len + 1),
           |      i -> ascii(substr(text, CAST(i AS INT), 1)))), 0) AS bytesum
           |  FROM t)
           |SELECT doc_id, len AS n_bytes,
           |  CAST(16 AS INT) AS png_w, CAST(h AS INT) AS png_h,
           |  round(bytesum::DOUBLE / (h * 48), 6) AS mean_pixel,
           |  CAST(CASE WHEN h = 1 THEN 1 ELSE 2 END AS INT) AS n_filter_kinds
           |FROM b ORDER BY doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q32MultimodalMeta, q62MultimodalFrames,
    q131MultimodalDecode, q140PngDecode)
}
