package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.ops.Multimodal.{attachBinary, MediaRow}

/** Shot-boundary (scene-cut) detection over decoded video — the standard
  * first step of video clip segmentation for multimodal training corpora:
  * consecutive-frame pixel SAD (sum of absolute differences), a cut
  * threshold, and run-length scene segmentation. The decode path is the
  * REAL q278 MRLE codec (keyframe + temporal-delta frames through the
  * persistent canvas), so the SAD is computed from actual reconstructed
  * pixels — a decoder that drops the temporal carry changes every SAD and
  * hash-mismatches. The fixture's synthesis is lossless, which keeps the
  * whole query integer-exact: SAD, cut flags, scene lengths and totals are
  * all BIGINT algebra with a closed-form oracle over the text bytes
  * (frame f's variable rows sit at byte 8f, so SAD(f-1→f) =
  * 32·(7·|Δv| + |Δ(v mod 128)|)).
  *
  * Scale design (100 TB of video): decode + per-frame-pair SAD is map-only
  * and partition-parallel with both frames of each pair held only inside
  * the decoder's sequential walk (no frame plane ever crosses a shuffle —
  * only the narrow (doc, frame, sad) rows); segmentation windows partition
  * by doc_id, whose frame count is bounded by clip length, never by corpus
  * size; the final per-doc rollup is an ordinary hash aggregate.
  *
  * Reference scope note: `/root/reference` has no media path; this family
  * extends the engine per the north-star brief, not the reference surface.
  */
object SceneCutQueries {
  import RleVideoCodec.{decodeFrames, encode}

  final case class FrameDiff(doc_id: Long, frame_idx: Int, n_frames: Int,
      sad: Long)

  /** A cut is declared when consecutive frames differ by more than 4
    * gray levels per pixel on average: SAD > 4·W·H = 2048 for the 32×16
    * fixture raster.
    */
  val CutSad = 2048L

  /** Decode each track and emit per-frame SAD vs the previous frame
    * (frame 0 emits SAD 0 — never a cut). Pixel loop over the planes the
    * codec actually reconstructed, not the synthesis closed form.
    */
  def frameDiffs(media: Dataset[MediaRow]): Dataset[FrameDiff] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (w, h, frames) = decodeFrames(encode(r.payload))
        .getOrElse(throw new IllegalStateException("MRLE roundtrip failed"))
      var prev: Array[Byte] = null
      frames.iterator.zipWithIndex.map { case (px, f) =>
        var sad = 0L
        if (prev != null) {
          var i = 0
          while (i < w * h) {
            sad += math.abs((px(i) & 0xff) - (prev(i) & 0xff))
            i += 1
          }
        }
        prev = px
        FrameDiff(r.doc_id, f, frames.length, sad)
      }
    }
  }

  val q294SceneCuts = GraftQuery(
    "q294_scene_cuts",
    (s, dir) => {
      import s.implicits._
      // symmetric ASCII gate: the oracle models payload bytes as
      // ascii(substr(text, ...)) — enforce the assumption on both sides
      // (the q280 discipline) instead of trusting the fixture
      val media = attachBinary(Tables.documents(s, dir)
        .filter(col("doc_id") < 200 &&
          octet_length(col("text")) === length(col("text")) &&
          col("n_chars") === length(col("text"))))
        .as[MediaRow]
      val diffs = frameDiffs(media).toDF()
      val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
      val scenes = diffs
        .withColumn("is_cut", (col("sad") > CutSad).cast("int"))
        .withColumn("scene_id",
          sum(col("is_cut")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      val sceneLens = scenes.groupBy("doc_id", "scene_id")
        .agg(count(lit(1)).as("scene_len"))
      val perDoc = scenes.groupBy("doc_id")
        .agg(max(col("n_frames")).as("n_frames"),
          sum(col("is_cut")).cast("long").as("n_cuts"),
          sum(col("sad")).as("total_sad"))
      perDoc.join(
          sceneLens.groupBy("doc_id")
            .agg(max(col("scene_len")).as("longest_scene")),
          "doc_id")
        .withColumn("n_scenes", col("n_cuts") + 1L)
        .select("doc_id", "n_frames", "n_cuts", "n_scenes", "longest_scene",
          "total_sad")
        .orderBy("doc_id")
    },
    // closed form: v_f = byte 8f (0 past the end), SAD over the 7 run rows
    // and the gradient row = 32*(7*|Δv| + |Δ(v%128)|); the 8 static rows
    // never contribute (temporal carry)
    Some("""WITH t AS (
           |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
           |  FROM documents WHERE doc_id < 200
           |    AND strlen(text) = length(text) AND n_chars = length(text)),
           |f AS (
           |  SELECT doc_id, len,
           |    CAST(greatest(1, (len + 7) // 8) AS INT) AS nf,
           |    unnest(range(CAST(greatest(1, (len + 7) // 8) AS BIGINT))) AS fi,
           |    text
           |  FROM t),
           |v AS (
           |  SELECT doc_id, nf, CAST(fi AS INT) AS frame_idx,
           |    CASE WHEN fi * 8 + 1 <= len
           |         THEN ascii(substr(text, CAST(fi * 8 + 1 AS INT), 1))
           |         ELSE 0 END AS vf
           |  FROM f),
           |d AS (
           |  SELECT doc_id, nf, frame_idx, vf,
           |    lag(vf) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pv
           |  FROM v),
           |sd AS (
           |  SELECT doc_id, nf, frame_idx,
           |    CASE WHEN pv IS NULL THEN 0
           |         ELSE 32 * (7 * abs(vf - pv) + abs((vf % 128) - (pv % 128)))
           |    END AS sad
           |  FROM d),
           |c AS (
           |  SELECT doc_id, nf, frame_idx, sad,
           |    CASE WHEN sad > 2048 THEN 1 ELSE 0 END AS is_cut
           |  FROM sd),
           |sc AS (
           |  SELECT doc_id, nf, sad, is_cut,
           |    sum(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scene_id
           |  FROM c),
           |sl AS (
           |  SELECT doc_id, scene_id, count(*) AS scene_len
           |  FROM sc GROUP BY 1, 2),
           |pd AS (
           |  SELECT doc_id, max(nf) AS n_frames,
           |    CAST(sum(is_cut) AS BIGINT) AS n_cuts,
           |    CAST(sum(sad) AS BIGINT) AS total_sad
           |  FROM sc GROUP BY 1)
           |SELECT pd.doc_id, n_frames, n_cuts, n_cuts + 1 AS n_scenes,
           |  ls.longest_scene, total_sad
           |FROM pd JOIN (
           |  SELECT doc_id, CAST(max(scene_len) AS BIGINT) AS longest_scene
           |  FROM sl GROUP BY 1) ls ON ls.doc_id = pd.doc_id
           |ORDER BY pd.doc_id""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q294SceneCuts)
}
