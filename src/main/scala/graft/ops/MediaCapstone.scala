package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q341 — the MULTIMODAL COMPOSED PIPELINE capstone: the media half of the
  * inventory chained over SHARED intermediates, the q308 discipline applied
  * to binary payloads. The per-operator media gates (q131/q151/q156/q162/
  * q197/q271) prove each stage in isolation; this query proves they
  * COMPOSE — decode features feeding dedup feeding a QC gate feeding the
  * text chain — the cross-operator drift class per-query gates can't catch.
  *
  * The chain (each stage consumes the previous stage's frame, never the raw
  * table):
  *
  *   1. Media landing (q271's container shape at corpus scale): every
  *      payload becomes a genuine 24-bit BMP ([[BmpCodec.encode]]), framed
  *      as [8-byte BE doc_id | 4-byte BE length | container bytes] records
  *      and assembled into 64-doc shard blobs EXECUTOR-side (a 64-row
  *      bounded `mapGroups`, the q308 WARC-shard shape — no driver-side
  *      file write, unlike q271's bounded binaryFile fixture). The blobs
  *      are then walked BACK record-by-record, so a framing or stride bug
  *      anywhere desyncs every downstream count.
  *   2. Fused decode (the q338 one-pass lesson): each recovered container
  *      through [[BmpCodec.decodePixels]] ONCE, producing in a single
  *      mapPartitions pass the 64-bit dHash ([[Multimodal.dhash64]]), the
  *      8×8 nearest-neighbor thumbnail min/max ([[Multimodal.resizeNearest]],
  *      q162's grid), and the mean channel byte (q197's luminance plane) —
  *      never a second decode per feature family.
  *   3. Perceptual near-dup dedup (q156's SCALE path): dHash split into
  *      4×16-bit bands, candidates from the (band, key) EQUI-join — by
  *      pigeonhole exact recall at Hamming ≤ 3 — verified by bit_count on
  *      candidates only, every pair's HIGHER id dropped. The oracle
  *      brute-forces all pairs (fixture-bounded) and the banded set must
  *      equal it; Round12PlanSpec pins the non-cartesian shape.
  *   4. QC gate (q162 + q197 features as a filter, the exposure/flatness
  *      screen real image curation runs): keep survivors with thumbnail
  *      dynamic range ≥ 40 (near-constant screenshots out) AND mean
  *      luminance ≥ 70 (padding-dominated/underexposed out). Both metrics
  *      compare exactly: the range is an integer, the mean is ONE division
  *      of the same exact integers on both engines. Measured on the
  *      fixtures the gate drops ~5% at every scale — load-bearing, not
  *      vacuous.
  *   5. Text-chain join + packing (q128): QC survivors semi-join their
  *      document text, whitespace token counts, and 512-token block
  *      packing per (source, doc_id mod 4) sub-stream — the engine runs
  *      the real exclusive-prefix window + explode while the oracle
  *      derives blocks/segments in CLOSED FORM (⌈Σtok/512⌉ and floor-div
  *      span), so the two formulations must agree.
  *
  * Output: ONE summary row per source. The DuckDB oracle replays the whole
  * chain from `documents` text: landing is the identity the lossless
  * BMP/framing round-trip must EARN (n_landed = n_docs only if every
  * container and frame parses back), decode features are the q151/q162/q197
  * closed forms, dedup is replayed brute-force, packing in closed form.
  *
  * Scale design (100 TB): shard assembly is a 64-row-bounded mapGroups;
  * framing walk + decode + all three feature families are map-only over
  * blobs (payloads never on the driver, ONE decode per doc); the dedup
  * shuffles 16-bit band keys, never pixels; the QC gate is a filter on an
  * 8-byte feature row; packing windows are keyed per (source, shard)
  * sub-stream. The only corpus-wide shuffles are the band join and the
  * per-source aggregates — exactly the q156/q128 shapes, unchanged by
  * composition.
  *
  * Reference scope note: `/root/reference` (pesto93/Clickhouse_data-rebalance)
  * has no media surface; this is the round-11 verdict's #1 ask.
  */
object MediaCapstone {

  private val Cap = 512L
  private val NShards = 4

  final case class MediaFeat(doc_id: Long, dhash: Long, rs_min: Int,
      rs_max: Int, mean_px: Double)

  val q341MediaCapstone = GraftQuery(
    "q341_media_capstone",
    (s, dir) => {
      import s.implicits._
      val meta = Tables.documents(s, dir).select(col("doc_id"), col("source"))
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))

      // ---- stage 1: landing — real BMP containers, length-framed 64-doc
      // shard blobs assembled and re-parsed executor-side
      val blobs = docs.as[(Long, String)]
        .map { case (id, text) =>
          val bmp = BmpCodec.encode(
            Option(text).getOrElse("").getBytes(StandardCharsets.UTF_8))
          (id / 64, id, bmp)
        }
        .groupByKey(_._1)
        .mapGroups { (_, it) =>
          val frames = it.toArray.sortBy(_._2)
          val out = new Array[Byte](frames.map(12 + _._3.length).sum)
          var o = 0
          frames.foreach { case (_, id, bmp) =>
            var k = 0
            while (k < 8) {
              out(o + k) = ((id >>> (56 - 8 * k)) & 0xff).toByte; k += 1
            }
            val n = bmp.length
            out(o + 8) = (n >>> 24).toByte; out(o + 9) = (n >>> 16).toByte
            out(o + 10) = (n >>> 8).toByte; out(o + 11) = n.toByte
            System.arraycopy(bmp, 0, out, o + 12, n)
            o += 12 + n
          }
          out
        }

      // ---- stage 2: framing walk + ONE fused decode per recovered doc
      val feats = blobs.mapPartitions { it =>
        it.flatMap { blob =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[MediaFeat]
          var o = 0
          while (o + 12 <= blob.length) {
            var id = 0L
            var k = 0
            while (k < 8) { id = (id << 8) | (blob(o + k) & 0xffL); k += 1 }
            val n = ((blob(o + 8) & 0xff) << 24) | ((blob(o + 9) & 0xff) << 16) |
              ((blob(o + 10) & 0xff) << 8) | (blob(o + 11) & 0xff)
            if (n < 0 || o + 12 + n > blob.length)
              o = blob.length // malformed tail: fail soft, docs just don't land
            else {
              val bmp = java.util.Arrays.copyOfRange(blob, o + 12, o + 12 + n)
              BmpCodec.decodePixels(bmp).foreach { case (w, h, px) =>
                val thumb = Multimodal.resizeNearest(px, w * 3, h, 8, 8)
                var mn = 255; var mx = 0
                thumb.foreach { b =>
                  val v = b & 0xff
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                }
                var psum = 0L
                px.foreach(b => psum += (b & 0xff))
                acc += MediaFeat(id, Multimodal.dhash64(px, w, h), mn, mx,
                  psum.toDouble / px.length)
              }
              o += 12 + n
            }
          }
          acc.iterator
        }
      }.toDF().persist() // read by landing count, dedup, QC gate

      val ing = meta.groupBy("source").agg(count(lit(1)).as("n_docs"))
      val landed = feats.join(meta, "doc_id").groupBy("source")
        .agg(count(lit(1)).as("n_landed"))

      // ---- stage 3: Hamming-banded perceptual dedup (q156 shape)
      val sh = feats.select(col("doc_id"), col("dhash"))
      val bands = sh.select(col("doc_id"), col("dhash"),
          explode(array((0 until 4).map(b => struct(lit(b).as("band"),
            shiftrightunsigned(col("dhash"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("dhash"),
          col("bk.band").as("band"), col("bk.key").as("key"))
      val cand = bands
        .select(col("doc_id").as("i"), col("dhash").as("ha"),
          col("band"), col("key"))
        .join(bands.select(col("doc_id").as("j"), col("dhash").as("hb"),
          col("band"), col("key")), Seq("band", "key"))
        .filter(col("i") < col("j"))
        .select("i", "j", "ha", "hb").distinct()
      val dupj = cand
        .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= 3)
        .select(col("j").as("doc_id")).distinct()
      val pdup = dupj.join(meta, "doc_id").groupBy("source")
        .agg(count(lit(1)).as("n_pdup"))

      // ---- stage 4: QC gate on the fused decode features
      val qc = feats.join(dupj, Seq("doc_id"), "left_anti")
        .filter(col("rs_max") - col("rs_min") >= 40 && col("mean_px") >= 70.0)
      val qcAgg = qc.join(meta, "doc_id").groupBy("source")
        .agg(count(lit(1)).as("n_qc_pass"))

      // ---- stage 5: survivors join the text chain; q128 packing per
      // (source, doc_id mod 4) sub-stream
      val toks = qc.select("doc_id")
        .join(docs, "doc_id").join(meta, "doc_id")
        .select(col("doc_id"), col("source"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))
        .select(col("doc_id"), col("source"),
          when(col("t") === "", 0L)
            .otherwise(size(split(col("t"), " ")).cast("long")).as("n_tok"))
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val packed = toks
        .withColumn("shard", col("doc_id") % NShards)
        .withColumn("cb", coalesce(sum("n_tok").over(w), lit(0L)))
        .filter(col("n_tok") > 0) // zero-token docs occupy no block
        .withColumn("block_id",
          explode(sequence(expr(s"cb div $Cap"),
            expr(s"(cb + n_tok - 1) div $Cap"))))
      val packStats = packed.groupBy("source").agg(
        countDistinct(col("shard"), col("block_id")).as("n_blocks"),
        count(lit(1)).as("n_segments"))
      val tokAgg = toks.groupBy("source")
        .agg(sum("n_tok").as("tokens_total"))

      // ---- final per-source summary
      ing
        .join(landed, Seq("source"), "left")
        .join(pdup, Seq("source"), "left")
        .join(qcAgg, Seq("source"), "left")
        .join(tokAgg, Seq("source"), "left")
        .join(packStats, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_landed"), lit(0L)).as("n_landed"),
          coalesce(col("n_pdup"), lit(0L)).as("n_pdup"),
          coalesce(col("n_qc_pass"), lit(0L)).as("n_qc_pass"),
          coalesce(col("tokens_total"), lit(0L)).as("tokens_total"),
          coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"))
        .orderBy("source")
    },
    Some(s"""WITH d AS MATERIALIZED (
           |  SELECT doc_id, source, text, CAST(length(text) AS INT) AS len,
           |    greatest(1, (CAST(length(text) AS INT) + 47) // 48) AS h
           |  FROM documents),
           |-- landing is the identity the engine must EARN through the real
           |-- frame/container round-trip: every doc lands or the hash breaks
           |ing AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(count(*) AS BIGINT) AS n_landed
           |  FROM d GROUP BY 1),
           |sh AS MATERIALIZED (
           |  SELECT doc_id,
           |    CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
           |         THEN s - 18446744073709551616::HUGEINT ELSE s END AS BIGINT) AS dhash
           |  FROM (
           |    SELECT doc_id, CAST(list_sum(flatten(list_transform(range(0, 8), row ->
           |      list_transform(range(0, 8), c ->
           |        CASE WHEN
           |          (CASE WHEN ((row*h)//8)*48 + (((c+1)*16)//9)*3 + 1 <= len
           |            THEN ascii(substr(text, CAST(((row*h)//8)*48 + (((c+1)*16)//9)*3 + 1 AS INT), 1))
           |            ELSE 0 END)
           |          >
           |          (CASE WHEN ((row*h)//8)*48 + ((c*16)//9)*3 + 1 <= len
           |            THEN ascii(substr(text, CAST(((row*h)//8)*48 + ((c*16)//9)*3 + 1 AS INT), 1))
           |            ELSE 0 END)
           |        THEN 1::HUGEINT << CAST(row*8 + c AS INT) ELSE 0::HUGEINT END)))) AS HUGEINT) AS s
           |    FROM d)),
           |-- brute-force pair replay: the engine's banded equi-join has
           |-- EXACT recall at ham <= 3 (pigeonhole over 4x16-bit bands), so
           |-- the two pair sets must be identical
           |dupj AS MATERIALIZED (
           |  SELECT DISTINCT b.doc_id
           |  FROM sh a, sh b
           |  WHERE a.doc_id < b.doc_id AND bit_count(xor(a.dhash, b.dhash)) <= 3),
           |pd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_pdup
           |  FROM dupj JOIN d USING (doc_id) GROUP BY 1),
           |feat AS MATERIALIZED (
           |  SELECT d.doc_id, d.source, d.text,
           |    list_max(s.thumb) - list_min(s.thumb) AS span,
           |    COALESCE(list_sum(list_transform(range(1, d.len + 1),
           |      i -> ascii(substr(d.text, CAST(i AS INT), 1)))), 0)::DOUBLE
           |      / (d.h * 48) AS mean_px
           |  FROM (
           |    SELECT doc_id,
           |      flatten(list_transform(range(0, 8), y ->
           |        list_transform(range(0, 8), x ->
           |          CASE WHEN ((y * h) // 8) * 48 + (x * 48) // 8 + 1 <= len
           |            THEN ascii(substr(text,
           |              CAST(((y * h) // 8) * 48 + (x * 48) // 8 + 1 AS INT), 1))
           |            ELSE 0 END))) AS thumb
           |    FROM d) s JOIN d ON d.doc_id = s.doc_id
           |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dupj)),
           |qc AS MATERIALIZED (
           |  SELECT doc_id, source, text FROM feat
           |  WHERE span >= 40 AND mean_px >= 70.0),
           |qa AS (SELECT source, CAST(count(*) AS BIGINT) AS n_qc_pass
           |  FROM qc GROUP BY 1),
           |tk AS MATERIALIZED (
           |  SELECT doc_id, source,
           |    CASE WHEN t = '' THEN 0
           |         ELSE CAST(len(string_split(t, ' ')) AS BIGINT) END AS n_tok
           |  FROM (SELECT doc_id, source,
           |          trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t FROM qc)),
           |ta AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tokens_total
           |  FROM tk GROUP BY 1),
           |-- packing in CLOSED FORM (the engine runs the real window +
           |-- explode; the two formulations must agree)
           |pk AS (SELECT source, doc_id % $NShards AS shard, doc_id, n_tok,
           |    CAST(coalesce(sum(n_tok) OVER (
           |      PARTITION BY source, doc_id % $NShards ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS cb
           |  FROM tk),
           |ps AS (
           |  SELECT source, CAST(sum(nb) AS BIGINT) AS n_blocks,
           |    CAST(sum(ns) AS BIGINT) AS n_segments
           |  FROM (
           |    SELECT source, shard,
           |      (sum(n_tok) + ${Cap - 1}) // $Cap AS nb,
           |      sum(CASE WHEN n_tok > 0 THEN
           |        (cb + n_tok - 1) // $Cap - cb // $Cap + 1 ELSE 0 END) AS ns
           |    FROM pk GROUP BY 1, 2)
           |  GROUP BY 1)
           |SELECT ing.source, n_docs, n_landed,
           |  CAST(coalesce(pd.n_pdup, 0) AS BIGINT) AS n_pdup,
           |  CAST(coalesce(qa.n_qc_pass, 0) AS BIGINT) AS n_qc_pass,
           |  CAST(coalesce(ta.tokens_total, 0) AS BIGINT) AS tokens_total,
           |  CAST(coalesce(ps.n_blocks, 0) AS BIGINT) AS n_blocks,
           |  CAST(coalesce(ps.n_segments, 0) AS BIGINT) AS n_segments
           |FROM ing
           |LEFT JOIN pd USING (source)
           |LEFT JOIN qa USING (source)
           |LEFT JOIN ta USING (source)
           |LEFT JOIN ps USING (source)
           |ORDER BY ing.source""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q341MediaCapstone)
}
