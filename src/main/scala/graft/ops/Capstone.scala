package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** q308 — the END-TO-END COMPOSED PIPELINE capstone: every stage of a real
  * web-corpus training-data build chained over SHARED intermediates, in one
  * registered query. The per-operator inventory proves each stage in
  * isolation; this query proves they COMPOSE — the one defect class
  * (cross-operator schema/semantics drift) the per-query gates can't catch.
  *
  * The chain (each stage consumes the previous stage's frame, never the raw
  * table):
  *
  *   1. WARC ingest (q274 machinery): documents are packed 64 to a shard,
  *      serialized as real Content-Length-framed WARC response records
  *      (via [[Warc.responseRecord]] — decoy `WARC/1.0` line inside each
  *      body), and parsed BACK executor-side by [[Warc.WarcCodec]].
  *   2. HTML extraction (q273): each parsed page through
  *      [[Html.extractMain]] — chrome pruned, link-dense blocks dropped,
  *      entities decoded.
  *   3. UTF-8 validation (q280): the extracted text's bytes through
  *      [[Encoding.scan]]; only clean docs continue (all are — a Java
  *      String always encodes to well-formed UTF-8, and the oracle asserts
  *      exactly that invariant).
  *   4. Exact dedup (q24): survivor = min doc_id per content md5.
  *   5. Near-dup dedup (q25): MinHash-LSH pairs over the exact survivors
  *      via [[Dedup.minhashPairsDocs]] (24 hashes, 8 bands, exact-Jaccard
  *      ≥ 0.5 verify); every pair's HIGHER id is dropped.
  *   6. BPE tokenization (q132/q139): 5 merges trained ON THE DEDUPED
  *      CORPUS via [[Text.bpeTrainDocs]], then the corpus encoded through
  *      the broadcast vocabulary join (character fallback for
  *      non-trainable words).
  *   7. Sequence packing (q128): 2048-token blocks per (source, shard =
  *      doc_id mod 4) sub-stream from the BPE token counts.
  *   8. Temperature mixture (q305): per-language α = 0.3 budgets computed
  *      FROM the surviving corpus, realized by the deterministic md5 gate.
  *
  * Output: ONE summary row per source. The DuckDB oracle replays the whole
  * chain from `documents`: stages 1–3 are the identity on the normalized
  * text (the lossless round-trip q273/q274/q280 prove — the ENGINE must
  * earn those counts through the real parse/extract/scan path, so a
  * regression anywhere in the container/extraction stack hash-mismatches
  * here), and stages 4–8 are replayed structurally — except packing, which
  * the oracle derives in CLOSED FORM (blocks per sub-stream =
  * ⌈Σtok/2048⌉, segments per doc = floor-div span) while the engine runs
  * the real window + explode, so the two formulations must agree.
  *
  * Scale design (100 TB): every stage keeps its canonical plan — shard
  * assembly is a 64-row-bounded collect_list; parse/extract/scan are
  * map-only; exact dedup shuffles (fp, doc_id) pairs and semi-joins back;
  * LSH shuffles band keys, never text; BPE application is a broadcast
  * join; packing is one window per bounded sub-stream; mixture state is
  * ≤|langs| rows. The only corpus-wide shuffles are the dedup keys and the
  * metadata equi-join — exactly the q24/q25 shapes, unchanged by
  * composition.
  *
  * Reference scope note: `/root/reference` (pesto93/Clickhouse_data-rebalance)
  * has no pipeline surface; this is the north-star capstone the round-10
  * verdict requested.
  *
  * CACHE CONTRACT (r13 advisor note): the returned frame deliberately
  * keeps `staged`/`exactSurv`/`docToks` (and the BPE vocabulary) persisted
  * with NO unpersist — Round11PlanSpec pins the packing-window keys and
  * broadcast joins on the returned frame's OWN plan, which an eager
  * localCheckpoint would hide behind an RDD scan. Every harness caller
  * (Bench.timeOne, Verify's periodic sweep, Explain.dump) runs
  * `spark.catalog.clearCache()` after materializing a query; any NEW
  * caller of a GraftQuery fn must do the same or corpus-scale caches
  * accumulate across queries.
  */
object Capstone {

  private val Cap = 2048L
  private val NShards = 4

  val q308PipelineCapstone = GraftQuery(
    "q308_pipeline_capstone",
    (s, dir) => {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val meta = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"))
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          trim(regexp_replace(col("text"), "\\s+", " ")).as("t"))

      // ---- stage 1: WARC shards out, parse back (real container bytes)
      val recs = docs
        .withColumn("page", Html.synthesizePage(col("t")))
        .select(col("doc_id"), col("page"))
        .as[(Long, String)]
        .map { case (id, page) => (id / 64, id, Warc.responseRecord(id, page)) }
        .toDF("shard", "doc_id", "rec")
      val shards = recs.groupBy("shard") // collect_list bounded at 64 rows
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          _("rec")), "").as("blob"))
      val parsed = shards.select(col("blob")).as[String]
        .mapPartitions(_.flatMap { blob =>
          Warc.WarcCodec.parseRecords(blob.getBytes("UTF-8")).iterator.map { r =>
            val uri = r.headers.getOrElse("warc-target-uri", "")
            val body = new String(r.body, "UTF-8")
            val html = body.indexOf("\r\n\r\n") match {
              case -1 => ""
              case k  => body.substring(k + 4)
            }
            val docId = "/doc/(\\d+)$".r.findFirstMatchIn(uri)
              .map(_.group(1).toLong).getOrElse(-1L)
            (docId, html)
          }
        }).toDF("doc_id", "html")

      // ---- stage 2 + 3: extraction, then the real UTF-8 scan on its bytes
      val scanned = parsed
        .withColumn("ext", Html.extractMain(col("html")))
        .select(col("doc_id"), col("ext"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, ext) =>
          val (_, bad) = Encoding.scan(
            ext.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, ext, bad.toLong)
        }).toDF("doc_id", "ext", "n_invalid")
      // persist the parse/extract/scan chain: WARC assembly + parse, HTML
      // extraction and the UTF-8 byte scan are the pipeline's expensive
      // per-row JVM work, and `staged` feeds FIVE consumers (ingest, the
      // exact-dedup key build, the semi-join probe side, and through them
      // the LSH/BPE stages). Unpersisted, the whole chain re-executed per
      // consumer — the final plan carried ~970 Exchange nodes of duplicated
      // subtrees (plans/r13/q308_pipeline_capstone_before.txt) and planning
      // itself was part of the cost. Guide §5: cache exactly the reused,
      // expensive intermediate.
      val staged = scanned
        .join(docs, "doc_id")
        .join(meta, "doc_id")
        .select(col("doc_id"), col("source"), col("lang"), col("ext"),
          col("n_invalid"), (col("ext") === col("t")).cast("long").as("rt"))
        .persist()
      val ingest = staged.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("rt").as("n_roundtrip"),
        sum(when(col("n_invalid") === 0L, 1L).otherwise(0L)).as("n_utf8_clean"))
      val clean = staged.filter(col("n_invalid") === 0L)

      // ---- stage 4: exact dedup (q24 shape: narrow fp shuffle + semi join)
      val keepIds = clean
        .select(col("doc_id"), md5(col("ext")).as("fp"))
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      // three consumers (LSH pairs, the anti-join survivor build, the
      // per-source exact aggregate) — persist so the md5 groupBy + semi
      // join run once, not three times
      val exactSurv = clean.join(keepIds, Seq("doc_id"), "left_semi")
        .persist()

      // ---- stage 5: MinHash-LSH near-dup over the exact survivors
      val pairs = Dedup.minhashPairsDocs(s,
        exactSurv.select(col("doc_id"), col("ext").as("text")))
      val dupJ = pairs.select(col("j").as("doc_id")).distinct()
      val survivors = exactSurv.join(dupJ, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"), col("lang"), col("ext"))
        .persist() // read by BPE train, encode, packing and mixture

      // ---- stage 6: BPE trained on the DEDUPED corpus, then applied to it
      val (_, seqs) = Text.bpeTrainDocs(
        survivors.select(col("ext").as("text")), 5)
      val vocabEnc = seqs.select(
        replace(replace(col("seq"), lit("("), lit("")), lit(")"), lit(""))
          .as("word"),
        size(split(expr("substring(seq, 2, length(seq) - 2)"), "\\)\\("))
          .cast("long").as("wtoks"))
      val docToks = survivors
        .select(col("doc_id"), col("source"), col("lang"),
          explode(split(col("ext"), " ")).as("word"))
        .join(broadcast(vocabEnc), Seq("word"), "left")
        .withColumn("tok", coalesce(col("wtoks"), length(col("word")).cast("long")))
        .groupBy("doc_id", "source", "lang")
        .agg(sum("tok").as("n_tok"))
        .persist() // read by packing AND the per-source survivor aggregate

      // ---- stage 7: q128 packing per (source, doc_id % 4) sub-stream
      val w = Window.partitionBy("source", "shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val packed = docToks
        .withColumn("shard", col("doc_id") % NShards)
        .withColumn("cb", coalesce(sum("n_tok").over(w), lit(0L)))
        .filter(col("n_tok") > 0) // zero-token docs occupy no block
        .withColumn("block_id",
          explode(sequence(expr(s"cb div $Cap"),
            expr(s"(cb + n_tok - 1) div $Cap"))))
      val packStats = packed.groupBy("source").agg(
        countDistinct(col("shard"), col("block_id")).as("n_blocks"),
        count(lit(1)).as("n_segments"))

      // ---- stage 8: q305 temperature mixture over the surviving corpus
      val counts = survivors.groupBy("lang").agg(count(lit(1)).as("ln"))
      val tot = counts.agg(
        sum(pow(col("ln").cast("double"), lit(0.3))).as("wtot"),
        sum("ln").as("ntot"))
      val budgets = counts.crossJoin(broadcast(tot))
        .withColumn("budget",
          least(round(round(pow(col("ln").cast("double"), lit(0.3)) /
            col("wtot") * expr("ntot * 2 div 5"), 6)).cast("long"), col("ln")))
        .select("lang", "ln", "budget")
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long")
      val sampled = survivors.join(broadcast(budgets), "lang")
        .withColumn("keep",
          (bucket * col("ln") < col("budget") * 65536L).cast("long"))
        .groupBy("source").agg(sum("keep").as("n_sampled"))

      // ---- final per-source summary
      val exactAgg = exactSurv.groupBy("source")
        .agg(count(lit(1)).as("n_exact_survivors"))
      val survAgg = docToks.groupBy("source").agg(
        count(lit(1)).as("n_survivors"),
        sum("n_tok").as("tokens_total"))
      ingest
        .join(exactAgg, Seq("source"), "left")
        .join(survAgg, Seq("source"), "left")
        .join(packStats, Seq("source"), "left")
        .join(sampled, Seq("source"), "left")
        .select(col("source"), col("n_docs"), col("n_roundtrip"),
          col("n_utf8_clean"),
          coalesce(col("n_exact_survivors"), lit(0L)).as("n_exact_survivors"),
          coalesce(col("n_survivors"), lit(0L)).as("n_survivors"),
          coalesce(col("tokens_total"), lit(0L)).as("tokens_total"),
          coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
          coalesce(col("n_segments"), lit(0L)).as("n_segments"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy("source")
      // NOT localCheckpoint'ed/unpersisted here: Round11PlanSpec pins the
      // packing window keys and broadcast joins on this frame's own plan,
      // so the caches are left to the harness's per-query clearCache (the
      // minhashPairsDocs discipline).
    },
    Some(s"""WITH d AS MATERIALIZED (
           |  SELECT doc_id, source, lang,
           |    trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
           |  FROM documents),
           |ing AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(count(*) AS BIGINT) AS n_roundtrip,
           |    CAST(count(*) AS BIGINT) AS n_utf8_clean
           |  FROM d GROUP BY 1),
           |ek AS (SELECT md5(t) AS fp, min(doc_id) AS doc_id FROM d GROUP BY 1),
           |es AS MATERIALIZED (
           |  SELECT d.* FROM d JOIN ek USING (doc_id)),
           |mtoks AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    range(1, len(string_split(t,' '))-1),
           |    i -> string_split(t,' ')[i]||' '||string_split(t,' ')[i+1]
           |      ||' '||string_split(t,' ')[i+2])) g
           |  FROM es),
           |mti AS (SELECT doc_id, g, list_transform(g,
           |    x -> CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT)) tints
           |  FROM mtoks),
           |msig AS (SELECT doc_id, list_transform(range(0,24), h ->
           |    list_min(list_transform(tints,
           |      x -> (x*(2*h+1) + h*1000000007 + 12345) % 2147483647))) s
           |  FROM mti),
           |mbands AS (SELECT doc_id, b.b AS band,
           |    s[3*b.b+1]::VARCHAR||','||s[3*b.b+2]::VARCHAR||','
           |      ||s[3*b.b+3]::VARCHAR AS key
           |  FROM msig, range(0,8) b(b)),
           |mcand AS (SELECT DISTINCT a.doc_id i, c.doc_id j
           |  FROM mbands a JOIN mbands c
           |  ON a.band=c.band AND a.key=c.key AND a.doc_id < c.doc_id),
           |mset AS (SELECT doc_id, list_distinct(tints) ti FROM mti),
           |mver AS (SELECT i, j,
           |    len(list_filter(x.ti, e -> list_contains(y.ti, e)))::DOUBLE /
           |    (len(x.ti)+len(y.ti)
           |      -len(list_filter(x.ti, e -> list_contains(y.ti, e)))) jac
           |  FROM mcand JOIN mset x ON x.doc_id=i JOIN mset y ON y.doc_id=j),
           |dupj AS (SELECT DISTINCT j AS doc_id FROM mver WHERE jac >= 0.5),
           |sv AS MATERIALIZED (
           |  SELECT * FROM es
           |  WHERE doc_id NOT IN (SELECT doc_id FROM dupj)),
           |${Text.bpeMergeCtes("(SELECT t AS text FROM sv)")},
           |venc AS (SELECT replace(replace(seq,'(',''),')','') AS word,
           |    len(string_split(substr(seq, 2, length(seq)-2), ')(')) AS wtoks
           |  FROM s5),
           |cw AS (SELECT doc_id, source, lang,
           |    unnest(string_split(t, ' ')) AS word FROM sv),
           |dt AS MATERIALIZED (
           |  SELECT doc_id, source, lang,
           |    CAST(sum(coalesce(wtoks, length(word))) AS BIGINT) AS n_tok
           |  FROM cw LEFT JOIN venc USING (word) GROUP BY 1, 2, 3),
           |-- packing in CLOSED FORM (the engine runs the real window +
           |-- explode; the two formulations must agree): blocks per
           |-- sub-stream = ceil(sum/2048), segments per doc = span width
           |pk AS (SELECT source, doc_id % $NShards AS shard, doc_id, n_tok,
           |    CAST(coalesce(sum(n_tok) OVER (
           |      PARTITION BY source, doc_id % $NShards ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS cb
           |  FROM dt),
           |ps AS (
           |  SELECT source, CAST(sum(nb) AS BIGINT) AS n_blocks,
           |    CAST(sum(ns) AS BIGINT) AS n_segments
           |  FROM (
           |    SELECT source, shard,
           |      (sum(n_tok) + ${Cap - 1}) // $Cap AS nb,
           |      sum(CASE WHEN n_tok > 0 THEN
           |        (cb + n_tok - 1) // $Cap - cb // $Cap + 1 ELSE 0 END) AS ns
           |    FROM pk GROUP BY 1, 2)
           |  GROUP BY 1),
           |lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS ln FROM sv GROUP BY 1),
           |tt AS (SELECT sum(pow(ln, 0.3)) AS wtot,
           |    CAST(sum(ln) AS BIGINT) AS ntot FROM lc),
           |bg AS (SELECT lang, ln,
           |    least(CAST(round(round(pow(ln, 0.3) / wtot
           |      * (ntot * 2 // 5), 6)) AS BIGINT), ln) AS budget
           |  FROM lc CROSS JOIN tt),
           |smp AS (SELECT sv.source,
           |    CAST(sum(CASE WHEN
           |        CAST(concat('0x', substr(md5(sv.doc_id::VARCHAR), 1, 4))
           |          AS BIGINT) * bg.ln < bg.budget * 65536
           |      THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
           |  FROM sv JOIN bg USING (lang) GROUP BY 1),
           |ea AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact_survivors
           |  FROM es GROUP BY 1),
           |sa AS (SELECT source, CAST(count(*) AS BIGINT) AS n_survivors,
           |    CAST(sum(n_tok) AS BIGINT) AS tokens_total
           |  FROM dt GROUP BY 1)
           |SELECT ing.source, n_docs, n_roundtrip, n_utf8_clean,
           |  CAST(coalesce(ea.n_exact_survivors, 0) AS BIGINT) AS n_exact_survivors,
           |  CAST(coalesce(sa.n_survivors, 0) AS BIGINT) AS n_survivors,
           |  CAST(coalesce(sa.tokens_total, 0) AS BIGINT) AS tokens_total,
           |  CAST(coalesce(ps.n_blocks, 0) AS BIGINT) AS n_blocks,
           |  CAST(coalesce(ps.n_segments, 0) AS BIGINT) AS n_segments,
           |  CAST(coalesce(smp.n_sampled, 0) AS BIGINT) AS n_sampled
           |FROM ing
           |LEFT JOIN ea USING (source)
           |LEFT JOIN sa USING (source)
           |LEFT JOIN ps USING (source)
           |LEFT JOIN smp USING (source)
           |ORDER BY ing.source""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q308PipelineCapstone)
}
