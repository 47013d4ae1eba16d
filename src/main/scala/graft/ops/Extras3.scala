package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Round-2 surface: banded SimHash candidate generation (the no-N² scale
  * path), FULL OUTER join, built-in higher-order-function vector math, text
  * normalization, and SCD2 effective-dating.
  */
object Extras3 {

  /** Banded SimHash near-dup at Hamming ≤ 3 — the Manku/Jain/Sarma web-dedup
    * shape: split the 60-bit signature into 4 bands of 15 bits; any pair
    * within Hamming distance 3 agrees EXACTLY on at least one band
    * (pigeonhole), so candidates come from equi-joins on (band, chunk)
    * buckets and the exact bit_count verify only touches candidates. This is
    * the scale path q27's all-pairs form cannot take at 100 TB: the shuffle
    * is keyed by 15-bit band chunks, never doc×doc.
    */
  val q76SimhashBanded = GraftQuery(
    "q76_simhash_banded",
    (s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val sig = Tables.documents(s, dir)
        .withColumn("tints", graft.functions.GraftFunctions.shingle3(col("text"), 15))
        .filter(size(col("tints")) > 0)
        .withColumn("h", graft.functions.GraftFunctions.simhash60(col("tints")))
        .select(col("doc_id"), col("h"))
        .persist()
      val bands = sig.select(
        col("doc_id"), col("h"),
        posexplode(expr("transform(sequence(0, 3), b -> shiftrightunsigned(h, b * 15) & 32767)")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      val out = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
          col("a.h").as("hi"), col("b.h").as("hj"))
        .distinct()
        .withColumn("ham", bit_count(col("hi").bitwiseXOR(col("hj"))))
        .filter(col("ham") <= 3)
        .select(col("i"), col("j"), col("ham"))
        .orderBy("i", "j")
        // materialize the pair list, then release the signature cache
        // (both join sides read it) instead of pinning it for the session
        .localCheckpoint()
      sig.unpersist()
      out
    },
    // oracle recomputes the identical signatures but pairs all-at-once —
    // banding only changes candidate generation, never the result set
    Some("""WITH toks AS (
           |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text,' '))-1),
           |    i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) g
           |  FROM documents),
           |ti AS (SELECT doc_id, unnest(list_transform(g,
           |  t -> CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT))) t FROM toks),
           |b AS (SELECT doc_id, r.bit, sum(((t >> r.bit) & 1)*2 - 1) bsum
           |  FROM ti, range(0,60) r(bit) GROUP BY 1, 2),
           |sh AS (SELECT doc_id, sum(CASE WHEN bsum > 0 THEN (1::BIGINT << bit) ELSE 0 END) h
           |  FROM b GROUP BY 1)
           |SELECT a.doc_id i, c.doc_id j, bit_count(xor(a.h, c.h)) ham
           |FROM sh a, sh c WHERE a.doc_id < c.doc_id AND bit_count(xor(a.h, c.h)) <= 3
           |ORDER BY i, j""".stripMargin))

  /** FULL OUTER join: per-nation premium-customer vs high-balance-supplier
    * rollups — either side can be absent, so the join preserves unmatched
    * nations from both. coalesce() folds the two key columns.
    */
  val q77FullOuter = GraftQuery(
    "q77_full_outer",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("cust_bal"))
      val su = Tables.supplier(s, dir)
        .filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"), round(sum("s_acctbal"), 2).as("supp_bal"))
      c.join(su, col("ck") === col("sk"), "full_outer")
        .select(
          coalesce(col("ck"), col("sk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          col("cust_bal"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          col("supp_bal"))
        .orderBy("nationkey")
    },
    Some("""WITH c AS (SELECT c_nationkey ck, count(*) n_cust,
           |    round(sum(c_acctbal), 2) cust_bal
           |  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
           |s AS (SELECT s_nationkey sk, count(*) n_supp,
           |    round(sum(s_acctbal), 2) supp_bal
           |  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
           |SELECT coalesce(ck, sk) AS nationkey,
           |  coalesce(n_cust, 0) AS n_cust, cust_bal,
           |  coalesce(n_supp, 0) AS n_supp, supp_bal
           |FROM c FULL OUTER JOIN s ON ck = sk ORDER BY nationkey""".stripMargin))

  /** Vector math through built-in higher-order functions only — `aggregate`
    * and `transform` stay inside codegen with zero custom expressions, the
    * pure-Spark fallback when the fused kernels aren't registered.
    */
  val q78HofVector = GraftQuery(
    "q78_hof_vector",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") < 20)
        .withColumn("v", col("embedding").cast("array<double>"))
        .select(
          col("vec_id"),
          round(sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)), 6).as("l2"),
          round(aggregate(col("v"), lit(0.0), (acc, x) => acc + abs(x)), 6).as("l1"),
          round(aggregate(col("v"), lit(0.0), (acc, x) => acc + x) / size(col("v")), 6).as("mean"),
          round(array_max(col("v")), 6).as("vmax"))
        .orderBy("vec_id"),
    Some("""SELECT vec_id,
           |  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS l2,
           |  round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1,
           |  round(list_sum(embedding::DOUBLE[]) / len(embedding), 6) AS mean,
           |  round(list_max(embedding::DOUBLE[]), 6) AS vmax
           |FROM embeddings WHERE vec_id < 20 ORDER BY vec_id""".stripMargin))

  /** Text normalization — the canonical pre-dedup cleaning pass: lowercase,
    * strip non-alphanumerics, collapse runs of whitespace, trim. Dup
    * accounting on the normalized form catches near-identical docs that
    * differ only in case/punctuation/spacing.
    */
  val q79TextNormalize = GraftQuery(
    "q79_text_normalize",
    (s, dir) => {
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      Tables.documents(s, dir)
        .withColumn("norm", norm)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("raw_unique"),
          countDistinct(md5(col("norm"))).as("norm_unique"),
          sum(length(col("norm"))).as("norm_chars"))
        .orderBy("lang")
    },
    Some("""WITH n AS (SELECT lang, text,
           |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
           |       ' +', ' ', 'g')) AS norm
           |  FROM documents)
           |SELECT lang, count(*) AS n_docs,
           |  count(DISTINCT md5(text)) AS raw_unique,
           |  count(DISTINCT md5(norm)) AS norm_unique,
           |  CAST(sum(length(norm)) AS BIGINT) AS norm_chars
           |FROM n GROUP BY 1 ORDER BY 1""".stripMargin))

  /** SCD2 effective-dating: each customer's order history becomes
    * [valid_from, valid_to) intervals via lead() — valid_to NULL marks the
    * current row. One window per customer partition, no self-join.
    */
  val q80Scd2 = GraftQuery(
    "q80_scd2",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 50)
        .withColumn("valid_from", col("o_orderdate").cast("date"))
        .withColumn("valid_to", lead(col("o_orderdate").cast("date"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull.cast("int"))
        .select(col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
          col("valid_from"), col("valid_to"), col("is_current"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("custkey", "valid_from", "orderkey")
    },
    Some("""SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           |  CAST(o_orderdate AS DATE) AS valid_from,
           |  lead(CAST(o_orderdate AS DATE)) OVER
           |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
           |  CASE WHEN lead(o_orderdate) OVER
           |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL
           |    THEN 1 ELSE 0 END AS is_current,
           |  round(o_totalprice, 2) AS price
           |FROM orders WHERE o_custkey < 50
           |ORDER BY custkey, valid_from, orderkey""".stripMargin))

  /** Semi-structured props through Spark 4's VariantType: parse once into
    * the binary variant encoding, extract typed paths with variant_get —
    * the shredded-JSON path that replaces per-row string re-parsing (each
    * get_json_object call re-tokenizes the string; a variant parses once).
    */
  val q81VariantJson = GraftQuery(
    "q81_variant_json",
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("v", parse_json(col("props")))
        .withColumn("k", try_variant_get(col("v"), "$.k", "int"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          count(col("k")).as("n_k"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, count(*) AS n,
           |  count(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,
           |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           |  min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  /** In-flight audit metrics via `observe`: the quality counters ride the
    * SAME pass that does the real work (here a parquet sink write) — at
    * 100 TB a separate audit scan doubles the read; an Observation makes it
    * free. The returned row is the observed metrics; the oracle recomputes
    * them declaratively.
    */
  val q82ObserveAudit = GraftQuery(
    "q82_observe_audit",
    (s, dir) => {
      val obs = new org.apache.spark.sql.Observation()
      val out = graft.WorkDir.resolve(s, "observe", dir)
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 10)
        .observe(obs,
          count(lit(1)).as("n"),
          round(sum("l_quantity"), 2).as("qty"),
          round(sum("l_extendedprice"), 2).as("price"),
          max("l_orderkey").as("max_order"))
        .write.mode("overwrite").parquet(out)
      val m = obs.get
      import s.implicits._
      // Option-wrap: sum/max observe NULL over an empty filtered slice —
      // a bare asInstanceOf would NPE instead of carrying the NULL the
      // oracle also returns
      Seq((m("n").asInstanceOf[Long],
        Option(m("qty")).map(_.asInstanceOf[Double]),
        Option(m("price")).map(_.asInstanceOf[Double]),
        Option(m("max_order")).map(_.asInstanceOf[Long])))
        .toDF("n", "qty", "price", "max_order")
    },
    Some("""SELECT count(*) AS n, round(sum(l_quantity), 2) AS qty,
           |  round(sum(l_extendedprice), 2) AS price,
           |  max(l_orderkey) AS max_order
           |FROM lineitem WHERE l_quantity > 10""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q76SimhashBanded, q77FullOuter, q78HofVector,
    q79TextNormalize, q80Scd2, q81VariantJson, q82ObserveAudit)
}
