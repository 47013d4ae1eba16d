package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q167's BM25 ranking function, pinned on a corpus small enough to check
  * by hand: the idf term rewards rarity, the k₁ saturation bounds raw tf,
  * and the b length norm penalizes long documents. Also pins the plan
  * shape that makes it scale — the query batch joins the postings as the
  * BROADCAST side, so scoring never shuffles the corpus beyond the tf agg.
  */
class Bm25Spec extends AnyFunSuite with SparkSpec {

  // doc 10 shares the RARE term, doc 11 the COMMON one; with equal tf and
  // equal length, idf alone must order them.
  test("rare-term match outranks common-term match at equal tf and length") {
    import spark.implicits._
    val docs = Seq(
      (0L, "rare common"),                  // the query doc
      (10L, "rare filler1 filler2"),
      (11L, "common filler3 filler4"),
      (12L, "common other1 other2"),
      (13L, "common other3 other4"))
      .toDF("doc_id", "text")
    val out = bm25(docs, queryIds = Set(0L))
    val ranked = out.filter(col("qid") === 0L)
      .orderBy("rank").select("cid").as[Long].collect()
    assert(ranked.head === 10L, s"rare-term doc should rank first: ${ranked.toSeq}")
  }

  test("at equal tf, the shorter document scores higher (length norm)") {
    import spark.implicits._
    val docs = Seq(
      (0L, "needle"),
      (10L, "needle pad1"),
      (11L, "needle pad1 pad2 pad3 pad4 pad5 pad6 pad7"))
      .toDF("doc_id", "text")
    val out = bm25(docs, queryIds = Set(0L)).filter(col("qid") === 0L)
      .orderBy("rank").select("cid").as[Long].collect()
    assert(out.toSeq === Seq(10L, 11L))
  }

  test("score matches the closed form on a one-term corpus") {
    import spark.implicits._
    // N = 2 docs, term df = 2 (query doc + candidate), candidate len 2,
    // avgdl = 1.5, tf = 1:
    //   idf = ln((2 - 2 + .5)/(2 + .5) + 1) = ln(1.2)
    //   c   = idf * 1 * 2.2 / (1 + 1.2*(0.25 + 0.75*2/1.5)) = idf*2.2/2.5
    val docs = Seq((0L, "x"), (10L, "x x0")).toDF("doc_id", "text")
    val got = bm25(docs, queryIds = Set(0L))
      .filter(col("qid") === 0L && col("cid") === 10L)
      .select("score").as[Double].head()
    val expect = BigDecimal(math.log(1.2) * 2.2 / 2.5)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === expect)
  }

  test("the query-terms side of the scoring join is broadcast") {
    val plan = Retrieval.q167Bm25TopK.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  /** The q167 pipeline re-parameterized over an in-memory corpus. */
  private def bm25(docs: org.apache.spark.sql.DataFrame, queryIds: Set[Long]) = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val len = toks.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val nAvg = len.agg(count(lit(1)).cast("double").as("n"),
      avg(col("len")).as("avgdl")).first()
    val (n, avgdl) = (nAvg.getDouble(0), nAvg.getDouble(1))
    val idf = tf.groupBy("t").agg(count(lit(1)).as("df"))
      .select(col("t"),
        log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0).as("idf"))
    val qTerms = tf.filter(col("doc_id").isin(queryIds.toSeq: _*))
      .select(col("doc_id").as("qid"), col("t")).distinct()
    val contrib = tf.join(len, "doc_id")
      .join(broadcast(qTerms), Seq("t"))
      .filter(col("doc_id") =!= col("qid"))
      .join(idf, "t")
      .select(col("qid"), col("doc_id").as("cid"),
        (col("idf") * col("tf") * lit(2.2) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") / lit(avgdl))))
          .as("c"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score"), col("cid"))
    contrib.groupBy("qid", "cid").agg(round(sum(col("c")), 3).as("score"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= 5)
  }
}
