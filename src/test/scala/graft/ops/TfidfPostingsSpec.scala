package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** q152's stopword guard: terms with df = N have tf-idf weight exactly
  * ln(N/df) = 0, so dropping them before the postings self-join is
  * provably output-identical — and on this shared-vocabulary fixture the
  * df = N terms are precisely the hottest postings lists, i.e. the n²
  * skew bomb at corpus scale. Pinned here: the guard actually excludes a
  * universal stopword (synthetic corpus — the fixture's max df is 126/150),
  * the surviving index is bounded (hottest postings list strictly below the
  * document count), and the filtered output equals the unfiltered
  * formulation row-for-row on both corpora.
  */
class TfidfPostingsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val tf = Tables.documents(spark, sf).filter(col("doc_id") < 150)
    .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
    .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    .persist()
  private lazy val df = tf.groupBy("t").agg(count(lit(1)).as("df")).persist()
  private lazy val n = tf.select(countDistinct("doc_id")).first().getLong(0)

  // the fixture's max df is 126 of 150 docs, so the guard is exercised on a
  // synthetic corpus where a true universal stopword exists
  test("a df = N stopword is excluded from postings and changes no cosine") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the alpha beta"), (1L, "the alpha gamma"),
      (2L, "the delta gamma"), (3L, "the delta beta epsilon"))
      .toDF("doc_id", "text")
    val stf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
    val sdf = stf.groupBy("t").agg(count(lit(1)).as("df"))
    val sn = 4L
    val joined = stf.join(sdf, "t")
    // "the" appears in every doc → weight 0 → must not survive the filter
    val survivors = joined.filter(col("df") < sn)
      .select("t").distinct().as[String].collect().toSet
    assert(!survivors.contains("the") && survivors.nonEmpty)
    // and dropping it is output-identical on the full pair pipeline. The
    // POSITIVE cosine threshold is load-bearing: a pair sharing only the
    // stopword yields a dot = 0 row without the filter and no row with it,
    // and only the threshold makes those agree — which q152 has (>= 0.75).
    def pairs(postings: org.apache.spark.sql.DataFrame) = {
      val w = postings.select(col("doc_id"), col("t"),
        (col("tf") * log(lit(sn.toDouble) / col("df"))).as("w"))
      val nrm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      w.select(col("doc_id").as("i"), col("t"), col("w").as("wa"))
        .join(w.select(col("doc_id").as("j"), col("t"), col("w").as("wb")), Seq("t"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(sum(col("wa") * col("wb")).as("dot"))
        .join(nrm.select(col("doc_id").as("i"), col("nrm").as("na")), "i")
        .join(nrm.select(col("doc_id").as("j"), col("nrm").as("nb")), "j")
        .withColumn("cosim", round(col("dot") / (col("na") * col("nb")), 5))
        .filter(col("cosim") >= 0.2)
        .select(col("i"), col("j"), col("cosim"))
        .orderBy("i", "j")
        .collect().map(_.toString).toSeq
    }
    assert(pairs(joined.filter(col("df") < sn)) == pairs(joined))
  }

  test("hottest surviving postings list is strictly below the document count") {
    val hottest = df.filter(col("df") < n)
      .agg(max("df")).first().getLong(0)
    assert(hottest < n,
      s"surviving postings list of length $hottest not below doc count $n")
  }

  test("dropping weight-zero postings leaves q152's output unchanged") {
    def pairs(postings: org.apache.spark.sql.DataFrame) = {
      val w = postings
        .select(col("doc_id"), col("t"),
          (col("tf") * log(lit(n.toDouble) / col("df"))).as("w"))
      val nrm = w.groupBy("doc_id").agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
      val dots = w.select(col("doc_id").as("i"), col("t"), col("w").as("wa"))
        .join(w.select(col("doc_id").as("j"), col("t"), col("w").as("wb")), Seq("t"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(sum(col("wa") * col("wb")).as("dot"))
      dots
        .join(nrm.select(col("doc_id").as("i"), col("nrm").as("na")), "i")
        .join(nrm.select(col("doc_id").as("j"), col("nrm").as("nb")), "j")
        .withColumn("cosim", col("dot") / (col("na") * col("nb")))
        .filter(col("cosim") >= 0.75)
        .select(col("i"), col("j"), round(col("cosim"), 5).as("cosim"))
        .orderBy("i", "j")
        .collect().map(_.toString).toSeq
    }
    val all = tf.join(df, "t")
    val filtered = pairs(all.filter(col("df") < n))
    val unfiltered = pairs(all)
    assert(filtered == unfiltered)
    assert(filtered == Retrieval.q152TfidfCosinePairs.fn(spark, sf)
      .collect().map(_.toString).toSeq)
  }
}
