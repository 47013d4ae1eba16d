package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** q135's narrow shuffle key: grouping winnow fingerprints by
  * (xxhash64(gram), md5-prefix) instead of the 40-char gram string. The
  * text-level verification the production path deliberately skips happens
  * HERE: group purity (no key collision across distinct grams) and row
  * parity against the wide group-by-gram formulation.
  */
class WinnowGroupingSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("narrow (h, fp) groups are gram-pure on the fixture") {
    val sel = Dedup.winnowSelected(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")), 40, 8)
    val impure = sel
      .select(xxhash64(col("gram")).as("h"),
        substring(md5(col("gram")), 1, 12).as("fp"), col("gram"))
      .groupBy("h", "fp")
      .agg(countDistinct("gram").as("ng"))
      .filter(col("ng") > 1)
      .count()
    assert(impure == 0L)
  }

  test("narrow-key q135 equals the wide group-by-gram formulation") {
    val wide = Dedup.winnowSelected(
      Tables.documents(spark, sf).select(col("doc_id"), col("text")), 40, 8)
      .groupBy("gram")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 2)
      .select(substring(md5(col("gram")), 1, 12).as("fp"),
        col("n_docs"), col("n_occ"))
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("fp"))
      .limit(20)
      .collect().map(_.toString).toSeq
    val narrow = Dedup.q135SubstringWinnow.fn(spark, sf)
      .collect().map(_.toString).toSeq
    assert(narrow == wide)
  }
}
