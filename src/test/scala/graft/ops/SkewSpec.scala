package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SkewSpec extends AnyFunSuite with SparkSpec {

  test("salted join equals plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1L to 20000L)
      .map(i => (if (i % 10 == 0) i % 50 else 7L, i))
      .toDF("k", "row_id")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .select("k", "row_id", "name").collect().map(_.toString).sorted
    val salted = Skew.saltedEquiJoin(fact, dim, "k", col("row_id"), 8)
      .select("k", "row_id", "name").collect().map(_.toString).sorted

    assert(plain.length == 20000)
    assert(salted.sameElements(plain))
  }

  test("salting spreads the hot key across partitions") {
    import spark.implicits._
    val fact = (1L to 8000L).map(i => (7L, i)).toDF("k", "row_id")
    val dim = Seq((7L, "hot")).toDF("k", "name")
    val parts = Skew.saltedEquiJoin(fact, dim, "k", col("row_id"), 8)
      .repartition(8, col("k"), pmod(hash(col("row_id")), lit(8)))
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    // with salting the hot key's rows occupy many partitions, not one
    assert(parts.count(_ > 0) >= 4, parts.mkString(","))
  }
}
