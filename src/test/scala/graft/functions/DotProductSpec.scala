package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DotProductSpec extends AnyFunSuite with SparkSpec {

  test("fused dot product is bitwise-equal to the HOF fold") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
      (Seq.fill(64)(0.123456789), Seq.fill(64)(-0.987654321))
    ).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("fused"), hof.as("ref")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fused=${r.getDouble(0)} ref=${r.getDouble(1)}")
    }
  }

  test("null array yields null; mismatched lengths throw") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val nulls = Seq((Some(Seq(1.0, 2.0)), None: Option[Seq[Double]])).toDF("a", "b")
    assert(nulls.select(GraftFunctions.dot(col("a"), col("b"))).collect()(0).isNullAt(0))
    // a short/malformed embedding must fail loudly, not return a plausible
    // truncated similarity (dense fixed-dimension contract)
    val bad = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 10.0))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.dot(col("a"), col("b"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => c.getMessage != null && c.getMessage.contains("length mismatch")))
  }

  test("SQL registration via extensions builder function") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .first().getDouble(0)
    assert(r == 11.0)
  }

  test("rejects non-double-array inputs at analysis time") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot('a', 'b')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
