package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the native Jaro-Winkler expression to ground-truth values obtained
  * from DuckDB 1.0's independent C++ implementation (the rapidfuzz
  * lineage) — BIT-exact equality, no tolerance: the q374 oracle gate
  * hash-compares raw doubles, so any ULP drift here is a correctness
  * failure there. The table covers the published textbook cases
  * (MARTHA/MARHTA, DIXON/DICKSONX), the boost-threshold boundary
  * (prefix > 0 with jaro ≤ 0.7 must NOT boost), zero-match and
  * window-exclusion cases, and the customer-name shapes q374 feeds.
  */
class JaroWinklerSpec extends AnyFunSuite with SparkSpec {

  private val duckdbTruth: Seq[(String, String, Double)] = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DWAYNE", "DUANE", 0.8400000000000001),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("Customer#000000001", "Customer#000000002", 0.9777777777777777),
    ("Customer#000000019", "Customer#00000001X", 0.9777777777777777),
    ("Customer#000000019", "Customer#0000000XX", 0.9555555555555556),
    ("Customer#000000012", "Customer#000000021", 0.9888888888888889),
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("a", "a", 1.0),
    ("ab", "ba", 0.0),
    ("aaaaaaaaaab", "aaaaaaaaaba", 0.9818181818181818),
    ("CRATE", "TRACE", 0.7333333333333334),
    ("abcdxx", "xxabcd", 0.7777777777777777),
    ("x", "xy", 0.8500000000000001),
    ("trace", "tracexxxxxxxxx", 0.8714285714285714),
    ("Customer#000000145", "Customer#00000014", 0.9888888888888889),
    ("AL", "ALIMENTATION", 0.7777777777777779),
    ("PENNSYLVANIA", "PENNCISYLVANIA", 0.9214285714285715),
    // boost-threshold boundary: common prefix but jaro <= 0.7 — no boost
    ("abcdefghij", "abxxxxxxxx", 0.4666666666666666),
    ("ab", "axxxxxxxxx", 0.5333333333333333),
    ("abcd", "abyz", 0.6666666666666666),
    ("aqrstuvw", "azzzzzzz", 0.4166666666666667),
    // empty-side semantics pinned to DuckDB: always 0.0
    ("", "abc", 0.0),
    ("", "", 0.0))

  test("JaroWinklerImpl matches DuckDB bit-for-bit on the truth table") {
    duckdbTruth.foreach { case (a, b, expect) =>
      val got = JaroWinklerImpl.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == expect, s"jw($a, $b): got $got expected $expect")
      // symmetry (the algorithm is symmetric; the window uses max len)
      val rev = JaroWinklerImpl.similarity(
        UTF8String.fromString(b), UTF8String.fromString(a))
      assert(rev == expect, s"jw($b, $a): got $rev expected $expect")
    }
  }

  test("expression agrees with impl through codegen, and nulls pass through") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = duckdbTruth.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .withColumn("jw", GraftFunctions.jaroWinkler(col("a"), col("b")))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows.toSet == duckdbTruth.toSet)
    val nulls = Seq((Option("abc"), Option.empty[String]),
      (Option.empty[String], Option("abc")))
      .toDF("a", "b")
      .withColumn("jw", GraftFunctions.jaroWinkler(col("a"), col("b")))
      .collect()
    assert(nulls.forall(_.isNullAt(2)))
  }
}
