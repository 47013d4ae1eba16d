package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ScaleFrames

/** The ScaleFrames quantile machinery replaces Spark's exact `percentile`
  * aggregate in four registered queries (q221/q242 global, q199 grouped
  * ×2) — the whole point is that its two-level rank + interpolation is
  * BIT-IDENTICAL to `percentile`, so the unchanged DuckDB oracles keep
  * matching. These tests pin that equivalence on real fixture columns
  * covering the delicate cases: near-unique continuous values
  * (interpolation between distinct order statistics), tie-heavy integer
  * values (cum counts jump past both bracketing ranks at once), integral
  * positions (frac = 0 must return the order statistic exactly), and
  * single-value groups.
  */
class ScaleFramesSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("thresholdsWideDomain ≡ round(percentile, 6) on near-unique doubles") {
    val li = Tables.lineitem(spark, sf).select(col("l_extendedprice").as("v"))
    val fracs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    val got = ScaleFrames.thresholdsWideDomain(li, "v", 1000.0, fracs)
    val exprs = fracs.zipWithIndex.map { case (f, i) =>
      round(expr(s"percentile(v, $f)"), 6).as(s"t$i")
    }
    val row = li.agg(exprs.head, exprs.tail: _*).head()
    val want = fracs.indices.map(row.getDouble)
    assert(got == want, s"got $got, want $want")
  }

  test("thresholdsWideDomain ≡ percentile on tie-heavy integers") {
    // l_quantity: ~50 distinct values, thousands of ties — cum counts jump
    // far past the bracketing ranks; floor/ceil order statistics coincide
    val li = Tables.lineitem(spark, sf).select(col("l_quantity").as("v"))
    val fracs = (1 to 9).map(_ / 10.0)
    val got = ScaleFrames.thresholdsWideDomain(li, "v", 8.0, fracs)
    val exprs = fracs.zipWithIndex.map { case (f, i) =>
      round(expr(s"percentile(v, $f)"), 6).as(s"t$i")
    }
    val row = li.agg(exprs.head, exprs.tail: _*).head()
    val want = fracs.indices.map(row.getDouble)
    assert(got == want, s"got $got, want $want")
  }

  test("groupedQuantileWideDomain ≡ grouped percentile (continuous, and a " +
    "single-row group)") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("event_type").as("g"), col("value").as("v"))
      // a synthetic one-row group exercises n = 1 (pos = 0, rlo = rhi = 1)
      .unionByName(Seq(("only_one", 42.125)).toDF("g", "v"))
    val got = ScaleFrames
      .groupedQuantileWideDomain(ev, "g", "v", 32.0, 0.5, "q")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = ev.groupBy("g").agg(expr("percentile(v, 0.5)").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == want.keySet)
    for ((g, w) <- want)
      assert(got(g) == w, s"group $g: got ${got(g)}, want $w (bit compare)")
    assert(got("only_one") == 42.125)
  }

  test("twoLevelCumsum ≡ a global-window running sum (grouped, multi-column)") {
    // The shared machinery behind thresholdsWideDomain / grouped quantiles /
    // q205 / q243: pin it directly against the single-partition window form
    // it replaces, over a grouped multi-sum shape with long AND double
    // columns (coalesce(sum, 0) must preserve both types).
    import org.apache.spark.sql.expressions.Window
    val byV = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("v"))
      // quarter-integral weights: every partial sum is fp-exact, so the
      // two accumulation orders (sequential window vs bucket+offset) are
      // bit-identical — the same discipline q205's integral weights rely on
      .agg(count(lit(1)).as("c"), sum(col("l_quantity") * lit(0.25)).as("w"))
      .withColumn("bkt", floor(col("v") / 8.0).cast("long"))
    val got = ScaleFrames
      .twoLevelCumsum(byV, Seq("g"), "bkt", "v", Seq("c" -> "cc", "w" -> "cw"))
      .select("g", "v", "cc", "cw")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val wg = Window.partitionBy("g").orderBy("v")
    val want = byV
      .withColumn("cc", sum("c").over(wg)).withColumn("cw", sum("w").over(wg))
      .select("g", "v", "cc", "cw")
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    for ((k, w) <- want)
      assert(got(k) == w, s"key $k: got ${got(k)}, want $w")
  }

  test("binAsc/binDesc: a value exactly equal to a threshold stays in the " +
    "lower/upper bucket respectively (the documented tie discipline)") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val asc = df.select(ScaleFrames.binAsc(col("v"), Seq(2.0)).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(asc == Seq(1, 1, 2)) // v > t strictly: 2.0 stays in bucket 1
    val desc = df.select(ScaleFrames.binDesc(col("v"), Seq(2.0)).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(desc == Seq(2, 1, 1)) // v < t strictly: 2.0 stays in bucket 1
  }
}
