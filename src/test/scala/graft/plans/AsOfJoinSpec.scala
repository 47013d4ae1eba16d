package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {

  private def trades = {
    import spark.implicits._
    Seq(
      // (key, time, trade_id)
      ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
      ("B", 15L, 4L), ("B", 15L, 5L), // same key+time left rows
      ("C", 5L, 6L) // key with no quotes at all
    ).toDF("k", "t", "trade_id")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      ("A", 5L, 100.0), ("A", 10L, 101.0), ("A", 25L, 102.0),
      ("B", 15L, 200.0),
      ("D", 1L, 300.0) // key with no trades
    ).toDF("qk", "qt", "px")
  }

  test("strict backward as-of matches the greatest quote time < trade time") {
    graft.functions.GraftFunctions.register(spark)
    val out = AsOfJoin.join(trades, quotes, Seq("k" -> "qk"), "t", "qt")
      .select("trade_id", "px").orderBy("trade_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq == Seq(
      1L -> 100.0, // t=10: strict excludes qt=10, picks qt=5
      2L -> 101.0, // t=20: qt=10
      3L -> 102.0, // t=30: qt=25
      4L -> null, 5L -> null, // t=15 strict excludes qt=15
      6L -> null)) // no quotes for C
  }

  test("non-strict as-of admits equal timestamps") {
    graft.functions.GraftFunctions.register(spark)
    val out = AsOfJoin.join(trades, quotes, Seq("k" -> "qk"), "t", "qt", strict = false)
      .select("trade_id", "px").orderBy("trade_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
    assert(out.toSeq == Seq(
      1L -> 101.0, // qt=10 now admissible
      2L -> 101.0, 3L -> 102.0,
      4L -> 200.0, 5L -> 200.0, // qt=15 admissible for both tied trades
      6L -> null))
  }

  test("null keys never match") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val l = Seq((Some("A"), 10L, 1L), (None, 10L, 2L)).toDF("k", "t", "id")
    val r = Seq((Some("A"), 5L, 1.0), (None, 5L, 2.0)).toDF("qk", "qt", "v")
    val out = AsOfJoin.join(l, r, Seq("k" -> "qk"), "t", "qt")
      .select("id", "v").orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.0)
    assert(out(1).isNullAt(1))
  }

  test("null TIMES never match: `r.t < l.t` is unknown under SQL semantics") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // natural ascending ordering ranks NULL smallest, so an unguarded
    // merge would take the null-time quote as a valid as-of candidate
    val l = Seq(
      (Some("A"), Some(10L), 1L), // real quote exists at qt=5
      (Some("B"), Some(10L), 2L), // only a null-time quote: must not match
      (Some("A"), None: Option[Long], 3L) // null left time: must not match
    ).toDF("k", "t", "id")
    val r = Seq(
      (Some("A"), Some(5L), 1.0),
      (Some("B"), None: Option[Long], 2.0)
    ).toDF("qk", "qt", "v")
    val out = AsOfJoin.join(l, r, Seq("k" -> "qk"), "t", "qt")
      .select("id", "v").orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.0)
    assert(out(1).isNullAt(1), "null right time must never be a candidate")
    assert(out(2).isNullAt(1), "null left time must never match")
    // non-strict mode must also not treat NULL == NULL as a tie match
    val ns = AsOfJoin.join(l, r, Seq("k" -> "qk"), "t", "qt", strict = false)
      .select("id", "v").orderBy("id").collect()
    assert(ns(1).isNullAt(1) && ns(2).isNullAt(1))
  }

  test("matches the window-based formulation on a larger random-ish input") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // deterministic pseudo-random data via hashing
    val n = 5000
    val left = spark.range(n).select(
      (col("id") % 37).as("k"),
      (abs(hash(col("id"))) % 1000).cast("long").as("t"),
      col("id"))
    val right = spark.range(n / 2).select(
      (col("id") % 37).as("rk"),
      (abs(hash(col("id") + 7)) % 1000).cast("long").as("rt"),
      // unique per (rk, rt): keep max payload like the dedup discipline
      col("id").as("payload"))
      .groupBy("rk", "rt").agg(max("payload").as("payload"))
    val native = AsOfJoin.join(left, right, Seq("k" -> "rk"), "t", "rt")
      .select(col("id"), col("payload")).orderBy("id").collect()
    // reference: union trick + carry-forward window (the q40 pattern)
    val tagged = left.select(col("k"), col("t"), col("id"), lit(null).cast("long").as("payload"), lit(1).as("isL"))
      .unionAll(right.select(col("rk"), col("rt"), lit(null).cast("long"), col("payload"), lit(0)))
    import org.apache.spark.sql.expressions.Window
    // strictly-before: order right rows (isL=0) ahead of left rows at equal
    // times is WRONG for strict; instead exclude equal times by offsetting
    // right times +1 is wrong too for longs with adjacent values... use
    // rows-frame over (t, isL) ordering: at equal t, left (isL=1) sorts
    // after right (isL=0), so lag-carry INCLUDES equal-time rights — that's
    // non-strict. For the strict reference, shift right times by +1 only
    // in ordering via a composite sort key (t, isL) on (t*2 + isL) scaled:
    val w = Window.partitionBy("k").orderBy(col("sortk")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = tagged
      // strict: right row at time rt is admissible for left at t>rt, i.e.
      // sort key 2*rt+1 < 2*t (left key 2*t) — equal times excluded
      .withColumn("sortk", col("t") * 2 + when(col("isL") === 1, 0).otherwise(1))
      .withColumn("carried", last(col("payload"), ignoreNulls = true).over(w))
      .filter(col("isL") === 1)
      .select(col("id"), col("carried").as("payload")).orderBy("id").collect()
    assert(native.length == ref.length)
    native.zip(ref).foreach { case (a, b) =>
      val av = if (a.isNullAt(1)) null else a.getLong(1)
      val bv = if (b.isNullAt(1)) null else b.getLong(1)
      assert(av == bv, s"id=${a.getLong(0)} native=$av ref=$bv")
    }
  }

  test("physical plan uses AsOfJoinExec with one exchange per side") {
    graft.functions.GraftFunctions.register(spark)
    val df = AsOfJoin.join(trades, quotes, Seq("k" -> "qk"), "t", "qt")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    val nShuffles = "Exchange".r.findAllIn(phys).length
    assert(nShuffles <= 2, s"expected <=2 shuffles:\n$phys")
  }
}
