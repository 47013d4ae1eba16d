package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Upsert.merge MERGE semantics beyond the oracle-gated q108 path:
  * duplicate-keyed EXISTING rows that no update touches must survive
  * intact (the per-key-rank formulation silently kept only one), and a
  * batch carrying several updates for one key keeps all of them
  * deterministically instead of a partition-order-dependent winner.
  */
class UpsertMergeSpec extends AnyFunSuite with SparkSpec {

  test("duplicate-keyed existing rows with no update survive; updated keys " +
    "are fully replaced") {
    import spark.implicits._
    val existing = Seq(
      (1L, "a"), (1L, "b"), // legit duplicates, untouched
      (2L, "old")           // will be replaced
    ).toDF("k", "v")
    val updates = Seq((2L, "new1"), (2L, "new2")).toDF("k", "v")
    val got = Upsert.merge(existing, updates, "k")
      .as[(Long, String)].collect().sorted.toSeq
    assert(got == Seq(1L -> "a", 1L -> "b", 2L -> "new1", 2L -> "new2"))
  }

  test("insert-only and update-only batches behave as plain union/replace") {
    import spark.implicits._
    val existing = Seq((1L, "a")).toDF("k", "v")
    assert(Upsert.merge(existing, Seq((3L, "c")).toDF("k", "v"), "k")
      .as[(Long, String)].collect().sorted.toSeq ==
      Seq(1L -> "a", 3L -> "c"))
    assert(Upsert.merge(existing, Seq((1L, "a2")).toDF("k", "v"), "k")
      .as[(Long, String)].collect().toSeq == Seq(1L -> "a2"))
  }
}
