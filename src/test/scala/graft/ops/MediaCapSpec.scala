package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the DOCUMENTED fixture caps and symmetric-ASCII gates of the media
  * content-analysis family (SURVEY §2.5's bounded-sibling row): q293 audio
  * fingerprinting decodes only `doc_id < 300`, q294 scene cuts only
  * `doc_id < 200`, q302 VAD only `doc_id < 300`, and all three apply the
  * q280-style ASCII gate (`octet_length(text) = length(text)` and
  * `n_chars = length(text)`) so their byte-model oracles stay symmetric on
  * regenerated fixtures. The caps are ORACLE synthesis bounds (each payload
  * byte expands to a 512-sample / 8-row frame on the DuckDB side); this spec
  * turns them from scaladoc prose into test failures: widening or dropping a
  * cap without re-deriving the oracle breaks here first.
  */
class MediaCapSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Every documents-scan filter in the optimized plan, as one string. */
  private def scanFilters(name: String): String = {
    val opt = SparkEntry.queries(name)(spark, sf).queryExecution.optimizedPlan
    opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[
            org.apache.spark.sql.execution.datasources.LogicalRelation] =>
        f.condition.sql
    }.mkString(" | ")
  }

  private def checkCapAndGate(name: String, cap: Int): Unit = {
    val cond = scanFilters(name)
    assert(cond.contains(s"< ${cap}L") || cond.contains(s"< $cap"),
      s"$name: documented doc_id cap $cap not found in scan filters: $cond")
    assert(cond.contains("octet_length"),
      s"$name: symmetric ASCII gate (octet_length = length) missing: $cond")
    assert(cond.contains("n_chars"),
      s"$name: n_chars = length(text) honesty gate missing: $cond")
  }

  test("q293 decodes only the documented doc_id < 300 tracks, ASCII-gated") {
    checkCapAndGate("q293_audio_fingerprint", 300)
  }

  test("q294 decodes only the documented doc_id < 200 clips, ASCII-gated") {
    checkCapAndGate("q294_scene_cuts", 200)
  }

  test("q302 decodes only the documented doc_id < 300 tracks, ASCII-gated") {
    checkCapAndGate("q302_vad_segments", 300)
  }
}
