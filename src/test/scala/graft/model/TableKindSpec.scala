package graft.model

import org.scalatest.funsuite.AnyFunSuite

class TableKindSpec extends AnyFunSuite {
  import TableKind._

  test("exact-suffix classification") {
    assert(classify("events_local") == Local)
    assert(classify("events_mv") == MaterializedView)
    assert(classify("events") == Distributed)
    assert(classify(".inner.events_mv") == Inner)
    assert(classify("db.inner.x") == Inner)
  }

  test("fixes the reference's substring misrouting (SURVEY §2.1)") {
    // reference: 'mv' in "mvp" → MV branch; 'local' in "localization" → local
    assert(classify("mvp") == Distributed)
    assert(classify("localization") == Distributed)
    assert(classify("my_mv_table") == Distributed)
  }

  test("mv → source-local naming convention") {
    assert(mvSourceLocal("events_mv") == "events_local")
    assert(mvSourceLocal("a_b_mv") == "a_b_local")
  }
}
