package graft

import org.scalatest.funsuite.AnyFunSuite

/** ClusterSmoke's curated pick list is referenced by NAME; a query rename
  * or retirement would otherwise only surface as a runtime failure inside
  * the (slow, manually-launched) cluster pass.
  */
class ClusterSmokeNamesSpec extends AnyFunSuite {
  test("every cluster-smoke pick is a registered query name") {
    val unknown = ClusterSmoke.picks.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"unregistered picks: $unknown")
  }
}
