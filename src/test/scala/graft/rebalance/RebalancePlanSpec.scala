package graft.rebalance

import org.scalatest.funsuite.AnyFunSuite

class RebalancePlanSpec extends AnyFunSuite {
  import RebalancePlan._

  val snapshot = Seq(
    CatalogEntry("sales_local", "CREATE TABLE db.sales_local (k BIGINT) ENGINE = MergeTree"),
    CatalogEntry("sales", "CREATE TABLE db.sales (k BIGINT) ENGINE = Distributed('c','db','sales_local', k)"),
    CatalogEntry("sales_mv", "CREATE MATERIALIZED VIEW db.sales_mv TO db.agg_local AS SELECT k FROM db.sales_local"),
    CatalogEntry(".inner.sales_mv", "CREATE TABLE db.`.inner.sales_mv` (k BIGINT)"))

  val steps = plan("db", snapshot, "2", _ => Rebalancer.ByHash("k"), 8)

  test("inner tables never appear in any step") {
    assert(!steps.exists {
      case EnsureTable(n, _) => n.contains(".inner.")
      case CreateShadow(n, _) => n.contains(".inner.")
      case RenameTable(f, t) => f.contains(".inner.") || t.contains(".inner.")
      case DropTable(n) => n.contains(".inner.")
      case _ => false
    })
  }

  test("workflow phase order matches the reference (SURVEY §2.1)") {
    def idx(p: Step => Boolean) = steps.indexWhere(p)
    val ensure = idx { case EnsureTable("sales_local", _) => true; case _ => false }
    val shadowLocal = idx { case CreateShadow("sales_local2", _) => true; case _ => false }
    val renameOld = idx { case RenameTable("sales_local", "sales_local_old") => true; case _ => false }
    val renameCanon = idx { case RenameTable("sales_local2", "sales_local") => true; case _ => false }
    val shadowDist = idx { case CreateShadow("sales2", _) => true; case _ => false }
    val move = idx { case Redistribute("sales2", "sales", _, 8) => true; case _ => false }
    val drop = idx { case DropTable("sales_local_old") => true; case _ => false }
    val order = Seq(ensure, shadowLocal, renameOld, renameCanon, shadowDist, move, drop)
    assert(order.forall(_ >= 0), s"missing step in $steps")
    assert(order == order.sorted, s"phases out of order: $order")
  }

  test("versioned dist façade reads the renamed old locals") {
    val ddl = steps.collectFirst { case CreateShadow("sales2", d) => d }.get
    assert(ddl.contains("sales_local_old"))
  }

  test("MVs are surfaced as manual steps, never auto-created") {
    assert(steps.contains(ManualMvStep("sales_mv")))
    assert(!steps.exists { case CreateShadow(n, _) => n.startsWith("sales_mv"); case _ => false })
  }
}
