package graft.ops

import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Data-quality constraint audit — the validation pass a pipeline runs
  * before promoting a batch: row counts, primary-key uniqueness, null rates,
  * and referential-integrity orphans, emitted as one (check, value) row per
  * constraint. Each check is a scan-plus-aggregate or an anti-join — no
  * driver-side row iteration, so the audit shape survives 100 TB.
  */
object Quality {

  val q96DqChecks = GraftQuery(
    "q96_dq_checks",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val li = Tables.lineitem(s, dir)
      val checks = Seq(
        o.agg(count(lit(1)).as("value")).select(lit("orders_rows").as("check_name"), col("value")),
        o.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("value"))
          .select(lit("orders_pk_dups").as("check_name"), col("value")),
        o.agg(sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("value"))
          .select(lit("orders_custkey_nulls").as("check_name"), col("value")),
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit("orders_custkey_orphans").as("check_name"), col("value")),
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("value"))
          .select(lit("lineitem_orderkey_orphans").as("check_name"), col("value")),
        li.agg(sum(when(col("l_quantity") < 0, 1L).otherwise(0L)).as("value"))
          .select(lit("lineitem_negative_qty").as("check_name"), col("value")))
      checks.reduce(_.unionAll(_)).orderBy("check_name")
    },
    Some("""SELECT * FROM (
           |  SELECT 'orders_rows' AS check_name, count(*) AS value FROM orders
           |  UNION ALL
           |  SELECT 'orders_pk_dups', count(*) - count(DISTINCT o_orderkey) FROM orders
           |  UNION ALL
           |  SELECT 'orders_custkey_nulls', CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
           |  UNION ALL
           |  SELECT 'orders_custkey_orphans', count(*) FROM orders
           |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
           |  UNION ALL
           |  SELECT 'lineitem_orderkey_orphans', count(*) FROM lineitem
           |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
           |  UNION ALL
           |  SELECT 'lineitem_negative_qty', CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
           |) ORDER BY check_name""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q96DqChecks)
}
