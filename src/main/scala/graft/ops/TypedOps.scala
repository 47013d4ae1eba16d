package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Typed Dataset[T] pipeline: case-class rows, lambda predicates,
  * groupByKey + a custom typed Aggregator — the compile-time-checked face of
  * the same Catalyst plans the DataFrame surface produces (Encoders keep the
  * rows in Tungsten format; groupByKey still partial-aggregates map-side
  * because the Aggregator buffer is mergeable). Money accumulates in integer
  * cents so the typed path is exactly oracle-comparable.
  */
object TypedOps {

  final case class OrderRow(
      o_orderkey: Long,
      o_custkey: Long,
      o_totalprice: Double,
      o_orderstatus: String)

  /** (row count, price cents) — mergeable, constant-size buffer. */
  private class OrderStats extends Aggregator[OrderRow, (Long, Long), (Long, Long)] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), r: OrderRow): (Long, Long) =
      (b._1 + 1, b._2 + math.round(r.o_totalprice * 100))
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Long, Long)): (Long, Long) = b
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  }

  val q111TypedPipeline = GraftQuery(
    "q111_typed_pipeline",
    (s, dir) => {
      import s.implicits._
      val ds = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .as[OrderRow]
      ds.filter(r => r.o_totalprice > 100000.0 && r.o_custkey % 2 == 0)
        .groupByKey(_.o_orderstatus)
        .agg(new OrderStats().toColumn)
        .map { case (status, (n, cents)) => (status, n, cents / 100.0) }
        .toDF("o_orderstatus", "n", "price_sum")
        .withColumn("price_sum", round(col("price_sum"), 2))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus, count(*) AS n,
           |  round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS price_sum
           |FROM orders WHERE o_totalprice > 100000.0 AND o_custkey % 2 = 0
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[GraftQuery] = Seq(q111TypedPipeline)
}
