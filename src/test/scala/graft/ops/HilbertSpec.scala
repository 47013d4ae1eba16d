package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q180's Hilbert index. The oracle gate proves Spark and DuckDB agree on
  * the arithmetic; this pins that the arithmetic is actually a Hilbert
  * curve: a bijection onto 0..4^order−1 whose CONSECUTIVE indices are
  * always Manhattan-adjacent grid cells — the locality property that
  * distinguishes it from z-order (Morton jumps diagonally across quadrant
  * seams; Hilbert never does).
  */
class HilbertSpec extends AnyFunSuite with SparkSpec {

  private val order = 4 // 16×16 grid, exhaustively checkable
  private val n = 1 << order

  private lazy val cells = {
    import spark.implicits._
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x, y)))
      .toDF("x", "y")
    Layout.withHilbert(grid, col("x"), col("y"), order)
      .select("x", "y", "hd")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
  }

  test("hilbert index is a bijection onto 0..4^order-1") {
    val ds = cells.map(_._3).sorted
    assert(ds.toSeq == (0L until (n.toLong * n)).toSeq,
      "indices are not a permutation of the full range")
  }

  test("consecutive indices are Manhattan-adjacent cells (z-order is not)") {
    val byD = cells.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, d1), (x2, y2, d2)) =>
      val dist = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(dist == 1, s"jump of $dist between d=$d1 ($x1,$y1) and d=$d2 ($x2,$y2)")
    }
  }
}
