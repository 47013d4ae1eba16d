package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of fixed-dimension vectors — the
  * `Aggregator[IN, BUF, OUT]` form of the centroid computation (SURVEY.md
  * §7.3), registerable via `functions.udaf` / `spark.udf.register`.
  *
  * The buffer is one (sums, count) pair per group — constant size in rows
  * aggregated, so partial (map-side) aggregation keeps shuffle traffic at
  * O(groups × dim) regardless of input size.
  */
class VectorAvg(dim: Int) extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    // same dense fixed-dimension contract as DotProduct: silently
    // truncating/zero-filling a malformed vector would bias the mean
    // (its missing dims divide by a count it never contributed to)
    require(v.length == dim,
      s"VectorAvg($dim): input vector has length ${v.length}")
    val (sums, n) = b
    var i = 0
    while (i < dim) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (xs, xn) = x
    val (ys, yn) = y
    var i = 0
    while (i < dim) { xs(i) += ys(i); i += 1 }
    (xs, xn + yn)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = b
    if (n == 0) Seq.fill(dim)(0.0) else sums.toSeq.map(_ / n)
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.kryo[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
