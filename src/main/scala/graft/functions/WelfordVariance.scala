package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Numerically stable mergeable variance (Welford's online update +
  * Chan et al.'s pairwise merge) as a typed Aggregator — the form a
  * distributed engine actually needs: the naive Σx² − (Σx)²/n identity
  * cancels catastrophically on large means (the round-1 drift class that
  * pushed q44 to exact integer sums), while the (n, mean, M2) state stays
  * conditioned at any scale AND merges associatively across partitions:
  *
  *   δ = mean_b − mean_a
  *   mean = mean_a + δ·n_b/n
  *   M2   = M2_a + M2_b + δ²·n_a·n_b/n
  *
  * Buffer is three scalars per group — constant state, map-side combined.
  */
class WelfordVariance extends Aggregator[Double, (Long, Double, Double), (Long, Double, Double)] {

  def zero: (Long, Double, Double) = (0L, 0.0, 0.0)

  def reduce(b: (Long, Double, Double), x: Double): (Long, Double, Double) = {
    val (n0, mean0, m20) = b
    val n = n0 + 1
    val delta = x - mean0
    val mean = mean0 + delta / n
    (n, mean, m20 + delta * (x - mean))
  }

  def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) = {
    if (a._1 == 0) b
    else if (b._1 == 0) a
    else {
      val n = a._1 + b._1
      val delta = b._2 - a._2
      val mean = a._2 + delta * b._1 / n
      val m2 = a._3 + b._3 + delta * delta * a._1 * b._1 / n
      (n, mean, m2)
    }
  }

  /** (n, mean, sample stddev); stddev NaN-free at n ≤ 1 (reported 0). */
  def finish(r: (Long, Double, Double)): (Long, Double, Double) =
    (r._1, r._2, if (r._1 > 1) math.sqrt(r._3 / (r._1 - 1)) else 0.0)

  def bufferEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
}
