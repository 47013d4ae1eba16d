package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Properties of the Lloyd's k-means core behind q137 (`Vectors.lloyd`):
  * planted-cluster recovery, run-to-run determinism, and the Lloyd
  * monotonicity guarantee that mean updates never increase inertia.
  */
class KmeansSpec extends AnyFunSuite with SparkSpec {

  private val dim = 8

  /** 3 planted clusters around (0,…), (10,…), (20,…) with ≤0.04 jitter —
    * separation 10 vs jitter 0.04, so the true partition is unambiguous.
    * vec_ids 0,1,2 land one per planted cluster: the deterministic
    * lowest-id seeding starts with one seed per cluster, which Lloyd can
    * only sharpen.
    */
  private def planted: DataFrame = {
    import spark.implicits._
    val rows = for {
      c <- 0 until 3
      i <- 0 until 10
    } yield {
      val id = if (i == 0) c.toLong else (3 + c * 9 + (i - 1)).toLong
      val v = (0 until dim).map(d => c * 10.0 + ((i * 7 + d * 3) % 5) * 0.01)
      (id, v)
    }
    rows.toDF("vec_id", "v")
  }

  private def truth(id: Long): Int = if (id < 3) id.toInt else ((id - 3) / 9).toInt

  test("recovers planted well-separated clusters") {
    val (cents, asg) = Vectors.lloyd(planted, k = 3, rounds = 2, dim = dim)
    assert(cents.size == 3)
    val got = asg.select("vec_id", "j").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == 30)
    val labelsPerPlanted = got.groupBy { case (id, _) => truth(id) }
      .map { case (t, m) => t -> m.values.toSet }
    assert(labelsPerPlanted.values.forall(_.size == 1),
      "every planted cluster maps to exactly one learned label")
    assert(labelsPerPlanted.values.flatten.toSet.size == 3,
      "distinct planted clusters get distinct learned labels")
  }

  test("assignment and distances are deterministic across runs") {
    def run() = Vectors.lloyd(planted, k = 3, rounds = 2, dim = dim)._2
      .select("vec_id", "j", "d").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("mean updates never increase inertia") {
    def inertia(rounds: Int): Double =
      Vectors.lloyd(planted, k = 3, rounds = rounds, dim = dim)._2
        .agg(sum("d")).collect()(0).getDouble(0)
    val i0 = inertia(0)
    val i1 = inertia(1)
    val i2 = inertia(2)
    assert(i1 <= i0 + 1e-9)
    assert(i2 <= i1 + 1e-9)
  }
}
