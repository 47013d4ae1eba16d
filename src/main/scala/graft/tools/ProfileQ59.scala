package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q59/q127 minhash front-end (round-5 perf item).
  * Times each pipeline stage in isolation so the regression can be bisected
  * without guessing from end-to-end numbers.
  */
object ProfileQ59 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // warmup
    graft.Tables.documents(spark, sfDir).count()

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      time("q59 end-to-end") {
        graft.ops.Dedup.q59DedupClusters.fn(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      time("q127 end-to-end") {
        graft.ops.Dedup.q127DedupClustersStar.fn(spark, sfDir).count()
      }
      spark.catalog.clearCache()
      time("minhashPairs only (via q25)") {
        graft.ops.Dedup.q25DedupMinhash.fn(spark, sfDir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
