package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated per-query re-timer: runs the named queries N times each on an
  * otherwise idle session and prints min/median — the confirm-or-deny tool
  * for bench wobble (a contention spike vanishes under repetition; a real
  * regression stays). Usage:
  *   runMain graft.tools.TimeQueries <sfDir> <reps> <q1,q2,...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, repsS, names) = args
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (session machinery, not the targets)
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    names.split(",").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-28s min ${ts.head}%6.2f s  med ${ts(ts.length / 2)}%6.2f s  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
