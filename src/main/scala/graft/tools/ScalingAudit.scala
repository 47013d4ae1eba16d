package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scale audit: times the named queries at a small and a large
  * fixture directory (the large one derived by graft.tools.ScaleFixtures)
  * and emits one JSON line with per-query min times and big/small ratios.
  * A query whose ratio materially exceeds the data factor is super-linear
  * in practice no matter what its plan shape claims — exactly the evidence
  * the structural sweeps can't produce.
  *
  * reps runs per (query, dir), keep the MIN — the bench discipline: a
  * contention spike inflates one rep, not all of them.
  *
  * Usage:
  *   runMain graft.tools.ScalingAudit <smallDir> <bigDir> <factor> <reps> <q1,q2,...>
  * Output: one line `{"metric":"scaling",...}` on stdout.
  */
object ScalingAudit {
  def main(args: Array[String]): Unit = {
    val Array(smallDir, bigDir, factorS, repsS, names) = args
    val factor = factorS.toInt
    val reps = repsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    // warm the session machinery against both dirs
    graft.SparkEntry.queries("q1_pricing_summary")(spark, smallDir).count()
    graft.SparkEntry.queries("q1_pricing_summary")(spark, bigDir).count()

    def loadavg: Double = {
      val l = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      math.round(l * 100) / 100.0
    }

    def time(name: String, dir: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val elapsed = (System.nanoTime() - t0) / 1e9
        // cache teardown happens OUTSIDE the timed region: it's per-rep
        // hygiene, not part of the query cost the ratio measures
        spark.catalog.clearCache()
        elapsed
      }.min
    }

    val loadStart = loadavg
    val rows = names.split(",").map(_.trim).filter(_.nonEmpty).map { name =>
      val s = time(name, smallDir)
      val b = time(name, bigDir)
      val r = math.round(b / s * 100) / 100.0
      System.err.println(f"[scaling] $name%-30s small $s%6.2f s  big $b%6.2f s  ratio $r%5.2f")
      (name, s, b, r)
    }
    val loadEnd = loadavg
    def f(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val body = rows.map { case (n, s, b, r) =>
      s""""$n":{"small":${f(s)},"big":${f(b)},"ratio":$r}"""
    }.mkString(",")
    println(s"""{"metric":"scaling","factor":$factor,"reps":$reps,""" +
      s""""small":"$smallDir","big":"$bigDir",""" +
      s""""loadavg":[$loadStart,$loadEnd],"queries":{$body}}""")
    spark.stop()
  }
}
