package graft.tools

import org.apache.spark.sql.SparkSession

/** Two-point scaling-EXPONENT audit — the 100× extrapolation companion to
  * [[ScalingAudit]]'s single-ratio check: times each named query at TWO
  * derived scale points (factors f1 < f2 over the same base fixture) and
  * fits the local power-law exponent between them,
  *
  *   exponent = ln(T(f2) / T(f1)) / ln(f2 / f1)
  *
  * A single 10×-ratio can hide a super-linear term under a large constant
  * (T = c + k·n² looks sub-linear while c dominates); the exponent between
  * the two LARGEST points is where such a term must surface first — if it
  * stays below ~1.1, the measured trend extrapolates ≤ linearly toward
  * 100× within the audited range.
  *
  * reps runs per (query, dir), keep the MIN (the bench discipline: a
  * contention spike inflates one rep, not all).
  *
  * Usage:
  *   runMain graft.tools.ScalingExponent <dir1> <f1> <dir2> <f2> <reps> <q1,...>
  * Output: one line `{"metric":"scaling_exponent",...}` on stdout.
  */
object ScalingExponent {
  def main(args: Array[String]): Unit = {
    val Array(dir1, f1s, dir2, f2s, repsS, names) = args
    val (f1, f2) = (f1s.toDouble, f2s.toDouble)
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
    graft.SparkEntry.queries("q1_pricing_summary")(spark, dir1).count()
    graft.SparkEntry.queries("q1_pricing_summary")(spark, dir2).count()

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
        spark.catalog.clearCache() // outside the timed region
        elapsed
      }.min
    }

    val loadStart = loadavg
    val rows = names.split(",").map(_.trim).filter(_.nonEmpty).map { name =>
      val t1 = time(name, dir1)
      val t2 = time(name, dir2)
      val exp = math.log(t2 / t1) / math.log(f2 / f1)
      System.err.println(
        f"[scaling-exp] $name%-30s f=$f1%4.1f $t1%7.2f s  f=$f2%4.1f $t2%7.2f s  exponent $exp%5.2f")
      (name, t1, t2, exp)
    }
    val loadEnd = loadavg
    def f(d: Double) = BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val body = rows.map { case (n, t1, t2, e) =>
      s""""$n":{"t_f1":${f(t1)},"t_f2":${f(t2)},"exponent":${f(e)}}"""
    }.mkString(",")
    println(s"""{"metric":"scaling_exponent","f1":$f1,"f2":$f2,"reps":$reps,""" +
      s""""dir1":"$dir1","dir2":"$dir2",""" +
      s""""loadavg":[$loadStart,$loadEnd],"queries":{$body}}""")
    spark.stop()
  }
}
