package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit entry point: prints the formatted physical plan of one or all
  * registered queries. Usage:
  *   runMain graft.Explain <sfDir> [queryName[,queryName...]] [--rounds]
  *
  * With --rounds, the names are looked up in [[graft.ops.RoundBodies]]
  * instead: the iterative queries localCheckpoint each round, so their
  * returned plans are stubs — the round-body registry rebuilds one
  * representative pre-checkpoint round frame per loop so its per-round
  * Exchange count is auditable.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val rounds = args.contains("--rounds")
    val pos = args.filterNot(_ == "--rounds")
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.001")
    // comma-separated names audit several queries in one JVM
    val only = pos.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      try println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
      // query fns run driver-side actions (loop levels, staging) that
      // persist intermediates — release them between audited queries so a
      // multi-name audit doesn't accumulate corpus-scale caches (matches
      // Bench.timeOne's per-query clearCache)
      spark.catalog.clearCache()
    }
    if (rounds)
      graft.ops.RoundBodies.bodies.toSeq.sortBy(_._1)
        .filter { case (n, _) => only.forall(_.contains(n)) }
        .foreach { case (n, fn) => dump(s"$n (round body)", fn) }
    else
      SparkEntry.allQueries
        .filter(q => only.forall(_.contains(q.name)))
        .foreach(q => dump(q.name, q.fn))
    spark.stop()
  }
}
