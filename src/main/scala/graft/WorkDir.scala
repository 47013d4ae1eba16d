package graft

import org.apache.spark.sql.SparkSession

/** Scratch root for sink round-trips, rebalance staging and streaming
  * checkpoints.
  *
  * A driver-local `java.io.tmpdir` path is only valid in `local[*]` mode: on
  * a real cluster each executor would resolve it to its own node-local disk
  * and the "shared" directory would be scattered across machines. Every
  * write path therefore goes through this resolver, which takes the root
  * from `spark.graft.workDir` (session conf) or `SPARK_GRAFT_WORK_DIR`
  * (environment) — point either at an HDFS/S3/shared path on a cluster —
  * and only falls back to `java.io.tmpdir` for single-JVM local runs, where
  * it is both correct and fastest.
  */
object WorkDir {

  def root(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.workDir")
      .orElse(sys.env.get("SPARK_GRAFT_WORK_DIR"))
      .getOrElse(sys.props("java.io.tmpdir"))

  /** A per-(purpose, fixture) scratch dir: `<root>/graft_<tag>/<sfDir key>`.
    * The sfDir key makes concurrent verify/bench runs at different scale
    * factors collide-free.
    */
  def resolve(spark: SparkSession, tag: String, sfDir: String): String = {
    val key = sfDir.replaceAll("[^0-9a-zA-Z.]", "_")
    s"${root(spark)}/graft_$tag/$key"
  }
}
