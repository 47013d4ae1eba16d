package graft

import org.apache.spark.sql.SparkSession

/** Shared session for Spark-backed suites (one per forked test JVM). */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session

  /** Drop-and-recreate a test database, clearing its warehouse directory —
    * the in-memory catalog dies with each JVM but table directories persist,
    * so a plain CREATE would hit LOCATION_ALREADY_EXISTS on re-runs.
    */
  def freshDatabase(db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val dir = new org.apache.hadoop.fs.Path(
      s"${sys.props("java.io.tmpdir")}/graft_test_warehouse/$db.db")
    dir.getFileSystem(spark.sessionState.newHadoopConf()).delete(dir, true)
    spark.sql(s"CREATE DATABASE $db")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"${sys.props("java.io.tmpdir")}/graft_test_warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
