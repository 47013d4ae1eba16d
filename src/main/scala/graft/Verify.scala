package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter for fast local
    // preflight of a few queries (the driver always runs the full set)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) =>
        (s, o, Some(f.split(",").map(_.trim).filter(_.nonEmpty).toSet))
      case _ => sys.error(
        "usage: Verify <sfDir> <outDir> [comma-separated query names]")
    }
    only.foreach { names =>
      val unknown = names.filterNot(SparkEntry.queries.contains)
      require(unknown.isEmpty,
        s"unknown query name(s) in filter: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // register once up front: register() is synchronized, but doing it before
    // the lanes spawn means no lane ever mutates session state concurrently
    // with another lane's query construction
    graft.functions.GraftFunctions.register(spark)
    // run queries concurrently: each is small at verify scale, so wall-clock
    // is dominated by per-job scheduling — 6 parallel lanes keep local[N]
    // busy. Queries share nothing mutable (distinct temp-view names, distinct
    // work dirs); Spark's scheduler interleaves the jobs safely.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_LANES", "6").toInt)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // a handful of queries persist() intermediates; without periodic cleanup
    // all queries' blocks accumulate in the driver JVM for the whole run.
    // Every ~20 completions, clear the cache — but NEVER concurrently with
    // a running query: clearing a cached frame in the middle of another
    // lane's self-join can make the two join branches observe different
    // data (seen once as a 0-row q156 — the banded self-join through a
    // persisted hash frame), which is silent wrong results, not just a
    // recompute. A FAIR read-write lock serializes the clear against the
    // lanes: queries hold the read lock, the clear takes the write lock,
    // and fairness keeps the writer from starving behind a busy pool.
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val cacheLock = new java.util.concurrent.locks.ReentrantReadWriteLock(true)
    val runs = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      Future {
        cacheLock.readLock().lock()
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally cacheLock.readLock().unlock()
        if (done.incrementAndGet() % 20 == 0) {
          cacheLock.writeLock().lock()
          try spark.catalog.clearCache()
          finally cacheLock.writeLock().unlock()
        }
      }
    }
    Await.result(Future.sequence(runs), Duration.Inf)
    pool.shutdown()
    spark.catalog.clearCache() // release per-query persist()s
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
