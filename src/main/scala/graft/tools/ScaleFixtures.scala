package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger fixture set from an existing one by FACTOR id-offset
  * copies — the empirical-scaling companion to the structural plan sweeps:
  * fixtures cap at sf0.1, so a 10× derived set is what lets the scaling
  * audit (graft.tools.ScalingAudit → SCALING_r10.json) measure time ratios
  * instead of arguing from plan shape alone.
  *
  * Replication is NOT naive row duplication:
  *   - every surrogate key shifts by copy·10⁷, so keys stay unique, joins
  *     keep their fan-out, and FK references stay consistent across tables
  *     (orders.o_custkey shifts in lockstep with customer.c_custkey, etc.);
  *   - document TEXT is decorrelated per copy by a letter-substitution
  *     (rotating the 10 most frequent English letters by the copy index):
  *     clones share no shingles, so near-dup operators (winnow, MinHash,
  *     prefix-filter Jaccard) see 10× corpus, not 10 exact replicas whose
  *     cross-copy matches would blow the OUTPUT up quadratically and
  *     contaminate the timing signal. Char counts are preserved, so
  *     n_chars stays truthful;
  *   - embedding vectors rotate their coordinates by the copy index — norm
  *     preserved, copies decorrelated, so ANN/k-means see 10× genuinely
  *     distinct points;
  *   - region/nation stay fixed (dimension tables don't scale in TPC-H).
  *
  * Usage: runMain graft.tools.ScaleFixtures <srcDir> <outDir> <factor>
  * Never writes into the source directory; refuses factor < 2.
  */
object ScaleFixtures {

  private val OFF = 10000000L
  private val Common = "etaoinshrd"

  private def rotated(i: Int): String = {
    val k = i % Common.length
    Common.substring(k) + Common.substring(0, k)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 2, s"factor must be >= 2, got $factor")
    require(!outDir.startsWith("/root/testdata") && !outDir.startsWith("/root/reference"),
      "outDir must be a scratch location")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copies(df: DataFrame)(tx: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => tx(df, i)).reduce(_ unionAll _)

    def shift(c: String, i: Int) = col(c) + lit(i * OFF)

    def write(name: String, df: DataFrame): Unit = {
      // target ~32 write tasks per table so the derived set reads with the
      // same parallelism profile as a multi-file production layout
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name done")
    }

    write("region", graft.Tables.region(spark, srcDir))
    write("nation", graft.Tables.nation(spark, srcDir))
    write("customer", copies(graft.Tables.customer(spark, srcDir)) { (d, i) =>
      d.withColumn("c_custkey", shift("c_custkey", i))
    })
    write("supplier", copies(graft.Tables.supplier(spark, srcDir)) { (d, i) =>
      d.withColumn("s_suppkey", shift("s_suppkey", i))
    })
    write("part", copies(graft.Tables.part(spark, srcDir)) { (d, i) =>
      d.withColumn("p_partkey", shift("p_partkey", i))
    })
    write("orders", copies(graft.Tables.orders(spark, srcDir)) { (d, i) =>
      d.withColumn("o_orderkey", shift("o_orderkey", i))
        .withColumn("o_custkey", shift("o_custkey", i))
    })
    write("lineitem", copies(graft.Tables.lineitem(spark, srcDir)) { (d, i) =>
      d.withColumn("l_orderkey", shift("l_orderkey", i))
        .withColumn("l_partkey", shift("l_partkey", i))
        .withColumn("l_suppkey", shift("l_suppkey", i))
    })
    write("events", copies(graft.Tables.events(spark, srcDir)) { (d, i) =>
      d.withColumn("event_id", shift("event_id", i))
        .withColumn("user_id", shift("user_id", i))
    })
    write("documents", copies(graft.Tables.documents(spark, srcDir)) { (d, i) =>
      d.withColumn("doc_id", shift("doc_id", i))
        .withColumn("text", translate(col("text"), Common, rotated(i)))
    })
    write("embeddings", copies(graft.Tables.embeddings(spark, srcDir)) { (d, i) =>
      d.withColumn("vec_id", shift("vec_id", i))
        .withColumn("embedding", expr(
          s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), " +
            s"slice(embedding, 1, $i))"))
    })
    spark.stop()
  }
}
