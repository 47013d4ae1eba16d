package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** V2 write-path commit protocol: every row lands exactly once, the manifest
  * certifies exactly the committed shard files, and overwrite-truncate is
  * all-or-nothing inside job commit.
  */
class ShardedCsvSinkSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val out = s"${sys.props("java.io.tmpdir")}/graft_sharded_sink"

  private def readManifest(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$out/_MANIFEST")).asScala.toSeq
  }

  private def readBack() = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType)))
    spark.read.schema(schema).csv(s"$out/part-*.csv")
  }

  test("write commits all rows once with a manifest certifying each shard") {
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(4)
    src.write.format("graft.sources.ShardedCsvSink")
      .option("path", out).mode("overwrite").save()

    val manifest = readManifest()
    assert(manifest.length == 4, manifest.mkString("\n"))
    val manifestRows = manifest.map(_.split(":")(1).toLong).sum
    assert(manifestRows == src.count())

    val back = readBack()
    assert(back.count() == src.count())
    // content parity, not just counts
    val a = back.agg(sum("o_orderkey"), round(sum("o_totalprice"), 2)).head()
    val b = src.agg(sum("o_orderkey"), round(sum("o_totalprice"), 2)).head()
    assert(a == b)
    // no temp residue after commit
    assert(!new java.io.File(s"$out.__tmp__").exists())
  }

  test("failed job leaves the previous committed state untouched (abort path)") {
    val base = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    base.write.format("graft.sources.ShardedCsvSink")
      .option("path", out).mode("overwrite").save()
    val before = readManifest()
    val beforeCount = readBack().count()

    // poison one row so a task fails mid-write; overwrite truncation happens
    // only inside job commit, which is never reached
    val poisoned = base.withColumn("o_orderkey",
      udf((k: Long) => {
        if (k == 5L) throw new RuntimeException("injected failure"); k
      }).apply(col("o_orderkey")))
    intercept[Exception] {
      poisoned.write.format("graft.sources.ShardedCsvSink")
        .option("path", out).mode("overwrite").save()
    }
    assert(readManifest() == before)
    assert(readBack().count() == beforeCount)
    assert(!new java.io.File(s"$out.__tmp__").exists(), "staging not cleaned up")
  }

  test("strings holding the delimiter/quote/newline round-trip via RFC 4180 " +
    "quoting") {
    import spark.implicits._
    val src = Seq(
      (1L, "plain"),
      (2L, "Smith, John"),          // embedded delimiter
      (3L, "she said \"hi\""),      // embedded quotes
      (4L, "line1\nline2"),         // embedded newline
      (5L, null.asInstanceOf[String])
    ).toDF("id", "name").repartition(1)
    src.write.format("graft.sources.ShardedCsvSink")
      .option("path", out).mode("overwrite").save()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val back = spark.read.schema(schema)
      .option("multiLine", true) // quoted newlines span physical lines
      .option("escape", "\"") // RFC 4180 doubled quotes, not backslash
      .csv(s"$out/part-*.csv")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(back(2L) == "Smith, John")
    assert(back(3L) == "she said \"hi\"")
    assert(back(4L) == "line1\nline2")
    assert(back(1L) == "plain")
    assert(back.size == 5)
  }

  test("append mode merges the previous manifest instead of orphaning " +
    "earlier committed files") {
    val base = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val first = base.filter(col("o_orderkey") < 100).repartition(1)
    first.write.format("graft.sources.ShardedCsvSink")
      .option("path", out).mode("overwrite").save()
    val second = base.filter(col("o_orderkey") >= 100 && col("o_orderkey") < 200)
      .repartition(2)
    second.write.format("graft.sources.ShardedCsvSink")
      .option("path", out).mode("append").save()
    val manifest = readManifest()
    assert(manifest.length == 3, manifest.mkString("\n")) // 1 old + 2 new
    val manifestRows = manifest.map(_.split(":")(1).toLong).sum
    assert(manifestRows == first.count() + second.count())
  }

  test("overwrite truncates atomically: second write fully replaces the first") {
    val small = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") < 100).repartition(2)
    small.write.format("graft.sources.ShardedCsvSink")
      .option("path", out).mode("overwrite").save()
    assert(readBack().count() == small.count())
    val manifest = readManifest()
    assert(manifest.length == 2, manifest.mkString("\n"))
  }
}
