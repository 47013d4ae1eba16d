package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 synthetic-rows table — the engine's analogue of ClickHouse
  * `system.numbers` (a generator table the reference ecosystem relies on for
  * backfills and testing).
  *
  * `spark.read.format("graft.sources.NumbersSource")
  *   .option("end", n).option("splits", p).load()`
  * produces rows `(id BIGINT, hash BIGINT, bucket INT)` for id ∈ [0, n):
  * hash is the first-8-hex-chars md5 integer of the decimal id (the same
  * deterministic construction the dedup/sketch pipeline uses, reproducible
  * in any engine), bucket = id % 10.
  *
  * V2 integration points exercised:
  *   - `planInputPartitions` splits [0, n) into `splits` contiguous ranges —
  *     fully parallel, no driver materialization (100 TB of synthetic rows
  *     stays a constant-memory plan);
  *   - `SupportsPushDownRequiredColumns`: pruned readers skip the md5 work
  *     entirely when `hash` isn't referenced;
  *   - `SupportsPushDownLimit`: a LIMIT above the scan truncates the row
  *     ranges at the source instead of generating-then-dropping.
  */
class NumbersSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NumbersSource.SCHEMA

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NumbersTable(
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("splits", "4").toInt)
}

object NumbersSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("hash", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  // scan hot path: one digest per thread (the GraftHashUtil discipline),
  // not a JCA provider lookup + allocation per generated row
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars of the decimal string, as a long — identical to
    * DuckDB `CAST(concat('0x', substr(md5(id::VARCHAR), 1, 8)) AS BIGINT)`.
    */
  def md5Int(id: Long): Long = {
    val m = md.get()
    m.reset()
    val digest = m.digest(id.toString.getBytes("UTF-8"))
    var v = 0L
    var k = 0
    while (k < 4) { v = (v << 8) | (digest(k) & 0xffL); k += 1 }
    v
  }
}

class NumbersTable(end: Long, splits: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_numbers(end=$end, splits=$splits)"
  override def schema(): StructType = NumbersSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NumbersScanBuilder(end, splits)
}

class NumbersScanBuilder(end: Long, splits: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var required: StructType = NumbersSource.SCHEMA
  private var limit: Long = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = n.toLong; true }

  override def build(): Scan = new NumbersScan(math.min(end, limit), splits, required)
}

final case class NumbersRange(start: Long, endExclusive: Long) extends InputPartition

class NumbersScan(end: Long, splits: Int, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_numbers end=$end splits=$splits cols=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (end + splits - 1) / splits)
    (0L until end by per).map(s => NumbersRange(s, math.min(end, s + per))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val cols = required.fieldNames
    (partition: InputPartition) => {
      val NumbersRange(start, stop) = partition
      new PartitionReader[InternalRow] {
        private var cur = start - 1
        override def next(): Boolean = { cur += 1; cur < stop }
        override def get(): InternalRow = {
          val values = cols.map {
            case "id" => java.lang.Long.valueOf(cur)
            case "hash" => java.lang.Long.valueOf(NumbersSource.md5Int(cur))
            case "bucket" => java.lang.Integer.valueOf((cur % 10).toInt)
          }
          new GenericInternalRow(values.asInstanceOf[Array[Any]])
        }
        override def close(): Unit = ()
      }
    }
  }
}
