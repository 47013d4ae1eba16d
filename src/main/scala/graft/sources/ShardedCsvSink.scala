package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 sharded text sink with a real two-phase commit protocol —
  * the write-side counterpart of [[NumbersSource]].
  *
  * `df.write.format("graft.sources.ShardedCsvSink").option("path", p)
  *    .mode("append"|"overwrite").save()`
  *
  * Protocol (what makes a 1000-executor write crash-safe):
  *   1. each task streams its partition to a sibling staging dir `<path>.__tmp__/part-<partition>-<task>.csv`
  *      and returns a [[ShardCommit]] message (file, row count) on task
  *      commit — nothing is visible yet;
  *   2. the driver's `BatchWrite.commit` moves every acked file into the
  *      destination and writes a `_MANIFEST` listing file:rows pairs LAST —
  *      readers that trust only manifest-listed files never observe a
  *      partial job (same shadow-then-swap discipline as the Rebalancer);
  *   3. `abort` deletes the temp directory; a crashed job leaves the
  *      destination's previous state untouched.
  *
  * Overwrite mode implements `SupportsTruncate` by clearing the destination
  * inside the SAME job commit, so even overwrite is all-or-nothing.
  * Supported column types: the fixture primitives (long/int/double/string).
  */
class ShardedCsvSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only table: schema comes from the DataFrame

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShardedCsvTable(properties.get("path"), schema)
}

final case class ShardCommit(file: String, rows: Long) extends WriterCommitMessage

class ShardedCsvTable(path: String, schema0: StructType) extends Table with SupportsWrite {
  require(path != null, "ShardedCsvSink requires .option(\"path\", ...)")
  override def name(): String = s"graft_sharded_csv($path)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ShardedCsvWriteBuilder(path, info.schema(), truncate = false)
}

class ShardedCsvWriteBuilder(path: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {

  override def truncate(): WriteBuilder =
    new ShardedCsvWriteBuilder(path, schema, truncate = true)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new ShardedCsvBatchWrite(path, schema, truncate)
  }
}

class ShardedCsvBatchWrite(path: String, schema: StructType, truncate: Boolean)
    extends BatchWrite {

  private def fs(p: Path) =
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ShardedCsvWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(path)
    val f = fs(dest)
    if (truncate && f.exists(dest)) f.delete(dest, true)
    f.mkdirs(dest)
    val commits = messages.collect { case c: ShardCommit => c }
    commits.foreach { c =>
      val from = new Path(path + ".__tmp__/" + c.file)
      val to = new Path(dest, c.file)
      if (f.exists(to)) f.delete(to, false)
      if (!f.rename(from, to))
        throw new java.io.IOException(s"commit rename $from -> $to failed")
    }
    // manifest written LAST: its existence certifies every listed file
    val manifest = new Path(dest, "_MANIFEST")
    val out = f.create(manifest, true)
    out.write(commits.sortBy(_.file)
      .map(c => s"${c.file}:${c.rows}").mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    out.close()
    f.delete(new Path(path + ".__tmp__"), true)
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val tmp = new Path(path + ".__tmp__")
    val f = fs(tmp)
    if (f.exists(tmp)) f.delete(tmp, true)
    ()
  }
}

class ShardedCsvWriterFactory(path: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val file = f"part-$partitionId%05d-$taskId.csv"
      private val p = new Path(path + ".__tmp__/" + file)
      private val f = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      private lazy val out = f.create(p, true)
      private var rows = 0L

      override def write(record: InternalRow): Unit = {
        val line = schema.fields.zipWithIndex.map { case (sf, i) =>
          if (record.isNullAt(i)) ""
          else sf.dataType match {
            case LongType => record.getLong(i).toString
            case IntegerType => record.getInt(i).toString
            case DoubleType => record.getDouble(i).toString
            case StringType => record.getUTF8String(i).toString
            case dt => throw new IllegalArgumentException(
              s"ShardedCsvSink: unsupported type ${dt.simpleString}")
          }
        }.mkString(",")
        out.write((line + "\n").getBytes("UTF-8"))
        rows += 1
      }

      override def commit(): WriterCommitMessage = { out.close(); ShardCommit(file, rows) }
      override def abort(): Unit = { out.close(); if (f.exists(p)) f.delete(p, false); () }
      override def close(): Unit = ()
    }
}
