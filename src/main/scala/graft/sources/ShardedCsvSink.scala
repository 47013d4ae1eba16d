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
  * inside the SAME job commit, so even overwrite is all-or-nothing; append
  * merges the previous manifest's entries so earlier committed files stay
  * certified. Supported column types: the fixture primitives
  * (long/int/double/string); strings holding the delimiter, a quote, or a
  * line break are RFC 4180-quoted (embedded quotes doubled) — read back
  * with `option("escape", "\"")` (+ `multiLine` for embedded newlines).
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
    // manifest written LAST: its existence certifies every listed file.
    // Append mode merges the previous manifest's entries — rewriting it
    // with only this job's files would orphan earlier committed data for
    // manifest-trusting readers (this job's entry wins a name collision).
    val manifest = new Path(dest, "_MANIFEST")
    val previous: Seq[(String, String)] =
      if (!truncate && f.exists(manifest)) {
        val in = f.open(manifest)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        text.split("\n").filter(_.nonEmpty).toSeq
          .map { l => val i = l.lastIndexOf(':'); (l.substring(0, i), l) }
      } else Nil
    val fresh = commits.map(c => (c.file, s"${c.file}:${c.rows}")).toSeq
    val freshNames = fresh.map(_._1).toSet
    val merged = (previous.filterNot(p => freshNames(p._1)) ++ fresh)
      .sortBy(_._1).map(_._2)
    val out = f.create(manifest, true)
    out.write(merged.mkString("", "\n", "\n").getBytes("UTF-8"))
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

      // RFC 4180: a string holding the delimiter, a quote, or a line
      // break must be quoted (embedded quotes doubled) or the line
      // corrupts on read-back; values without them stay bare
      private def csvEscape(v: String): String =
        if (v.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v

      override def write(record: InternalRow): Unit = {
        val line = schema.fields.zipWithIndex.map { case (sf, i) =>
          if (record.isNullAt(i)) ""
          else sf.dataType match {
            case LongType => record.getLong(i).toString
            case IntegerType => record.getInt(i).toString
            case DoubleType => record.getDouble(i).toString
            case StringType => csvEscape(record.getUTF8String(i).toString)
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
