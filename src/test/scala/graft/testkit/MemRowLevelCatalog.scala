package graft.testkit

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal in-memory DSv2 catalog whose tables support GROUP-BASED
  * (copy-on-write) row-level operations, so an ANSI `MERGE INTO` actually
  * EXECUTES against it — Spark's analyzer requires
  * [[SupportsRowLevelOperations]] on the target, plans a `ReplaceData`
  * rewrite over the operation's scan, and writes the merged result back
  * through the operation's write. This is the test double that lets
  * `IcebergMergeSink.write` run end-to-end without the Iceberg runtime jar
  * (VERDICT r2 #4): same statement, same analyzer/planner path, an
  * in-memory ACID'ish table instead of Iceberg's.
  *
  * Test-scope only. Storage is a JVM-singleton row store (valid in
  * local-mode tests where executors share the driver JVM); rows travel as
  * copied InternalRows inside serializable partitions/commit messages.
  */
object MemTables {
  val store = new java.util.concurrent.ConcurrentHashMap[
    String, (StructType, Array[InternalRow])]()
  def rows(key: String): Array[InternalRow] =
    Option(store.get(key)).map(_._2).getOrElse(Array.empty)
  def replace(key: String, schema: StructType, rs: Array[InternalRow]): Unit =
    store.put(key, (schema, rs))
  def append(key: String, schema: StructType, rs: Array[InternalRow]): Unit =
    store.compute(key, (_, old) =>
      if (old == null) (schema, rs) else (old._1, old._2 ++ rs))
  def clear(): Unit = store.clear()
}

final case class RowsMsg(rows: Array[InternalRow]) extends WriterCommitMessage

final class MemDataWriter(schema: StructType) extends DataWriter[InternalRow] {
  import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression, UnsafeProjection}
  import org.apache.spark.sql.catalyst.util.RowDeltaUtils
  // normalize through an UnsafeProjection (deep-copies string buffers the
  // upstream operator reuses)
  private val direct = UnsafeProjection.create(schema)
  // Spark's group-based ReplaceData on a table WITHOUT metadata columns
  // takes the plain DataWritingSparkTask path (ReplaceDataExec.writingTask
  // only projects when a metadataProjection exists), so the writer receives
  // the raw MergeRows output: [__row_operation, tableColumns...]. Strip the
  // leading operation column; only WRITE ops may appear in replacement data.
  private val shifted = UnsafeProjection.create(
    schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      BoundReference(i + 1, f.dataType, f.nullable): Expression
    })
  private val buf = scala.collection.mutable.ArrayBuffer[InternalRow]()
  override def write(r: InternalRow): Unit = {
    val u = if (r.numFields == schema.length + 1) {
      val op = r.getInt(0)
      require(op == RowDeltaUtils.WRITE_OPERATION ||
        op == RowDeltaUtils.WRITE_WITH_METADATA_OPERATION,
        s"unexpected __row_operation $op in replacement data")
      shifted(r)
    } else direct(r)
    buf += u.copy()
  }
  // two-arg (metadata, row) variant used when the table HAS metadata cols
  override def write(meta: InternalRow, r: InternalRow): Unit = write(r)
  override def commit(): WriterCommitMessage = RowsMsg(buf.toArray)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

final class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new MemDataWriter(schema)
}

/** replaceAll=true is the ReplaceData (row-level op) write: the scan read
  * the WHOLE table (no group pruning), so the committed rows are the whole
  * new table. replaceAll=false is a plain append (CTAS / INSERT INTO).
  */
final class MemBatchWrite(key: String, schema: StructType,
    replaceAll: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = new MemWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.collect { case RowsMsg(rs) => rs }.flatten
    if (replaceAll) MemTables.replace(key, schema, rows)
    else MemTables.append(key, schema, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class MemWriteBuilder(key: String, schema: StructType,
    replaceAll: Boolean) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(key, schema, replaceAll)
  }
}

final case class MemPartition(rows: Array[InternalRow]) extends InputPartition

final class MemReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[MemPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

final class MemScanBuilder(key: String, schema: StructType) extends ScanBuilder {
  override def build(): Scan = new Scan {
    override def readSchema(): StructType = schema
    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        Array(MemPartition(MemTables.rows(key)))
      override def createReaderFactory(): PartitionReaderFactory =
        new MemReaderFactory
    }
  }
}

final class MemTable(key: String, tschema: StructType) extends Table
    with SupportsRead with SupportsWrite with SupportsRowLevelOperations {
  override def name(): String = key
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MemScanBuilder(key, tschema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key, tschema, replaceAll = false)
  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo)
      : RowLevelOperationBuilder = new RowLevelOperationBuilder {
    override def build(): RowLevelOperation = new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def newScanBuilder(options: CaseInsensitiveStringMap)
          : ScanBuilder = new MemScanBuilder(key, tschema)
      override def newWriteBuilder(i: LogicalWriteInfo): WriteBuilder =
        new MemWriteBuilder(key, tschema, replaceAll = true)
    }
  }
}

class MemRowLevelCatalog extends TableCatalog {
  private var catName: String = _
  private def key(ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")
  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catName = name
  override def name(): String = catName
  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty
  override def loadTable(ident: Identifier): Table = {
    val k = key(ident)
    val e = MemTables.store.get(k)
    if (e == null) throw new NoSuchTableException(ident)
    new MemTable(k, e._1)
  }
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    MemTables.replace(key(ident), schema, Array.empty)
    new MemTable(key(ident), schema)
  }
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    loadTable(ident)
  override def dropTable(ident: Identifier): Boolean =
    MemTables.store.remove(key(ident)) != null
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename not supported")
}
