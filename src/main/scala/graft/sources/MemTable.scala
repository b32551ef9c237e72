package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.collection.concurrent.TrieMap

/** The WRITE half of the V2 connector surface ([[SeqSource]] is the read
  * half): an in-memory table hosting Spark's full batch commit protocol —
  * `SupportsWrite` → `WriteBuilder` (+truncate) → `BatchWrite` →
  * `DataWriterFactory` → per-task `DataWriter` → `WriterCommitMessage` →
  * driver-side atomic `commit`.
  *
  * The storage is a driver map (gate-sized by design); the CONTRACT is the
  * 100 TB part and is implemented exactly as a real external sink must:
  *
  *  - every write task buffers rows and ships them INSIDE its commit
  *    message — nothing becomes visible at task end;
  *  - only the driver's `commit(messages)` publishes, atomically, the one
  *    message Spark chose per task — a speculative twin or retried attempt
  *    produces a message that is simply never committed, so at-least-once
  *    task execution still yields exactly-once table contents;
  *  - `truncate` composes with the same protocol (INSERT OVERWRITE /
  *    `writeTo.overwrite`): the old contents are replaced in the SAME
  *    atomic publish, never observable half-swapped;
  *  - reads snapshot the committed batches at planning time and carry rows
  *    in the `InputPartition`s (serializable — executor-correct, not a
  *    shared-JVM shortcut), one partition per committed task preserving the
  *    write parallelism.
  */
object MemTables {

  /** Committed contents of one table: schema + committed task batches. */
  final class State(val schema: StructType) {
    // committed batches, append-ordered; replaced wholesale on truncate
    @volatile var batches: Vector[Array[InternalRow]] = Vector.empty
  }

  private val tables = TrieMap.empty[String, State]

  def create(key: String, schema: StructType): Unit =
    tables.putIfAbsent(key, new State(schema)) match {
      case Some(_) =>
        throw new IllegalStateException(s"mem table $key already exists")
      case None => ()
    }

  def get(key: String): Option[State] = tables.get(key)

  def drop(key: String): Boolean = tables.remove(key).isDefined

  /** Atomic publish of one write's committed task batches. */
  def commit(key: String, truncate: Boolean, batches: Seq[Array[InternalRow]]): Unit = {
    val st = tables.getOrElse(key,
      throw new IllegalStateException(s"mem table $key dropped mid-write"))
    st.synchronized {
      st.batches = (if (truncate) Vector.empty else st.batches) ++ batches
    }
  }
}

final class MemTable(key: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = key
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new MemScan(key, tableSchema)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new MemWriteBuilder(key)
}

final class MemScan(key: String, tableSchema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String = s"GraftMemScan $key"

  override def planInputPartitions(): Array[InputPartition] = {
    // snapshot at planning: a concurrent commit lands in the NEXT query
    val st = MemTables.get(key)
      .getOrElse(throw new IllegalStateException(s"mem table $key dropped"))
    // this scan's schema was bound at loadTable time; if the table was
    // dropped and recreated with a different LAYOUT since, decoding the new
    // rows under the old schema would silently read garbage bytes — fail
    // loudly instead. Layout = field names + dataTypes (the InternalRow
    // decode contract); nullability/metadata differences decode identically
    // and must not false-positive.
    def layout(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    if (layout(st.schema) != layout(tableSchema))
      throw new IllegalStateException(
        s"mem table $key was recreated with a different schema " +
          s"(scan bound ${tableSchema.simpleString}, table now ${st.schema.simpleString})")
    st.batches.map(rows => MemPartition(rows): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val rows = partition.asInstanceOf[MemPartition].rows
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = rows(i)
          override def close(): Unit = ()
        }
      }
    }
}

/** Rows travel inside the partition — serializable, so the read path is
  * correct on a real cluster, not just local mode.
  */
final case class MemPartition(rows: Array[InternalRow]) extends InputPartition

final class MemWriteBuilder(key: String)
    extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncateOnCommit = false
  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(key, truncateOnCommit)
  }
}

final class MemBatchWrite(key: String, truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemTables.commit(key, truncate,
      messages.map(_.asInstanceOf[MemCommitMessage].rows).toSeq)

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class MemCommitMessage(rows: Array[InternalRow]) extends WriterCommitMessage

final class MemWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      // rows are reused by the caller — copy() detaches each one
      override def write(record: InternalRow): Unit = buf += record.copy()
      override def commit(): WriterCommitMessage = MemCommitMessage(buf.toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
