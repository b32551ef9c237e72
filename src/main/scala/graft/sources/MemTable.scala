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
  *    write parallelism;
  *  - SCHEMA EVOLUTION (`ALTER TABLE ... ADD/DROP COLUMNS`) follows the
  *    table-format contract (Iceberg-style): an alter rewrites METADATA
  *    only — every committed batch stays tagged with the schema it was
  *    written under, and scans project each batch into the scan-bound
  *    schema by NAME at read time (missing column → null, dropped column →
  *    skipped). No data rewrite, which is the only viable alter at 100 TB.
  *    Rename/type-change are rejected: name-based projection cannot track
  *    them without per-field ids, and claiming them would read garbage.
  */
object MemTables {

  /** One committed write batch: the rows plus the schema they were encoded
    * under (the InternalRow decode contract for those rows, forever).
    */
  final case class TaggedBatch(schema: StructType, rows: Array[InternalRow])

  /** Committed contents of one table: current (evolvable) schema +
    * committed task batches, each tagged with its write-time schema.
    */
  final class State(initialSchema: StructType) {
    @volatile var schema: StructType = initialSchema
    // committed batches, append-ordered; replaced wholesale on truncate
    @volatile var batches: Vector[TaggedBatch] = Vector.empty
  }

  private val tables = TrieMap.empty[String, State]

  /** Register a new table; false if the key is already taken (the catalog
    * maps that to Spark's TableAlreadyExistsException so that
    * `CREATE TABLE IF NOT EXISTS` is a no-op, not a crash).
    */
  def create(key: String, schema: StructType): Boolean =
    tables.putIfAbsent(key, new State(schema)).isEmpty

  def get(key: String): Option[State] = tables.get(key)

  def drop(key: String): Boolean = tables.remove(key).isDefined

  /** Metadata-only schema swap (ALTER TABLE): committed batches are left
    * untouched and keep their write-time schema tags.
    */
  def alterSchema(key: String, newSchema: StructType): Unit = {
    val st = tables.getOrElse(key,
      throw new IllegalStateException(s"mem table $key dropped mid-alter"))
    st.synchronized { st.schema = newSchema }
  }

  /** Atomic publish of one write's committed task batches, tagged with the
    * schema the write was bound to (NOT the table's current schema — a
    * concurrent alter must not retag in-flight rows it never migrated).
    */
  def commit(
      key: String,
      truncate: Boolean,
      writeSchema: StructType,
      batches: Seq[Array[InternalRow]]): Unit = {
    val st = tables.getOrElse(key,
      throw new IllegalStateException(s"mem table $key dropped mid-write"))
    st.synchronized {
      st.batches = (if (truncate) Vector.empty else st.batches) ++
        batches.map(TaggedBatch(writeSchema, _))
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
    new MemWriteBuilder(key, info.schema())
}

final class MemScan(key: String, tableSchema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = tableSchema
  override def toBatch: Batch = this
  override def description(): String = s"GraftMemScan $key"

  override def planInputPartitions(): Array[InputPartition] = {
    // snapshot at planning: a concurrent commit lands in the NEXT query
    val st = MemTables.get(key)
      .getOrElse(throw new IllegalStateException(s"mem table $key dropped"))
    // Every batch is read through a by-NAME projection into the scan-bound
    // schema (schema evolution: columns added after a batch was written
    // read as null; columns dropped are skipped). A same-name field whose
    // dataType differs is NOT projectable — decoding those bytes under the
    // scan's type would read garbage (the drop+recreate hazard) — so fail
    // loudly at PLANNING time, before any executor touches a row.
    st.batches.foreach { b =>
      tableSchema.fields.foreach { f =>
        val i = b.schema.fieldNames.indexOf(f.name)
        if (i >= 0 && b.schema.fields(i).dataType != f.dataType)
          throw new IllegalStateException(
            s"mem table $key: column ${f.name} was written as " +
              s"${b.schema.fields(i).dataType.simpleString} but the scan is bound to " +
              s"${f.dataType.simpleString} — recreate the table, evolution cannot retype")
      }
    }
    st.batches.map(b => MemPartition(b.schema, b.rows): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      val target = tableSchema // serialized with the factory
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[MemPartition]
        val rows = p.rows
        val sameLayout =
          p.batchSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
            target.fields.map(f => (f.name, f.dataType)).toSeq
        // by-name source ordinal per target field; -1 = not present (null)
        val srcIdx = target.fields.map(f => p.batchSchema.fieldNames.indexOf(f.name))
        val srcType = srcIdx.zipWithIndex.map { case (s, j) =>
          if (s >= 0) p.batchSchema.fields(s).dataType else target.fields(j).dataType
        }
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow =
            if (sameLayout) rows(i)
            else {
              val r = rows(i)
              val vals = new Array[Any](target.length)
              var j = 0
              while (j < target.length) {
                val s = srcIdx(j)
                vals(j) = if (s >= 0 && !r.isNullAt(s)) r.get(s, srcType(j)) else null
                j += 1
              }
              new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)
            }
          override def close(): Unit = ()
        }
      }
    }
}

/** Rows travel inside the partition — serializable, so the read path is
  * correct on a real cluster, not just local mode — along with the schema
  * they were written under (the decode contract for the projection).
  */
final case class MemPartition(batchSchema: StructType, rows: Array[InternalRow])
    extends InputPartition

final class MemWriteBuilder(key: String, writeSchema: StructType)
    extends WriteBuilder with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var truncateOnCommit = false
  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new MemBatchWrite(key, truncateOnCommit, writeSchema)
  }
}

final class MemBatchWrite(key: String, truncate: Boolean, writeSchema: StructType)
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemTables.commit(key, truncate, writeSchema,
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
