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
    * under (the InternalRow decode contract for those rows, forever), plus
    * the table's alter-version at commit time — the tombstone clock that
    * keeps a DROP COLUMN + re-ADD of the same name from resurrecting
    * pre-drop values (Iceberg resolves this with field ids; a name-based
    * projection needs the version tag instead).
    */
  final case class TaggedBatch(schema: StructType, version: Long, rows: Array[InternalRow])

  /** Committed contents of one table: current (evolvable) schema +
    * committed task batches, each tagged with its write-time schema.
    */
  final class State(initialSchema: StructType) {
    @volatile var schema: StructType = initialSchema
    // committed batches, append-ordered; replaced wholesale on truncate
    @volatile var batches: Vector[TaggedBatch] = Vector.empty
    // monotone alter counter; bumped once per ALTER TABLE
    @volatile var version: Long = 0L
    // column name -> version at which it was (last) dropped. A batch whose
    // writeVersion <= droppedAt(name) predates that drop, so its same-name
    // field must NOT satisfy a later re-added column (it reads NULL) — the
    // re-added column is a NEW field that merely reuses the name.
    @volatile var droppedAt: Map[String, Long] = Map.empty
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
    * untouched and keep their write-time schema tags. Columns present in
    * the old schema but absent from the new one are tombstoned at the new
    * version, so a later re-ADD of the same name starts a fresh field
    * (pre-drop batches read NULL for it) instead of resurrecting old data.
    */
  def alterSchema(key: String, newSchema: StructType): Unit = {
    val st = tables.getOrElse(key,
      throw new IllegalStateException(s"mem table $key dropped mid-alter"))
    st.synchronized {
      st.version += 1
      val dropped = st.schema.fieldNames.toSet -- newSchema.fieldNames.toSet
      if (dropped.nonEmpty)
        st.droppedAt = st.droppedAt ++ dropped.map(_ -> st.version)
      st.schema = newSchema
    }
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
        batches.map(TaggedBatch(writeSchema, st.version, _))
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
    val droppedAt = st.droppedAt
    // Every batch is read through a by-NAME projection into the scan-bound
    // schema (schema evolution: columns added after a batch was written
    // read as null; columns dropped are skipped). A batch field whose name
    // was DROPPED after the batch was committed is hidden from the
    // projection: a column re-ADDed under that name is a new field, and
    // pre-drop batches must surface NULL for it, not their stale bytes. A
    // surviving same-name field whose dataType differs is NOT projectable —
    // decoding those bytes under the scan's type would read garbage (the
    // drop+recreate hazard) — so fail loudly at PLANNING time, before any
    // executor touches a row.
    def hiddenIn(b: MemTables.TaggedBatch): Set[String] =
      b.schema.fieldNames.iterator
        .filter(n => droppedAt.get(n).exists(_ >= b.version)).toSet
    st.batches.foreach { b =>
      val hidden = hiddenIn(b)
      tableSchema.fields.foreach { f =>
        val i = b.schema.fieldNames.indexOf(f.name)
        if (i >= 0 && !hidden.contains(f.name) && b.schema.fields(i).dataType != f.dataType)
          throw new IllegalStateException(
            s"mem table $key: column ${f.name} was written as " +
              s"${b.schema.fields(i).dataType.simpleString} but the scan is bound to " +
              s"${f.dataType.simpleString} — recreate the table, evolution cannot retype")
      }
    }
    st.batches.map(b => MemPartition(b.schema, hiddenIn(b), b.rows): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      val target = tableSchema // serialized with the factory
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[MemPartition]
        val rows = p.rows
        val sameLayout = p.hidden.isEmpty &&
          p.batchSchema.fields.map(f => (f.name, f.dataType)).toSeq ==
            target.fields.map(f => (f.name, f.dataType)).toSeq
        // by-name source ordinal per target field; -1 = not present (null);
        // tombstone-hidden fields (dropped after this batch was written,
        // possibly re-added since) are unmatchable — they read as null
        val srcIdx = target.fields.map(f =>
          if (p.hidden.contains(f.name)) -1 else p.batchSchema.fieldNames.indexOf(f.name))
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
  * they were written under (the decode contract for the projection) and the
  * names tombstoned out of this batch (dropped after it was written; they
  * must not satisfy a later re-added column of the same name).
  */
final case class MemPartition(
    batchSchema: StructType, hidden: Set[String], rows: Array[InternalRow])
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
