package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.MemTables.{ColStats, statsComparator}

/** NDV SKETCH — the distinct-count half of a manifest entry, in the form
  * that SCALES: exact 64-bit value hashes below a small threshold
  * (distinct counts that fit are kept perfect), degrading to a
  * HyperLogLog register array above it (fixed 2 KiB, ~2.3% standard
  * error at p=11). The killer property over a plain per-batch count is
  * UNION-MERGEABILITY: planning-time statistics union the sketches of
  * every planned batch and estimate the DISTINCT OF THE UNION — tight
  * for overlapping batch domains, where summing per-batch counts (the
  * previous bound) over-counts by up to the batch count. Iceberg ships
  * the same design as per-file theta sketches in puffin files.
  *
  * Hashing is XXH64 of the column's CANONICAL value (the engine's
  * [[MemTables.canonKey]] domain), so `3: INT` and `3L: BIGINT` under a
  * widening alter hash identically, and two batches' sketches agree on
  * shared values by construction. Counting distinct 64-bit hashes
  * instead of values makes exact-mode collisions ~n²/2⁶⁵ — negligible
  * at any batch size the exact mode retains.
  */
final class NdvSketch private (
    private var exact: java.util.HashSet[java.lang.Long],
    private var regs: Array[Byte]) extends Serializable {

  import NdvSketch._

  def addValue(v: Any): Unit = addHash(hashOf(v))

  def addHash(h: Long): Unit =
    if (regs != null) addToRegs(h)
    else {
      exact.add(h)
      if (exact.size > ExactThreshold) degrade()
    }

  private def degrade(): Unit = {
    regs = new Array[Byte](M)
    exact.forEach(h => addToRegs(h.longValue))
    exact = null
  }

  private def addToRegs(h: Long): Unit = {
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0L) (64 - P) else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def isExact: Boolean = regs == null

  /** Distinct estimate: exact below the threshold, standard HLL with
    * linear-counting small-range correction above it.
    */
  def estimate: Long =
    if (regs == null) exact.size.toLong
    else {
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < M) {
        sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val raw = Alpha * M.toDouble * M.toDouble / sum
      val est =
        if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
        else raw
      math.max(1L, math.round(est))
    }

  /** Fold `other` into this sketch (set union semantics). */
  def merge(other: NdvSketch): Unit =
    if (other.regs == null) other.exact.forEach(h => addHash(h.longValue))
    else {
      if (regs == null) degrade()
      var i = 0
      while (i < M) {
        if (other.regs(i) > regs(i)) regs(i) = other.regs(i)
        i += 1
      }
    }

  def copySketch(): NdvSketch =
    if (regs == null) new NdvSketch(new java.util.HashSet(exact), null)
    else new NdvSketch(null, regs.clone())

  /** Compact binary form for the durable metadata plane: 1 mode byte,
    * then either a hash list or the raw register array.
    */
  def toBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    if (regs == null) {
      out.writeByte(0)
      out.writeInt(exact.size)
      exact.forEach(h => out.writeLong(h.longValue))
    } else {
      out.writeByte(1)
      out.write(regs)
    }
    out.flush()
    bos.toByteArray
  }
}

object NdvSketch {
  /** HLL precision: 2^11 = 2048 registers, ~2.3% standard error. */
  val P = 11
  val M: Int = 1 << P
  /** Exact-mode ceiling — distinct counts at or below stay perfect. */
  val ExactThreshold = 2048
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)
  private val Seed = 42L

  def empty(): NdvSketch = new NdvSketch(new java.util.HashSet(), null)

  def fromBytes(bytes: Array[Byte]): NdvSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    in.readByte() match {
      case 0 =>
        val n = in.readInt()
        val s = new java.util.HashSet[java.lang.Long]()
        var i = 0
        while (i < n) { s.add(in.readLong()); i += 1 }
        new NdvSketch(s, null)
      case 1 =>
        val regs = new Array[Byte](M)
        in.readFully(regs)
        new NdvSketch(null, regs)
      case other =>
        throw new IllegalStateException(s"unknown NDV sketch mode $other")
    }
  }

  /** XXH64 of one CANONICAL value ([[MemTables.canonKey]] output). */
  def hashOf(v: Any): Long = MemTables.canonKey(v) match {
    case l: java.lang.Long => XXH64.hashLong(l.longValue, Seed)
    case s: String =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, Seed)
    case d: java.lang.Double =>
      XXH64.hashLong(java.lang.Double.doubleToLongBits(d.doubleValue), Seed)
    case b: java.lang.Boolean => XXH64.hashInt(if (b.booleanValue) 1 else 0, Seed)
    case other => XXH64.hashLong(other.hashCode.toLong, Seed)
  }
}

/** Fixed-size per-batch BLOOM REGISTER (8 KiB, 65536 bits, 4 probes)
  * over the same canonical XXH64 hashes as [[NdvSketch]] — the point-
  * predicate skipping a min/max bound cannot give on an UNCLUSTERED
  * high-cardinality key (`k = literal` on a key the layout isn't sorted
  * or partitioned by keeps every batch under bounds alone; the bloom
  * prunes the batches that definitively lack the value). No false
  * negatives, so skipping on "absent" is sound; false positives merely
  * keep a batch (~0.2% at 5k distinct, degrading gracefully toward
  * keep-everything as the register saturates — exactly parquet's
  * column-bloom contract). Opt-in per table via
  * `'graft.bloom-columns'='k,...'`, mirroring parquet/Iceberg's
  * per-column bloom enablement.
  */
object BatchBloom {
  val Words = 1024 // 65536 bits = 8 KiB per column per batch
  private val Bits = Words * 64
  private val Probes = 4

  def empty(): Array[Long] = new Array[Long](Words)

  def add(bloom: Array[Long], h: Long): Unit = {
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L // odd stride
    var i = 0
    while (i < Probes) {
      val pos = (((h1 + i * h2) % Bits + Bits) % Bits).toInt
      bloom(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  def mightContain(bloom: Array[Long], h: Long): Boolean = {
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    var i = 0
    while (i < Probes) {
      val pos = (((h1 + i * h2) % Bits + Bits) % Bits).toInt
      if ((bloom(pos >> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

/** INCREMENTAL column statistics for one batch — the row-at-a-time form
  * of [[MemTables.statsOf]], shared by the array path and the STREAMING
  * write path (write-as-you-iterate tasks accumulate bounds and the NDV
  * sketch without ever buffering their partition — the per-task memory
  * ceiling the round-12 verdict flagged). Retained min/max candidates
  * are COPIED when buffer-backed (`UTF8String` points into a reused
  * UnsafeRow buffer; holding the reference would corrupt the bound on
  * the next row).
  */
final class StatsAccumulator(schema: StructType,
    bloomCols: Set[String] = Set.empty) extends Serializable {
  private val fields = schema.fields
  private val cmps = fields.map(f => statsComparator(f.dataType).orNull)
  private val mins = new Array[Any](fields.length)
  private val maxs = new Array[Any](fields.length)
  private val nulls = new Array[Long](fields.length)
  private val sketches = fields.indices.map(i =>
    if (cmps(i) == null) null else NdvSketch.empty()).toArray
  private val blooms = fields.indices.map(i =>
    if (cmps(i) != null && bloomCols.contains(fields(i).name))
      BatchBloom.empty() else null).toArray
  // double image + sampler per sampled column: numeric/date/timestamp
  // (the catalyst histogram domain) plus STRING via the full-value hash
  // image (feeds the skew-aware effective NDV at planning — never a
  // catalyst histogram)
  private val toDouble = fields.map(f =>
    if (statsComparator(f.dataType).isEmpty) null
    else SampleSketch.statsDouble(f.dataType)
      .orElse(SampleSketch.stringDouble(f.dataType)).orNull)
  private val samples = fields.indices.map(i =>
    if (toDouble(i) == null) null else new SampleSketch()).toArray
  private var rows = 0L

  private def retained(v: Any): Any = v match {
    case u: UTF8String => u.clone()
    case other => other
  }

  def add(r: InternalRow): Unit = {
    rows += 1L
    var i = 0
    while (i < fields.length) {
      if (cmps(i) != null) {
        if (r.isNullAt(i)) nulls(i) += 1L
        else {
          val v = r.get(i, fields(i).dataType)
          if (mins(i) == null || cmps(i)(v, mins(i)) < 0) mins(i) = retained(v)
          if (maxs(i) == null || cmps(i)(v, maxs(i)) > 0) maxs(i) = retained(v)
          val h = NdvSketch.hashOf(v)
          sketches(i).addHash(h)
          if (blooms(i) != null) BatchBloom.add(blooms(i), h)
          if (samples(i) != null) samples(i).add(toDouble(i)(v))
        }
      }
      i += 1
    }
  }

  def rowCount: Long = rows

  def result(): Map[String, ColStats] =
    fields.indices.iterator.collect {
      case i if cmps(i) != null =>
        fields(i).name -> ColStats(mins(i), maxs(i), nulls(i), rows,
          sketches(i).estimate, Some(sketches(i)), Option(blooms(i)),
          Option(samples(i)).filterNot(_.isEmpty).map(_.values))
    }.toMap
}

/** DETERMINISTIC bounded value sample of one batch column — the raw
  * material for planning-time EQUI-HEIGHT HISTOGRAMS (CBO join/filter
  * selectivity on skewed keys, where NDV alone estimates uniform).
  * Systematic sampling with stride doubling: keep every `stride`-th
  * value; when the buffer fills, drop every other retained value and
  * double the stride — one pass, O(cap) memory, NO randomness (publishes
  * must be reproducible byte-for-byte), value-frequency-proportional for
  * any ordering that isn't adversarial. Values are the column's DOUBLE
  * image ([[statsDouble]]); only numeric/date/timestamp columns sample.
  */
final class SampleSketch(cap: Int = 512) extends Serializable {
  private var stride = 1L
  private var seen = 0L
  private var n = 0
  private var buf = new Array[Double](cap)

  def add(v: Double): Unit = {
    if (seen % stride == 0) {
      if (n == cap) {
        // halve: keep positions 0, 2, 4, ... (systematic thinning)
        var i = 0
        while (2 * i < n) { buf(i) = buf(2 * i); i += 1 }
        n = i
        stride *= 2
      }
      buf(n) = v
      n += 1
    }
    seen += 1L
  }

  def values: Array[Double] = java.util.Arrays.copyOf(buf, n)
  def isEmpty: Boolean = n == 0
}

object SampleSketch {
  /** Double image of one INTERNAL value per histogrammable type: the
    * catalyst histogram domain (dates = epoch days, timestamps = epoch
    * micros — exactly what catalyst's own estimation uses). None = the
    * type keeps no histogram (strings, binary, nested).
    */
  def statsDouble(dt: org.apache.spark.sql.types.DataType): Option[Any => Double] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => Some(v => v.asInstanceOf[Long].toDouble)
      case IntegerType => Some(v => v.asInstanceOf[Int].toDouble)
      case ShortType => Some(v => v.asInstanceOf[Short].toDouble)
      case ByteType => Some(v => v.asInstanceOf[Byte].toDouble)
      case DoubleType => Some(v => v.asInstanceOf[Double])
      case FloatType => Some(v => v.asInstanceOf[Float].toDouble)
      case DateType => Some(v => v.asInstanceOf[Int].toDouble)
      case TimestampType | TimestampNTZType => Some(v => v.asInstanceOf[Long].toDouble)
      case _ => None
    }
  }

  /** Double image of a STRING value: the FULL value's 64-bit hash
    * ([[NdvSketch.hashOf]]) as a fraction in [0, 1) — distinct strings
    * map to distinct images (up to 53-bit hash collisions, negligible at
    * the 512-value sample cap), so per-value sample masses measure VALUE
    * skew, never prefix concentration. A prefix image here would collapse
    * a high-cardinality column dominated by one prefix (URLs, paths) to
    * one sampled "value" and report NDV≈1 to catalyst for a near-unique
    * column. Feeds per-batch SAMPLES for string columns; planning derives
    * the skew-aware effective NDV from them (an order-free statistic —
    * the hash image loses ordering, which nothing downstream reads). It
    * must NEVER become a catalyst histogram: catalyst's join estimator
    * crashes on a string-typed histogram (`computeByHistogram` does
    * `newMin.get.toString.toDouble`, and `ValueInterval.intersect` on
    * StringType returns `(None, None)` — verified against the Spark 4.1.2
    * bytecode), so the planning side reports string histograms nowhere.
    */
  def stringDouble(dt: org.apache.spark.sql.types.DataType): Option[Any => Double] =
    dt match {
      case org.apache.spark.sql.types.StringType => Some { v =>
        // unsigned 64-bit hash → [0, 1) via the top 53 bits
        (NdvSketch.hashOf(v) >>> 11).toDouble / (1L << 53).toDouble
      }
      case _ => None
    }
}

/** Incremental sortedness verdict for one open file: tracks whether rows
  * arrived lexicographically ASC NULLS FIRST by the table's DECLARED sort
  * order — one comparison per row, computed WHERE the rows are (the write
  * task), so the publish-side claim maintenance never re-reads a file.
  * No declared order (or an uncoverable column type) = verdict false.
  */
final class SortTracker(schema: StructType, sortCols: Seq[String]) {
  private val idx = sortCols.map(c => schema.fieldNames.indexOf(c)).toArray
  private val types =
    idx.map(i => if (i >= 0) schema.fields(i).dataType else null)
  private val cmps = types.map(t =>
    if (t == null) None else statsComparator(t))
  private val usable =
    idx.nonEmpty && !idx.contains(-1) && cmps.forall(_.isDefined)
  private var ok = usable
  private var prev: Array[Any] = null

  def add(r: InternalRow): Unit = if (ok) {
    val cur = new Array[Any](idx.length)
    var c = 0
    while (c < idx.length) {
      cur(c) =
        if (r.isNullAt(idx(c))) null
        else r.get(idx(c), types(c)) match {
          // detach from the reused row buffer — the value is retained
          case u: UTF8String => u.clone()
          case v => v
        }
      c += 1
    }
    if (prev != null) {
      var rel = 0
      var c2 = 0
      while (c2 < idx.length && rel == 0) {
        rel = (prev(c2), cur(c2)) match {
          case (null, null) => 0
          case (null, _) => -1 // NULLS FIRST
          case (_, null) => 1
          case (a, b) => cmps(c2).get(a, b)
        }
        c2 += 1
      }
      if (rel > 0) ok = false
    }
    prev = cur
  }

  /** Verified sorted by the declared order (false when none declared). */
  def sorted: Boolean = ok
}

/** STREAMING per-task file writer for the parquet storage plane: rows
  * arrive one at a time (reused buffers), route to one open parquet
  * writer per partition tuple, and stats accumulate incrementally — the
  * task's memory footprint is its open writers + accumulators, NEVER the
  * partition's rows. Replaces the buffer-whole-partition-then-split
  * shape in every write path (ordinary writes, rewrite jobs, distributed
  * compaction).
  */
final class TaskFileWriter(pw: MemParquetWrite, filePrefix: String) {
  private val open = scala.collection.mutable.LinkedHashMap
    .empty[Seq[Any], (String, ParquetRows.RowFileWriter, StatsAccumulator, SortTracker)]

  private def retainedTuple(pt: Seq[Any]): Seq[Any] = pt.map {
    case u: UTF8String => u.clone()
    case other => other
  }

  def write(r: InternalRow): Unit = {
    val pt = MemTables.partTupleOf(pw.spec, pw.schema, r)
    val (_, w, acc, st) = open.get(pt) match {
      case Some(t) => t
      case None =>
        val path = s"${pw.dir}/$filePrefix-" +
          s"${java.util.UUID.randomUUID().toString.take(8)}.parquet"
        val t = (path, ParquetRows.open(path, pw.schema),
          new StatsAccumulator(pw.schema, pw.bloomCols.toSet),
          new SortTracker(pw.schema, pw.sortCols))
        open.put(retainedTuple(pt), t)
        t
    }
    w.write(r)
    acc.add(r)
    st.add(r)
  }

  def isEmpty: Boolean = open.isEmpty

  /** Close every writer and return the manifests (insertion-ordered). */
  def finish(): Vector[FileManifest] =
    open.iterator.map { case (pt, (path, w, acc, st)) =>
      val n = w.close()
      FileManifest(path, n.toInt, pt, pw.specId, acc.result(), st.sorted)
    }.toVector

  /** Best-effort cleanup of a failed task's partial files. */
  def abort(): Unit = open.valuesIterator.foreach { case (path, w, _, _) =>
    try w.close() catch { case _: Exception => () }
    try ParquetRows.delete(path) catch { case _: Exception => () }
  }
}
