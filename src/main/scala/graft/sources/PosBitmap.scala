package graft.sources

import org.roaringbitmap.RoaringBitmap

/** Compressed position-set codec — ONE bitmap shape for every place the
  * engine moves row positions around: distributed-DML results shipping
  * matched positions driver-ward ([[DistributedDml.EvalResult]]) and the
  * binary delete-vector sidecar files the metadata plane references by
  * path + cardinality ([[TableMetadata]]). RoaringBitmap (already on the
  * Spark classpath — Spark's own shuffle tracking uses it) compresses the
  * common run-shaped DELETE (contiguous position ranges) to near-constant
  * size: a 10⁶-row kill is kilobytes, not megabytes of JSON integers.
  */
object PosBitmap {

  /** Serialize a set of row positions (portable RoaringBitmap format). */
  def toBytes(positions: Iterator[Int]): Array[Byte] = {
    val bm = new RoaringBitmap()
    positions.foreach(bm.add)
    serialize(bm)
  }

  def toBytes(positions: Array[Int]): Array[Byte] = toBytes(positions.iterator)

  private def serialize(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val out = new java.io.ByteArrayOutputStream(bm.serializedSizeInBytes())
    bm.serialize(new java.io.DataOutputStream(out))
    out.toByteArray
  }

  private def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    bm
  }

  /** Decode back to sorted positions. */
  def toArray(bytes: Array[Byte]): Array[Int] = deserialize(bytes).toArray

  /** Membership probe over the DESERIALIZED bitmap — hot-loop form for
    * per-row dead checks: `RoaringBitmap.contains` on the decoded bitmap,
    * no boxed `Set[Int]` build, no per-call decode.
    */
  def membership(bytes: Array[Byte]): Int => Boolean = {
    if (bytes == null || bytes.isEmpty) return _ => false
    val bm = deserialize(bytes)
    pos => bm.contains(pos)
  }

  def cardinality(bytes: Array[Byte]): Int =
    deserialize(bytes).getCardinality

  // ------------------------------------------------ delete-vector sidecar
  //
  // A main-plane delete vector is position → KILL VERSION (time travel
  // and CDC need the version); the sidecar groups positions by version,
  // one compressed bitmap per version:
  //   magic "GDV1" | i32 versionCount | { i64 version, i32 len, bytes }*

  private val Magic = Array[Byte]('G', 'D', 'V', '1')

  /** Encode a full delete vector (position → kill version). */
  def dvToBytes(dv: Map[Int, Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.write(Magic)
    val grouped = dv.groupBy(_._2).toSeq.sortBy(_._1)
    d.writeInt(grouped.size)
    grouped.foreach { case (v, entries) =>
      val bm = new RoaringBitmap()
      entries.keysIterator.foreach(bm.add)
      val bytes = serialize(bm)
      d.writeLong(v)
      d.writeInt(bytes.length)
      d.write(bytes)
    }
    d.flush()
    out.toByteArray
  }

  def dvFromBytes(bytes: Array[Byte]): Map[Int, Long] = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    d.readFully(magic)
    if (!java.util.Arrays.equals(magic, Magic))
      throw new IllegalStateException("not a graft delete-vector file (bad magic)")
    val n = d.readInt()
    val b = Map.newBuilder[Int, Long]
    var i = 0
    while (i < n) {
      val v = d.readLong()
      val len = d.readInt()
      val bm = new Array[Byte](len)
      d.readFully(bm)
      toArray(bm).foreach(p => b += (p -> v))
      i += 1
    }
    b.result()
  }

  /** Content identity of a delete vector — the sidecar file NAME derives
    * from this, so an unchanged DV re-uses its file across metadata
    * re-writes (write-once) and a changed one mints a new name, leaving
    * the old file an orphan for the grace-window sweep.
    */
  def dvContentHash(dv: Map[Int, Long]): Long = {
    var h = 0x9E3779B97F4A7C15L
    dv.toSeq.sortBy(_._1).foreach { case (p, v) =>
      h = java.lang.Long.rotateLeft(h ^ (p * 0x85EBCA6BL), 27) * 0x2545F4914F6CDD1DL
      h = java.lang.Long.rotateLeft(h ^ v, 31) * 0xFF51AFD7ED558CCDL
    }
    h
  }
}
