package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local-disk filesystem that REFUSES rename — the object-store shape
  * (S3-like: atomic object creation, no atomic rename-overwrite). Any
  * rename attempt throws, so a test passing over this scheme PROVES the
  * metadata commit protocol never relied on one.
  */
class NoRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftnr"
  override def getUri: URI = URI.create("graftnr:///")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException(
      s"graftnr:// has no atomic rename ($src -> $dst) — the metadata " +
        "plane must use write-once names + a pointer swap here")
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    NoRenameFileSystem.listCalls.incrementAndGet()
    super.listStatus(p)
  }
}

object NoRenameFileSystem {
  /** Directory listings observed — warm CAS commits must never list
    * (O(1) object ops per metadata commit at scale).
    */
  val listCalls = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** [[NoRenameFileSystem]] that FAILS the next N pointer PUTs (overwrite
  * creates of `metadata.json`) — the partial-failure window between a
  * successful write-once snapshot and the pointer swap, injectable so
  * the own-orphan retry path is testable.
  */
class FlakyPointerFileSystem extends NoRenameFileSystem {
  override def getScheme: String = "graftflaky"
  override def getUri: URI = URI.create("graftflaky:///")

  private def maybeFail(f: Path, overwrite: Boolean): Unit =
    if (overwrite && f.getName == "metadata.json" &&
        FlakyPointerFileSystem.failNextPointerPuts.getAndUpdate(n =>
          math.max(0, n - 1)) > 0)
      throw new java.io.IOException(s"injected pointer PUT failure for $f")

  // RawLocalFileSystem routes FileSystem.create(Path, boolean) through
  // the permission-less 6-arg overload — intercept both
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    maybeFail(f, overwrite)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    maybeFail(f, overwrite)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}

object FlakyPointerFileSystem {
  val failNextPointerPuts = new java.util.concurrent.atomic.AtomicInteger(0)
}
