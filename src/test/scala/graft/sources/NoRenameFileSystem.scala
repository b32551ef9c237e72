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
