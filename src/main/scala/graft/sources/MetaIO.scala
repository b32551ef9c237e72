package graft.sources

import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The metadata plane's ONE IO interface — every durable-metadata byte
  * (`metadata.json`, immutable `manifest-*.json`, the MV refresh journal
  * `mv.json`) moves through here, over the same Hadoop `FileSystem` API
  * the data files ride ([[ParquetRows]]). One code path addresses local
  * disk at gate scale and object storage (`s3a://…`) on a cluster.
  *
  * COMMIT PROTOCOL, capability-dispatched per scheme:
  *
  *  - rename-capable filesystems (`file`, `hdfs`, `viewfs`): write
  *    `<name>.tmp`, then atomically rename onto `<name>` — a reader (or
  *    a crash) never observes a torn document. This is byte-identical to
  *    the plane's historical shape, so the local hot path (one write +
  *    one rename per commit, under the table monitor) costs exactly what
  *    it did.
  *
  *  - object stores (no atomic rename-overwrite; `s3a` renames are
  *    copy+delete): the Iceberg version-hint shape — the full document
  *    lands under a WRITE-ONCE name (`<base>-<seq>-<uuid>.json`,
  *    `create(overwrite = false)`: object creation is atomic, collisions
  *    fail instead of tearing), then the tiny POINTER `<name>` is
  *    overwritten in place (a single object PUT — atomic per object-store
  *    semantics: readers see the old or the new pointer, never bytes of
  *    both). Superseded snapshots older than the previous one are deleted
  *    after the swap. Readers resolve the pointer to its snapshot; a
  *    pointer that is unreadable or names a missing snapshot (possible
  *    only on a store with NEITHER atomic rename NOR atomic PUT) falls
  *    back to the newest sequence-numbered snapshot that parses — so even
  *    there, a reader never observes a torn plane, at worst a fully
  *    written commit slightly early.
  *
  * Readers accept both forms (pointer or legacy full document), so
  * pre-existing table directories stay readable.
  */
private[sources] object MetaIO {

  /** Schemes whose `rename` atomically replaces the destination. */
  private val RenameCapable = Set("file", "hdfs", "viewfs")

  // template Configuration: parsing the Hadoop default XMLs costs tens of
  // ms — pay it once. file: goes through RawLocalFileSystem (no .crc
  // shadows; metadata docs carry their own JSON integrity) with the FS
  // cache off so other file:-users' checksumming is untouched.
  private lazy val conf: Configuration = {
    val c = new Configuration()
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.set("fs.file.impl.disable.cache", "true")
    c
  }

  // FileSystem per scheme+authority (our conf disables the Hadoop cache
  // for file:, so cache here instead — RawLocalFileSystem construction is
  // trivial but not free on every metadata probe)
  private val fsCache = TrieMap.empty[String, FileSystem]

  private[sources] def fs(p: Path): FileSystem = {
    val uri = p.toUri
    val key = s"${uri.getScheme}|${uri.getAuthority}"
    fsCache.getOrElseUpdate(key, p.getFileSystem(new Configuration(conf)))
  }

  private def renameCapable(p: Path): Boolean = {
    val scheme = Option(p.toUri.getScheme).getOrElse("file")
    RenameCapable.contains(scheme)
  }

  private def isLocal(dir: String): Boolean = {
    val s = new Path(dir).toUri.getScheme
    s == null || s == "file"
  }

  def exists(dir: String, name: String): Boolean =
    if (isLocal(dir)) new java.io.File(new Path(dir).toUri.getPath, name).isFile
    else {
      val p = new Path(dir, name)
      fs(p).exists(p)
    }

  def delete(dir: String, name: String): Unit = {
    val p = new Path(dir, name)
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, false); () }
  }

  private def readAll(p: Path): Array[Byte] = {
    val f = fs(p)
    val in = f.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeAll(p: Path, bytes: Array[Byte], overwrite: Boolean): Unit = {
    val out = fs(p).create(p, overwrite)
    try out.write(bytes) finally out.close()
  }

  /** Write an IMMUTABLE, uniquely named document if absent (manifests):
    * an existing name is already the same content by construction. Local
    * disk writes a unique tmp then renames (a crash mid-write must not
    * park a torn file under the final name, where the existence check
    * would shield it forever); object stores create the object directly
    * (object birth is atomic — present means whole).
    */
  def writeOnce(dir: String, name: String, bytes: => Array[Byte]): Unit = {
    if (exists(dir, name)) return
    if (isLocal(dir)) {
      val localDir = new Path(dir).toUri.getPath
      val tmp = java.nio.file.Paths.get(localDir,
        name + "." + UUID.randomUUID().toString.take(8) + ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(localDir, name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } else writeAll(new Path(dir, name), bytes, overwrite = false)
  }

  /** Read one immutable document (manifest); the caller knows it exists. */
  def readBytes(dir: String, name: String): Array[Byte] =
    readAll(new Path(dir, name))

  // ------------------------------------------------- pointer-swap commits

  // base ("metadata" | "mv") -> snapshot name parts
  private def snapPattern(base: String) =
    (s"^\\Q$base\\E-(\\d{12})-[0-9a-f]{12}\\.json$$").r

  // per-directory+base next sequence, derived once from a listing then
  // monotonic in-memory (a restart re-derives: max existing + 1)
  private val seqCache = TrieMap.empty[String, java.util.concurrent.atomic.AtomicLong]

  private def nextSeq(dir: String, base: String): Long = {
    val counter = seqCache.getOrElseUpdate(s"$dir|$base", {
      val pat = snapPattern(base)
      val dp = new Path(dir)
      val f = fs(dp)
      val maxExisting =
        if (!f.exists(dp)) -1L
        else f.listStatus(dp).iterator.map(_.getPath.getName).collect {
          case pat(seq) => seq.toLong
        }.foldLeft(-1L)(math.max)
      new java.util.concurrent.atomic.AtomicLong(maxExisting)
    })
    counter.incrementAndGet()
  }

  /** Atomically publish `<dir>/<name>` (e.g. `metadata.json`) with the
    * given full-document bytes, per the scheme's commit protocol.
    * `base` = the snapshot-name stem (`name` minus `.json`).
    */
  def commit(dir: String, name: String, bytes: Array[Byte]): Unit = {
    val target = new Path(dir, name)
    val scheme = Option(target.toUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      // local disk: the proven nio tmp + ATOMIC_MOVE (replace) shape —
      // the gate-scale hot path stays exactly two filesystem ops. The
      // dir normalizes through Path.toUri.getPath like exists/writeOnce
      // do, so a 'file:'-schemed dir commits where readers resolve
      val localDir = new Path(dir).toUri.getPath
      val tmp = java.nio.file.Paths.get(localDir, name + ".tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, java.nio.file.Paths.get(localDir, name),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ()
    } else if (renameCapable(target)) {
      // HDFS-like: FileContext exposes the atomic overwrite-rename
      val tmp = new Path(dir, name + ".tmp")
      writeAll(tmp, bytes, overwrite = true)
      org.apache.hadoop.fs.FileContext
        .getFileContext(target.toUri, new Configuration(conf))
        .rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } else {
      val base = name.stripSuffix(".json")
      val seq = nextSeq(dir, base)
      val snap =
        f"$base-$seq%012d-${UUID.randomUUID().toString.replace("-", "").take(12)}.json"
      writeAll(new Path(dir, snap), bytes, overwrite = false) // write-once
      val ptr = s"""{"format-version":2,"pointer":"$snap"}"""
      writeAll(target, ptr.getBytes("UTF-8"), overwrite = true) // one PUT
      // keep current + previous; older snapshots are superseded
      val pat = snapPattern(base)
      val fsys = fs(target)
      fsys.listStatus(new Path(dir)).foreach { s =>
        s.getPath.getName match {
          case pat(sq) if sq.toLong < seq - 1 => fsys.delete(s.getPath, false); ()
          case _ => ()
        }
      }
    }
  }

  /** Read the CURRENT document behind `<dir>/<name>`: a legacy full
    * document returns directly; a pointer resolves to its snapshot; an
    * unreadable pointer or missing snapshot falls back to the newest
    * snapshot that exists. None = no document (table/journal not durable
    * yet — an absent pointer is NOT recovered from stray snapshots: a
    * crash before the first pointer write means the commit never
    * happened).
    */
  def readCurrent(dir: String, name: String): Option[Array[Byte]] = {
    val target = new Path(dir, name)
    val f = fs(target)
    if (!f.exists(target)) {
      if (isLocal(dir)) return None
      // an object store CAN lose the tiny pointer to a partial failure
      // after snapshots exist — treat exactly like a torn pointer
      return newestSnapshot(dir, name.stripSuffix(".json")).map(readAll)
        .filter(_ => hadPointerEver(dir, name))
    }
    val bytes = readAll(target)
    // empty bytes (a truncate-then-write PUT caught at zero) parse to
    // Jackson's MissingNode, not an exception — both are TORN here
    val parsed =
      try Some(new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes))
        .filter(r => bytes.nonEmpty && !r.isMissingNode && r.isObject)
      catch { case _: Exception => None }
    parsed match {
      case Some(root) if root.has("pointer") =>
        val sp = new Path(dir, root.get("pointer").asText)
        if (f.exists(sp)) Some(readAll(sp))
        else newestSnapshot(dir, name.stripSuffix(".json")).map(readAll)
      case Some(_) => Some(bytes) // legacy full document
      case None =>
        // TORN bytes (a store with neither atomic rename nor atomic
        // PUT): never surface them — serve the newest whole snapshot
        newestSnapshot(dir, name.stripSuffix(".json")).map(readAll)
    }
  }

  // a crash before the FIRST pointer write means the commit never became
  // visible — stray snapshots alone must not resurrect it. GC keeps ≥2
  // snapshots once a second commit landed, so ">1 snapshot" or "pointer
  // present at some point" distinguishes the cases; with exactly one
  // snapshot and no pointer, the only consistent history is "first commit
  // never finished".
  private def hadPointerEver(dir: String, name: String): Boolean = {
    val pat = snapPattern(name.stripSuffix(".json"))
    val dp = new Path(dir)
    val f = fs(dp)
    f.exists(dp) && f.listStatus(dp).count(s => pat.findFirstIn(s.getPath.getName).isDefined) > 1
  }

  private def newestSnapshot(dir: String, base: String): Option[Path] = {
    val pat = snapPattern(base)
    val dp = new Path(dir)
    val f = fs(dp)
    if (!f.exists(dp)) return None
    f.listStatus(dp).iterator
      .map(_.getPath)
      .flatMap(p => p.getName match {
        case pat(seq) => Some((seq.toLong, p))
        case _ => None
      })
      .toSeq.sortBy(-_._1)
      .collectFirst { case (_, p) if parses(p) => p }
  }

  private def parses(p: Path): Boolean =
    try {
      val bytes = readAll(p)
      bytes.nonEmpty &&
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(bytes).isObject
    } catch { case _: Exception => false }
}
