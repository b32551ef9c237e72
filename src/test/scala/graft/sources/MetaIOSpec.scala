package graft.sources

import graft.SparkSpec

/** The metadata plane's one IO interface ([[MetaIO]]) and its
  * no-atomic-rename commit protocol: on an object-store-like scheme
  * (rename THROWS — [[NoRenameFileSystem]]), commits land as write-once
  * snapshots behind a pointer swap, readers never observe a torn plane
  * (corrupted or dangling pointers fall back to the newest valid
  * snapshot), superseded snapshots are garbage-collected, and legacy
  * full-document files stay readable.
  */
class MetaIOSpec extends SparkSpec {

  private def freshDir(): (String, java.io.File) = {
    val local = java.nio.file.Files.createTempDirectory("graft-metaio").toFile
    (s"graftnr://${local.getAbsolutePath}", local)
  }

  private def doc(v: Int): Array[Byte] =
    s"""{"format-version":2,"key":"t","payload":$v}""".getBytes("UTF-8")

  private def payloadOf(bytes: Array[Byte]): Int = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.readTree(bytes).get("payload").asInt
  }

  test("commits on a no-rename scheme use write-once snapshots + a pointer") {
    val (dir, local) = freshDir()
    // rename throws on this scheme — reaching the asserts proves the
    // protocol never attempted one
    MetaIO.commit(dir, "metadata.json", doc(1))
    MetaIO.commit(dir, "metadata.json", doc(2))
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 2)
    val names = local.listFiles().map(_.getName).toSeq
    assert(names.contains("metadata.json"))
    assert(names.count(_.matches("metadata-\\d{12}(-[0-9a-f]{12})?\\.json")) === 2)
    // the pointer itself is tiny and names the current snapshot
    val ptr = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(local, "metadata.json").toPath), "UTF-8")
    assert(ptr.contains("\"pointer\""))
    assert(names.exists(n => ptr.contains(n) && n != "metadata.json"))
  }

  test("superseded snapshots are garbage-collected (current + previous kept)") {
    val (dir, local) = freshDir()
    (1 to 6).foreach(i => MetaIO.commit(dir, "metadata.json", doc(i)))
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 6)
    val snaps = local.listFiles().map(_.getName)
      .filter(_.matches("metadata-\\d{12}(-[0-9a-f]{12})?\\.json"))
    assert(snaps.length === 2, s"kept: ${snaps.mkString(",")}")
  }

  test("warm CAS commits never list the directory and GC by dense name") {
    val (dir, local) = freshDir()
    def gened(gen: Long, v: Int): Array[Byte] =
      s"""{"commit-gen":$gen,"format-version":2,"payload":$v}""".getBytes("UTF-8")
    // cold first commit may list once (cursor warm-up + legacy sweep)
    MetaIO.commitCas(dir, "metadata.json", gened(1, 1), expectedGen = 0)
    val coldCalls = NoRenameFileSystem.listCalls.get()
    (2 to 8).foreach(g =>
      MetaIO.commitCas(dir, "metadata.json", gened(g, g.toInt), expectedGen = g - 1))
    assert(NoRenameFileSystem.listCalls.get() === coldCalls,
      "a warm CAS commit must be O(1) object ops — no directory listing " +
        "(at 100 TB the table dir holds every data file)")
    // the dense-name GC keeps exactly current + previous
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 8)
    val snaps = local.listFiles().map(_.getName)
      .filter(_.matches("metadata-\\d{12}(-[0-9a-f]{12})?\\.json"))
    assert(snaps.sorted.toSeq === Seq("metadata-000000000007.json",
      "metadata-000000000008.json"), s"kept: ${snaps.mkString(",")}")
    // and a stale-generation writer still rejects without listing
    intercept[MetaIO.CommitConflictException] {
      MetaIO.commitCas(dir, "metadata.json", gened(8, 99), expectedGen = 7)
    }
    assert(NoRenameFileSystem.listCalls.get() === coldCalls)
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 8)
  }

  test("a torn or dangling pointer falls back to the newest valid snapshot") {
    val (dir, local) = freshDir()
    MetaIO.commit(dir, "metadata.json", doc(1))
    MetaIO.commit(dir, "metadata.json", doc(2))
    // torn pointer: garbage bytes where the pointer JSON should be (a
    // store with neither atomic rename nor atomic PUT) — the reader must
    // still serve a whole document, never the torn plane
    java.nio.file.Files.write(new java.io.File(local, "metadata.json").toPath,
      Array[Byte](0x7b, 0x22, 0x70)) // "{"p — truncated JSON
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 2)
    // dangling pointer: names a snapshot that is gone
    java.nio.file.Files.write(new java.io.File(local, "metadata.json").toPath,
      """{"format-version":2,"pointer":"metadata-999999999999-deadbeef0000.json"}"""
        .getBytes("UTF-8"))
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 2)
  }

  test("a crash before the first pointer write never resurrects a snapshot") {
    val (dir, local) = freshDir()
    // snapshot written, pointer never landed (crash window): the commit
    // never became visible — the reader must say "no document"
    java.nio.file.Files.write(
      new java.io.File(local, "metadata-000000000001-aabbccddee00.json").toPath,
      doc(9))
    assert(MetaIO.readCurrent(dir, "metadata.json").isEmpty)
  }

  test("legacy full-document files read back unchanged") {
    val (dir, local) = freshDir()
    java.nio.file.Files.write(
      new java.io.File(local, "metadata.json").toPath, doc(7))
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 7)
    val _ = dir
  }

  test("writeOnce is atomic object creation; exists/readBytes round-trip") {
    val (dir, local) = freshDir()
    assert(!MetaIO.exists(dir, "manifest-x.json"))
    MetaIO.writeOnce(dir, "manifest-x.json", doc(3))
    assert(MetaIO.exists(dir, "manifest-x.json"))
    assert(payloadOf(MetaIO.readBytes(dir, "manifest-x.json")) === 3)
    // second writeOnce is a no-op (bytes thunk not even evaluated)
    MetaIO.writeOnce(dir, "manifest-x.json",
      sys.error("must not evaluate for an existing manifest"))
    assert(payloadOf(MetaIO.readBytes(dir, "manifest-x.json")) === 3)
    val _ = local
  }

  private def gened(gen: Long, v: Int): Array[Byte] =
    s"""{"commit-gen":$gen,"format-version":2,"payload":$v}""".getBytes("UTF-8")

  test("a legacy pointer-swap table (no commit-gen) does not wedge CAS commits") {
    val (dir, local) = freshDir()
    // pre-CAS plane: uuid-suffixed snapshot at sequence 5 behind a
    // pointer, document carries NO commit-gen — a loader that derived
    // generation 0 from the doc alone would conflict against the legacy
    // sequence on every commit, forever (evict + reload re-derives 0)
    java.nio.file.Files.write(
      new java.io.File(local, "metadata-000000000005-aabbccddeeff.json").toPath,
      doc(5))
    java.nio.file.Files.write(new java.io.File(local, "metadata.json").toPath,
      """{"format-version":2,"pointer":"metadata-000000000005-aabbccddeeff.json"}"""
        .getBytes("UTF-8"))
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 5)
    // the loader's fallback: the pointer's sequence IS the generation
    val gen = MetaIO.legacyGen(dir, "metadata.json")
    assert(gen === 5L)
    MetaIO.commitCas(dir, "metadata.json", gened(gen + 1, 6), expectedGen = gen)
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 6)
    // and the plane is fully CAS-native from here on
    MetaIO.commitCas(dir, "metadata.json", gened(gen + 2, 7), expectedGen = gen + 1)
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 7)
    // rename-capable schemes keep the 0 expectation (fileGen reads 0 too)
    assert(MetaIO.legacyGen(
      java.nio.file.Files.createTempDirectory("graft-lg").toString,
      "metadata.json") === 0L)
  }

  test("a failed pointer PUT does not wedge the retry (own orphan adopted)") {
    val local = java.nio.file.Files.createTempDirectory("graft-metaio").toFile
    val dir = s"graftflaky://${local.getAbsolutePath}"
    MetaIO.commitCas(dir, "metadata.json", gened(1, 1), expectedGen = 0)
    // snapshot 2 lands, then the pointer PUT fails (injected): the commit
    // surfaces the IO error with the pointer still naming snapshot 1
    FlakyPointerFileSystem.failNextPointerPuts.set(1)
    intercept[java.io.IOException] {
      MetaIO.commitCas(dir, "metadata.json", gened(2, 2), expectedGen = 1)
    }
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 1)
    // the retry at the SAME generation recomputes the same sequence and
    // must adopt its OWN fresh orphan immediately — not conflict against
    // it for the whole 60 s stale window
    MetaIO.commitCas(dir, "metadata.json", gened(2, 22), expectedGen = 1)
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 22)
  }

  test("a stale commit lock is broken atomically and leaves no residue") {
    val local = java.nio.file.Files.createTempDirectory("graft-metaio").toFile
    val dir = local.getAbsolutePath // file scheme: lock-bracketed CAS
    val lock = new java.io.File(local, "metadata.json.lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis() - 2 * MetaIO.LockStaleMs))
    // a crashed holder's stale lock must not block the commit; the break
    // rides an atomic rename (no delete/create double-break window) and
    // cleans up its unique rename target
    MetaIO.commitCas(dir, "metadata.json", gened(1, 1), expectedGen = 0)
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 1)
    assert(!local.listFiles().exists(_.getName.contains(".lock")),
      s"lock residue: ${local.listFiles().map(_.getName).mkString(",")}")
  }

  test("concurrent readers during a commit storm always see a whole document") {
    val (dir, _) = freshDir()
    MetaIO.commit(dir, "metadata.json", doc(0))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val b = MetaIO.readCurrent(dir, "metadata.json")
          b.foreach(payloadOf) // parses or it was torn
        } catch { case t: Throwable => bad.set(t); stop.set(true) }
      }
    })
    reader.start()
    (1 to 40).foreach(i => MetaIO.commit(dir, "metadata.json", doc(i)))
    stop.set(true)
    reader.join(10000)
    assert(bad.get() == null, s"reader observed a torn plane: ${bad.get()}")
    assert(payloadOf(MetaIO.readCurrent(dir, "metadata.json").get) === 40)
  }
}
