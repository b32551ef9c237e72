package graft.sources

import java.net.{InetSocketAddress, URLDecoder, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import java.util.concurrent.atomic.AtomicLong

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** A shared CATALOG SERVICE for the durable metadata plane — the
  * Iceberg-REST-catalog shape (public protocol: REST catalog servers
  * front the metadata-pointer commits while data and manifest files go
  * direct to storage). The reference pipeline has no multi-process
  * catalog at all (each Airflow task re-reads its own outputs,
  * `/root/reference/dags/rental_pipeline_dag.py:137-170`); at 100 TB a
  * fleet of drivers over one warehouse needs a single COMMIT AUTHORITY
  * so optimistic writers serialize at a service instead of each racing
  * the object store's weakest primitive.
  *
  * Split of responsibilities, exactly the lakehouse one:
  *
  *  - DATA and MANIFEST files (immutable, content-named) keep going
  *    DIRECT to storage from executors — the service never sees a row
  *    and never becomes an I/O bottleneck.
  *  - The MUTABLE pointer plane — `metadata.json` and the MV refresh
  *    journal, i.e. every [[MetaIO.commitCas]]/[[MetaIO.readCurrent]]/
  *    [[MetaIO.currentGen]] — routes through the service, which executes
  *    the proven file CAS protocol server-side. One process arbitrates,
  *    so CAS holds even on stores with no atomic primitive at all.
  *
  * Protocol (JSON over HTTP, loopback-bound — deployments front it with
  * their own transport security):
  * {{{
  *   GET  /v1/config                   -> {"warehouse": dir}
  *   GET  /v1/tables                   -> {"tables": [key, ...]}
  *   GET  /v1/pointer?dir=..&name=..   -> {"doc": b64} | 404
  *   GET  /v1/gen?dir=..&name=..       -> {"gen": n, "legacy": n, "exists": b}
  *   POST /v1/commit {dir,name,expected?,doc} -> {"gen": n} | 409 on CAS reject
  * }}}
  *
  * Every `dir` must resolve under the server's warehouse root (403
  * otherwise) — the service is an authority over ONE warehouse, not an
  * open file proxy.
  */
final class CatalogServer(val warehouseRoot: String, port0: Int = 0) {

  // a scheme'd warehouse (object store) guards by normalized-URI prefix;
  // a plain local path by canonical path — both defuse `..` traversal
  private val rootHasScheme = warehouseRoot.contains("://")
  private val rootCanonical =
    if (rootHasScheme) warehouseRoot.stripSuffix("/")
    else new java.io.File(warehouseRoot).getCanonicalPath

  private val http = HttpServer.create(
    new InetSocketAddress(java.net.InetAddress.getLoopbackAddress, port0), 0)
  http.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "graft-catalog-server"); t.setDaemon(true); t
  }))

  /** Observability for specs and ops: pointer commits / reads served. */
  val commitCount = new AtomicLong(0)
  val readCount = new AtomicLong(0)

  // per-(dir, name) commit serialization — the POINT of the service on
  // stores with no atomic primitive: two same-generation committers on
  // the handler pool must not both pass the CAS check (create-if-absent
  // on RawLocalFileSystem/S3 is a non-atomic exists-then-create; the
  // file protocol's lock only guards rename-capable schemes, and its
  // "table monitor excludes thread contention" assumption does not hold
  // inside the server). One monitor per plane, bounded by table count.
  private val commitLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  private val mapper = new ObjectMapper()

  def port: Int = http.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$port"

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def err(msg: String): String =
    mapper.writeValueAsString(
      mapper.createObjectNode().put("error", msg))

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else URLDecoder.decode(kv.take(i), "UTF-8") ->
          URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap

  /** A dir outside the warehouse is refused — the canonical-path check
    * also defuses `..` traversal in the query param.
    */
  private def guarded(dir: String): Option[String] =
    if (rootHasScheme) {
      val norm = dir.stripSuffix("/")
      val traverses = norm.split('/').contains("..")
      if (!traverses &&
          (norm == rootCanonical || norm.startsWith(rootCanonical + "/")))
        Some(norm)
      else None
    } else {
      val canon = new java.io.File(dir).getCanonicalPath
      if (canon == rootCanonical ||
          canon.startsWith(rootCanonical + java.io.File.separator))
        Some(canon)
      else None
    }

  /** Pointer-document names are FLAT (`metadata.json`, `mv.json`) — a
    * separator or `..` in `name` would join past the guarded dir, so it
    * is refused outright (the dir guard alone cannot see it).
    */
  private def safeName(n: String): Boolean =
    n.nonEmpty && !n.contains('/') && !n.contains('\\') &&
      n != "." && n != ".."

  private def handle(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      case e: Exception =>
        try respond(ex, 500, err(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        catch { case _: Exception => () }
    } finally ex.close()

  http.createContext("/v1/config", (ex: HttpExchange) => handle(ex) {
    respond(ex, 200, mapper.writeValueAsString(
      mapper.createObjectNode().put("warehouse", rootCanonical)))
  })

  http.createContext("/v1/tables", (ex: HttpExchange) => handle(ex) {
    val dirs: Seq[String] =
      if (rootHasScheme) {
        val rp = new org.apache.hadoop.fs.Path(rootCanonical)
        val f = MetaIO.fs(rp)
        if (!f.exists(rp)) Nil
        else f.listStatus(rp).iterator.filter(_.isDirectory)
          .map(_.getPath.toString).toSeq
      } else
        Option(new java.io.File(rootCanonical).listFiles())
          .getOrElse(Array.empty[java.io.File])
          .iterator.filter(_.isDirectory)
          .filter(d => new java.io.File(d, TableMetadata.FileName).isFile)
          .map(_.getPath).toSeq
    val keys = dirs.flatMap { d =>
      try TableMetadata.peekKeyLocal(d) catch { case _: Exception => None }
    }.distinct.sorted
    val node = mapper.createObjectNode()
    val arr = node.putArray("tables")
    keys.foreach(arr.add)
    respond(ex, 200, mapper.writeValueAsString(node))
  })

  http.createContext("/v1/pointer", (ex: HttpExchange) => handle(ex) {
    val p = params(ex)
    guarded(p.getOrElse("dir", "")) match {
      case _ if !safeName(p.getOrElse("name", "")) =>
        respond(ex, 403, err("name must be a flat document name"))
      case None => respond(ex, 403, err("dir outside warehouse"))
      case Some(dir) =>
        readCount.incrementAndGet()
        MetaIO.localReadCurrent(dir, p("name")) match {
          case None => respond(ex, 404, err("absent"))
          case Some(bytes) =>
            respond(ex, 200, mapper.writeValueAsString(mapper.createObjectNode()
              .put("doc", Base64.getEncoder.encodeToString(bytes))))
        }
    }
  })

  http.createContext("/v1/gen", (ex: HttpExchange) => handle(ex) {
    val p = params(ex)
    guarded(p.getOrElse("dir", "")) match {
      case _ if !safeName(p.getOrElse("name", "")) =>
        respond(ex, 403, err("name must be a flat document name"))
      case None => respond(ex, 403, err("dir outside warehouse"))
      case Some(dir) =>
        readCount.incrementAndGet()
        val name = p("name")
        respond(ex, 200, mapper.writeValueAsString(mapper.createObjectNode()
          .put("gen", MetaIO.localCurrentGen(dir, name))
          .put("legacy", MetaIO.localLegacyGen(dir, name))
          .put("exists", MetaIO.exists(dir, name))))
    }
  })

  http.createContext("/v1/commit", (ex: HttpExchange) => handle(ex) {
    val root = mapper.readTree(ex.getRequestBody)
    if (root == null || !root.isObject || !root.has("dir") ||
        !root.has("name") || !root.has("doc")) {
      respond(ex, 400, err("commit body needs dir, name, doc"))
    } else guarded(root.get("dir").asText) match {
      case _ if !safeName(root.get("name").asText) =>
        respond(ex, 403, err("name must be a flat document name"))
      case None => respond(ex, 403, err("dir outside warehouse"))
      case Some(dir) =>
        val name = root.get("name").asText
        val bytes = Base64.getDecoder.decode(root.get("doc").asText)
        val expected =
          if (root.hasNonNull("expected")) Some(root.get("expected").asLong)
          else None
        try {
          // the service end runs the SAME file protocol the local mode
          // does — one implementation, one arbiter process, SERIALIZED
          // per plane so the CAS verdict is authoritative even on
          // stores with no atomic create
          val lock = commitLocks.getOrElseUpdate(s"$dir|$name", new Object)
          lock.synchronized {
            MetaIO.localCommit(dir, name, bytes, expected)
          }
          commitCount.incrementAndGet()
          respond(ex, 200, mapper.writeValueAsString(mapper.createObjectNode()
            .put("gen", MetaIO.localCurrentGen(dir, name))))
        } catch {
          case e: MetaIO.CommitConflictException =>
            respond(ex, 409, err(e.getMessage))
        }
    }
  })

  def start(): this.type = { http.start(); this }
  def stop(): Unit = http.stop(0)
}

/** Client side of the catalog service: [[MetaIO]] routes the mutable
  * pointer plane here when a `rest-uri` is configured
  * ([[MetaIO.useRestCatalog]] / the `rest-uri` catalog option). A CAS
  * reject surfaces as the SAME [[MetaIO.CommitConflictException]] the
  * file protocol throws, so [[MemTables]]' reload-and-retry loop works
  * identically over either authority; an unreachable service fails
  * LOUDLY — silently falling back to direct file CAS would fork the
  * arbitration the service exists to centralize.
  */
final class CatalogClient(val baseUri: String) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(5))
    .build()

  private val mapper = new ObjectMapper()

  private def get(path: String, query: (String, String)*): HttpResponse[Array[Byte]] = {
    val q =
      if (query.isEmpty) ""
      else "?" + query.map { case (k, v) =>
        k + "=" + URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
    send(HttpRequest.newBuilder(java.net.URI.create(baseUri + path + q))
      .timeout(java.time.Duration.ofSeconds(30)).GET().build())
  }

  private def send(req: HttpRequest): HttpResponse[Array[Byte]] =
    try http.send(req, HttpResponse.BodyHandlers.ofByteArray())
    catch {
      case e: java.io.IOException =>
        throw new IllegalStateException(
          s"graft catalog service unreachable at $baseUri: ${e.getMessage}", e)
    }

  private def bodyError(resp: HttpResponse[Array[Byte]]): String =
    try {
      val root = mapper.readTree(resp.body())
      if (root != null && root.isObject && root.has("error"))
        root.get("error").asText
      else new String(resp.body(), UTF_8)
    } catch { case _: Exception => s"HTTP ${resp.statusCode}" }

  private def expectOk(resp: HttpResponse[Array[Byte]], what: String): Unit =
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"catalog service rejected $what: HTTP ${resp.statusCode} — ${bodyError(resp)}")

  def commit(dir: String, name: String, bytes: Array[Byte],
      expected: Option[Long]): Unit = {
    val node = mapper.createObjectNode()
      .put("dir", dir).put("name", name)
      .put("doc", Base64.getEncoder.encodeToString(bytes))
    expected.foreach(node.put("expected", _))
    val resp = send(HttpRequest.newBuilder(java.net.URI.create(baseUri + "/v1/commit"))
      .timeout(java.time.Duration.ofSeconds(60))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofByteArray(mapper.writeValueAsBytes(node)))
      .build())
    invalidateGen(dir, name) // the commit moved the gen either way
    if (resp.statusCode() == 409)
      throw new MetaIO.CommitConflictException(dir, name, expected.getOrElse(-1L))
    expectOk(resp, s"commit of $dir/$name")
  }

  def readCurrent(dir: String, name: String): Option[Array[Byte]] = {
    val resp = get("/v1/pointer", "dir" -> dir, "name" -> name)
    if (resp.statusCode() == 404) None
    else {
      expectOk(resp, s"read of $dir/$name")
      Some(Base64.getDecoder.decode(mapper.readTree(resp.body()).get("doc").asText))
    }
  }

  // one /v1/gen response carries gen + legacy + exists; the three
  // accessors often fire together (MV discovery probes existence then
  // loads; the load falls back to legacyGen), so a SHORT advisory cache
  // collapses them to one round trip. Bounded staleness only — the
  // commit path never consults it (CAS verdicts are server-side), own
  // commits invalidate, and the freshness probe's default interval is
  // 10x the TTL.
  private val GenCacheTtlNanos = 100L * 1000 * 1000
  private val genCache = scala.collection.concurrent.TrieMap
    .empty[(String, String), (Long, com.fasterxml.jackson.databind.JsonNode)]

  private[sources] def invalidateGen(dir: String, name: String): Unit = {
    genCache.remove((dir, name))
    ()
  }

  private def genNode(dir: String, name: String) = {
    val now = System.nanoTime()
    genCache.get((dir, name)) match {
      case Some((t, node)) if now - t < GenCacheTtlNanos => node
      case _ =>
        val resp = get("/v1/gen", "dir" -> dir, "name" -> name)
        expectOk(resp, s"gen probe of $dir/$name")
        val node = mapper.readTree(resp.body())
        genCache.put((dir, name), (now, node))
        node
    }
  }

  def currentGen(dir: String, name: String): Long =
    genNode(dir, name).get("gen").asLong

  def legacyGen(dir: String, name: String): Long =
    genNode(dir, name).get("legacy").asLong

  def pointerExists(dir: String, name: String): Boolean =
    genNode(dir, name).get("exists").asBoolean

  def listTables(): Seq[String] = {
    val resp = get("/v1/tables")
    expectOk(resp, "table listing")
    val arr = mapper.readTree(resp.body()).get("tables")
    (0 until arr.size()).map(arr.get(_).asText)
  }
}

object CatalogServer {
  /** Standalone entry: `runMain graft.sources.CatalogServer <warehouse>
    * [port]` — serve one warehouse until killed.
    */
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(MemTables.tablesRoot.getAbsolutePath)
    val port = args.lift(1).map(_.toInt).getOrElse(0)
    val server = new CatalogServer(root, port).start()
    System.err.println(s"graft catalog service on ${server.uri} over $root")
    Thread.currentThread().join()
  }
}
