package graft.etl

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.SparkSession

/** E3 — the reference's REST ingest entry point (mcp_server.py:17-43,
  * openapi.json POST /ingest) as a thin shim over the engine's S6→S14
  * operator chain. Zero new dependencies: the JDK's HttpServer fronting a
  * long-running SparkSession, exactly the "driver service holding a
  * session" shape SURVEY §3 E3 describes.
  *
  * Contract differences from the reference, both deliberate:
  *  - The PDF arrives as the request BODY (the zero-egress engine does not
  *    fetch `pdf_url` itself; the reference's CI flow already POSTs the file
  *    — auto_ingest.yml:24-32). `pdf_url` rides as a query param so the
  *    emitted document's sourceURL matches the reference's.
  *  - Responses mirror mcp_server.py: the document as JSON on success,
  *    `{"error": ...}` as an HTTP-200 row on failure (S16 error-as-row),
  *    and empty pages are KEPT (mcp keeps "" pages; the CLI drops them).
  *
  * Request:  POST /ingest?volume=<name>[&pdf_url=<url>] with the PDF bytes
  *           as body, Content-Type application/pdf (S7 gate).
  * Response: the S14 document record as a JSON object.
  */
final class IngestServer(spark: SparkSession, extractor: PageExtractor,
                         port: Int = 0,
                         statusDir: Option[String] = None,
                         metricsDir: Option[String] = None) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  // Raster-loss visibility counters (VERDICT r13 item 4), cumulative
  // over the server lifetime: the hub metric is a RUNNING total, so a
  // corpus owner sees the aggregate text loss the no-OCR exclusion is
  // costing across uploads — not just the last document's count.
  private val rasterSkippedTotal =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private val rasterSkippedByFilter =
    new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
  // run_id sequence + publication lock (r14 ADVICE): a bare epoch-ms
  // run_id collides when two uploads land in the same millisecond
  // (duplicate run_id rows make MetricsExport.latest ambiguous), and
  // addAndGet/appendRun are not atomic TOGETHER — an interleaving could
  // publish a LOWER cumulative total under a HIGHER run_id, making the
  // hub total appear to regress. The sequence disambiguates ids; the
  // lock makes counter-read + append one atomic publication so run_id
  // order always carries monotone totals.
  // KNOWN LIMIT (review r15, considered and kept): the ms PREFIX means
  // a wall-clock step-back can still order a newer total below an older
  // one until the clock catches up. Leading with the sequence would fix
  // that but break ordering across server RESTARTS (the seq resets per
  // process) and against pre-r15 ids already in a shared metrics dir —
  // the clock is the only cross-restart key available, so the rarer NTP
  // regression is the accepted failure mode.
  private val metricsRunSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val metricsPublishLock = new Object
  // the reference's root + /hub static dashboard (main.py:5-11: a
  // StaticFiles mount over hub/ and a root status line) — served from
  // embedded bytes, with the DATA half (hub/status.json) rendered live
  // from the StatusLog rotation and the MetricsExport feed instead of
  // the reference's committed static JSON
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val path = ex.getRequestURI.getPath
        if (path == "/" || path.isEmpty)
          respond(ex, 200,
            """{"status": "App is live. Visit /hub for dashboard."}""")
        else respondWith(ex, 404, "application/json",
          errorJson(s"not found: $path").getBytes(StandardCharsets.UTF_8))
      } finally ex.close()
  })
  server.createContext("/hub", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        ex.getRequestURI.getPath.stripSuffix("/") match {
          case "/hub" => respondWith(ex, 200, "text/html; charset=utf-8",
            IngestServer.hubIndexHtml.getBytes(StandardCharsets.UTF_8))
          case "/hub/status.json" => respond(ex, 200, statusJson())
          case p => respondWith(ex, 404, "application/json",
            errorJson(s"not found: $p").getBytes(StandardCharsets.UTF_8))
        }
      } catch { case e: Exception =>
        // 500, not the S16 200-with-error-row shape: /ingest's responses
        // are row-shaped and errors ARE rows there, but a dashboard GET
        // must let monitors (and the page's own fetch()) distinguish a
        // healthy empty feed from a broken one by status code (review
        // finding, r12). Same error-JSON body either way.
        respond(ex, 500, errorJson(e.getMessage))
      } finally ex.close()
  })
  server.createContext("/ingest", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try respond(ex, 200, handleIngest(ex))
      catch { case e: Exception =>
        respond(ex, 200, errorJson(e.getMessage)) // mcp_server.py:23-24 shape
      } finally ex.close()
  })
  // the reference publishes a machine-readable contract at /openapi.json
  // (openapi.json: paths./ingest.post + components.schemas.DocumentRequest);
  // serve the analogous document for THIS server's contract — the body/
  // query-param differences documented above are reflected, not copied over
  server.createContext("/openapi.json", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try respond(ex, 200, IngestServer.openApiJson) finally ex.close()
  })
  server.setExecutor(null) // synchronous, one doc per call — E3 semantics

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  private def handleIngest(ex: HttpExchange): String = {
    if (ex.getRequestMethod != "POST") return errorJson("POST only")
    val params = query(ex)
    val volume = params.getOrElse("volume", "volume")
    // resource_type routes the statute path (auto_ingest.yml:27-29 posts
    // statutes/** and *.docx with resource_type=statute): category
    // "Statute" on the record, and the DOCX codec admitted at the gate
    val resourceType = params.getOrElse("resource_type", "cassation_decision")
    if (resourceType != "cassation_decision" && resourceType != "statute")
      return errorJson(s"unknown resource_type: $resourceType")
    val category =
      if (resourceType == "statute") "Statute" else "CassationDecision"
    // S7 Content-Type gate (fetch_legal_docs.py:52-54); statute uploads
    // may be PDF (statutes/** scans) or DOCX (auto_ingest.yml's *.docx)
    val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    val isPdf = ct.contains("application/pdf")
    val isDocx = ct.contains(IngestServer.DocxContentType)
    // legacy binary .doc (r17) rides the same statute admission as DOCX
    // — the old-cassation-volume population is Word 97–2003
    val isDoc = !isDocx && ct.contains(IngestServer.DocContentType)
    if (!isPdf && !((isDocx || isDoc) && resourceType == "statute"))
      return errorJson(s"not a PDF (Content-Type: $ct)")
    // bounded body read (r12 hardening — Fetch.MaxBodyBytes rationale):
    // an unbounded readAllBytes let one oversized upload OOM the driver
    // before the codec ceilings could apply
    val bytes = Fetch.readBounded(ex.getRequestBody, Fetch.MaxBodyBytes) match {
      case Left(err) => return errorJson(err)
      case Right(b) => b
    }
    val defaultExt = if (isDocx) "docx" else if (isDoc) "doc" else "pdf"
    val url = params.getOrElse("pdf_url", s"$volume.$defaultExt")
    // per-REQUEST document password (r15, VERDICT #1): the pdfminer
    // `password=` parity surface — offered user-then-owner to the PDF
    // security handler; absent/empty keeps the silent empty-password
    // open. It scopes to this one upload only. PREFERRED channel is the
    // X-Document-Password header (r15 ADVICE): query strings land in
    // access logs, reverse proxies and request traces, so a document
    // secret in the URL leaks where a header would not; the `password=`
    // query param stays accepted for reference parity.
    // the header value is BY CONTRACT the password's UTF-8 bytes (the
    // openapi row says so; curl sends exactly that). The JDK http
    // server decodes header bytes as ISO-8859-1, so recover the raw
    // bytes and re-decode strictly as UTF-8; bytes that are NOT valid
    // UTF-8 keep the Latin-1 reading as a lenient fallback (a lone
    // 0xE9 "é"). CONSIDERED AND KEPT (review r16): a genuine Latin-1
    // value that also happens to be valid UTF-8 (e.g. the literal
    // two-char password "Ã©", bytes C3 A9) is re-read as "é" — that
    // client violated the documented UTF-8 contract, and the codec
    // seam takes one string, so the contract reading wins over
    // double-trying both. A present-but-EMPTY header still wins over
    // the query param (header-present precedence): it yields "", the
    // documented empty-password open.
    val password =
      Option(ex.getRequestHeaders.getFirst("X-Document-Password"))
        .map { v =>
          val raw = v.getBytes(StandardCharsets.ISO_8859_1)
          try StandardCharsets.UTF_8.newDecoder()
            .decode(java.nio.ByteBuffer.wrap(raw)).toString
          catch { case _: java.nio.charset.CharacterCodingException => v }
        }
        .getOrElse(params.getOrElse("password", ""))
    val codec: PageExtractor =
      (if (isDocx) DocxExtractor
       else if (isDoc) DocExtractor
       else extractor).withPassword(password)

    // Raster-loss visibility (VERDICT r13 item 4): count the streams the
    // codec will SKIP for unsupported filters — on every upload, because
    // a half-scanned volume extracts its text pages and never reaches
    // quarantine, so the loss is otherwise invisible. Cumulative totals
    // land on the metrics feed (→ /hub/status.json) plus a WARN status
    // row naming the document; both BEST-EFFORT (the r12 review rule:
    // an unhealthy observability store must not fail the ingest). The
    // count is a structure re-parse, so it only runs when a sink exists
    // to read it (r14 review — sink-less servers keep zero-cost ingest).
    val skipped =
      if (metricsDir.isEmpty && statusDir.isEmpty) Map.empty[String, Int]
      else codec.skippedStreams(bytes)
    if (skipped.nonEmpty) {
      // one atomic publication (r14 ADVICE): counter bump + feed append
      // under the lock, so a later run_id can never carry an earlier
      // (lower) cumulative total
      metricsPublishLock.synchronized {
        val total = rasterSkippedTotal.addAndGet(skipped.values.sum.toLong)
        val perFilter = skipped.map { case (f, n) =>
          s"pages_skipped_raster:$f" -> rasterSkippedByFilter
            .computeIfAbsent(f,
              _ => new java.util.concurrent.atomic.AtomicLong(0L))
            .addAndGet(n.toLong)
        }
        metricsDir.foreach { d =>
          // zero-padded epoch-ms + process-local sequence: MetricsExport
          // .latest picks max_by(run_id) lexicographically — the newest
          // total wins, and same-millisecond uploads never collide
          try MetricsExport.appendRun(spark, d,
            runId = f"${System.currentTimeMillis()}%013d-${
              metricsRunSeq.incrementAndGet()}%06d",
            metrics = perFilter.toMap + ("pages_skipped_raster" -> total))
          catch { case e: Exception =>
            System.err.println(s"[ingest] metrics append failed: ${e.getMessage}")
          }
        }
      }
      statusDir.foreach { d =>
        try {
          import spark.implicits._
          StatusLog.append(spark, d,
            Seq((new java.sql.Timestamp(System.currentTimeMillis()),
              "WARN", s"$url: ${skipped.values.sum} stream(s) skipped " +
                skipped.keys.toSeq.sorted.mkString("(", "+", ") — raster/unsupported, no OCR")))
              .toDF("ts", "level", "message"))
        } catch { case e: Exception =>
          System.err.println(s"[ingest] status-log append failed: ${e.getMessage}")
        }
      }
    }

    import spark.implicits._
    val binaries = Seq((url, bytes)).toDF("url", "content")
    val out = Pipeline.process(binaries, codec,
      ingestDate = java.time.LocalDate.now.toString,
      keepEmptyPages = true, // mcp_server.py:27-28 keeps empties
      category = org.apache.spark.sql.functions.lit(category))
    // single-row plan; toJSON gives the contract-correct escaping
    out.docs.toJSON.collect().headOption.getOrElse {
      val reason = out.quarantine.select("reason").collect()
        .headOption.map(_.getString(0)).getOrElse("no output")
      // surface the coded reason on the dashboard feed (VERDICT r11
      // item 3): one ERROR row per quarantined upload — rare by
      // construction, so the per-append rotation write is off the
      // happy path. BEST-EFFORT (r12 review): a torn/unwritable status
      // store must not replace the coded reason in the HTTP response —
      // the reason matters most exactly when the feed is unhealthy.
      statusDir.foreach { d =>
        try {
          import spark.implicits._
          StatusLog.append(spark, d,
            Seq((new java.sql.Timestamp(System.currentTimeMillis()),
              "ERROR", s"quarantined $url: $reason"))
              .toDF("ts", "level", "message"))
        } catch { case e: Exception =>
          System.err.println(s"[ingest] status-log append failed: ${e.getMessage}")
        }
      }
      errorJson(reason)
    }
  }

  /** The live dashboard payload: last-50 status rows (newest first — the
    * StatusLog rotation is already bounded) + the latest value per metric
    * from the MetricsExport feed. Both halves are ≤bounded-row collects by
    * construction; absent/empty stores render as empty arrays.
    */
  private def statusJson(): String = {
    def rowsOf(df: org.apache.spark.sql.DataFrame): String =
      df.toJSON.collect().mkString("[", ",", "]")
    val log = statusDir match {
      case Some(d) => rowsOf(StatusLog.read(spark, d))
      case None => "[]"
    }
    val metrics = metricsDir match {
      case Some(d) =>
        try rowsOf(MetricsExport.latest(spark, d))
        catch { case _: Exception => "[]" } // feed not yet written
      case None => "[]"
    }
    s"""{"log": $log, "metrics": $metrics}"""
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap

  private def errorJson(msg: String): String = {
    // minimal JSON string escape for the error channel
    val esc = msg.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"error": "$esc"}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit =
    respondWith(ex, code, "application/json; charset=utf-8",
      body.getBytes(StandardCharsets.UTF_8))

  private def respondWith(ex: HttpExchange, code: Int, contentType: String,
                          b: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
  }
}

object IngestServer {
  /** The /hub static dashboard (reference hub/index.html + app.js shape,
    * reimplemented): one self-contained page that fetches
    * /hub/status.json and renders the run log and latest metrics. No
    * external assets — zero-egress, byte-stable.
    */
  val hubIndexHtml: String =
    """<!doctype html>
      |<html lang="en"><head><meta charset="utf-8">
      |<title>graft ingest hub</title>
      |<style>
      |body{font-family:sans-serif;margin:2em;max-width:60em}
      |h1{font-size:1.4em} h2{font-size:1.1em}
      |table{border-collapse:collapse;width:100%}
      |td,th{border:1px solid #ccc;padding:.3em .6em;text-align:left}
      |.ERROR{color:#b00} .WARN{color:#a60} .INFO{color:#060}
      |</style></head><body>
      |<h1>graft ingest hub</h1>
      |<p id="state">loading…</p>
      |<h2>Latest metrics</h2>
      |<table id="metrics"><tr><th>metric</th><th>value</th></tr></table>
      |<h2>Run log (last 50)</h2>
      |<table id="log"><tr><th>ts</th><th>level</th><th>message</th></tr></table>
      |<script>
      |fetch('/hub/status.json').then(r => r.json()).then(d => {
      |  document.getElementById('state').textContent =
      |    (d.metrics.length || d.log.length) ? 'live' : 'no runs recorded yet';
      |  const mt = document.getElementById('metrics');
      |  d.metrics.forEach(m => {
      |    const tr = mt.insertRow();
      |    tr.insertCell().textContent = m.metric;
      |    tr.insertCell().textContent = m.value;
      |  });
      |  const lt = document.getElementById('log');
      |  d.log.forEach(e => {
      |    const tr = lt.insertRow();
      |    tr.className = e.level;
      |    tr.insertCell().textContent = e.ts;
      |    tr.insertCell().textContent = e.level;
      |    tr.insertCell().textContent = e.message;
      |  });
      |}).catch(e => {
      |  document.getElementById('state').textContent = 'error: ' + e;
      |});
      |</script></body></html>""".stripMargin

  /** The DOCX MIME type admitted at the S7 gate for statute uploads. */
  val DocxContentType: String =
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"

  /** Legacy binary `.doc` MIME type (r17) — same statute-only admission
    * as DOCX; routes to [[DocExtractor]].
    */
  val DocContentType: String = "application/msword"

  /** The served contract, byte-stable (the MetricsExport descriptor
    * discipline): OpenAPI 3.1, one POST /ingest operation taking the PDF
    * bytes as the request body (application/pdf) with `volume` /
    * `pdf_url` as query parameters — the zero-egress divergence from the
    * reference's JSON DocumentRequest body is part of the contract, so
    * the document states OUR shape, with the reference's success (the
    * S14 document record) and error-as-row (`{"error": ...}`) responses.
    */
  val openApiJson: String =
    """{"openapi":"3.1.0",
      |"info":{"title":"graft ingest service","version":"0.1.0"},
      |"paths":{"/ingest":{"post":{
      |"summary":"Ingest one PDF, DOCX or legacy .doc through the S6-S14 operator chain",
      |"operationId":"ingest_post",
      |"parameters":[
      |{"name":"volume","in":"query","required":false,
      | "schema":{"type":"string","default":"volume"}},
      |{"name":"pdf_url","in":"query","required":false,
      | "schema":{"type":"string"},
      | "description":"recorded as the document's sourceURL; defaults to <volume>.<ext>"},
      |{"name":"resource_type","in":"query","required":false,
      | "schema":{"type":"string","enum":["cassation_decision","statute"],
      |  "default":"cassation_decision"},
      | "description":"statute sets category=Statute and admits DOCX and legacy .doc bodies (auto_ingest.yml parity)"},
      |{"name":"X-Document-Password","in":"header","required":false,
      | "schema":{"type":"string"},
      | "description":"document password, PREFERRED channel (headers stay out of access logs and proxy traces): encrypted PDFs try it as user then owner (pdfminer password= parity); encrypted OOXML (agile/standard/RC4-CryptoAPI) decrypts the package; encrypted legacy .doc (RC4/RC4-CryptoAPI) decrypts the streams; absent means the silent empty-password open. Non-ASCII values are read as the password's raw UTF-8 bytes"},
      |{"name":"password","in":"query","required":false,
      | "schema":{"type":"string"},
      | "description":"document password as a query parameter — reference-parity fallback only; prefer the X-Document-Password header, since query strings are routinely captured by access logs. Ignored when the header is present"}],
      |"requestBody":{"required":true,"content":{"application/pdf":{
      | "schema":{"type":"string","format":"binary"}},
      | "application/vnd.openxmlformats-officedocument.wordprocessingml.document":{
      | "schema":{"type":"string","format":"binary"}},
      | "application/msword":{
      | "schema":{"type":"string","format":"binary"}}}},
      |"responses":{"200":{"description":
      | "the S14 document record on success, or {\"error\": ...} as an HTTP-200 row (S16 error containment)",
      | "content":{"application/json":{"schema":{"anyOf":[
      |  {"$ref":"#/components/schemas/Document"},
      |  {"$ref":"#/components/schemas/ErrorRow"}]}}}}}}}},
      |"components":{"schemas":{
      |"Document":{"type":"object","title":"Document",
      | "required":["title","year","sourceURL","dateIngested","category","tags","content","caseFields","legisFields","templateFields"],
      | "properties":{
      |  "title":{"type":"string"},
      |  "year":{"type":"string"},
      |  "sourceURL":{"type":"string"},
      |  "dateIngested":{"type":"string"},
      |  "category":{"type":"string"},
      |  "tags":{"type":"array","items":{"type":"string"}},
      |  "content":{"type":"string"},
      |  "caseFields":{"type":"object","properties":{
      |   "issue":{"type":"string"},"holding":{"type":"string"},"ratio":{"type":"string"}}},
      |  "legisFields":{"type":"object","properties":{
      |   "scope":{"type":"string"},"keyArticles":{"type":"array","items":{"type":"string"}},
      |   "effectiveDate":{"type":"string"}}},
      |  "templateFields":{"type":"object","properties":{
      |   "placeholders":{"type":"array","items":{"type":"string"}}}}}},
      |"ErrorRow":{"type":"object","title":"ErrorRow",
      | "required":["error"],
      | "properties":{"error":{"type":"string"}}}}}}""".stripMargin
      .linesIterator.mkString("")
}
