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
                         port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
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
    if (!isPdf && !(isDocx && resourceType == "statute"))
      return errorJson(s"not a PDF (Content-Type: $ct)")
    val bytes = ex.getRequestBody.readAllBytes()
    val defaultExt = if (isDocx) "docx" else "pdf"
    val url = params.getOrElse("pdf_url", s"$volume.$defaultExt")

    import spark.implicits._
    val binaries = Seq((url, bytes)).toDF("url", "content")
    val out = Pipeline.process(binaries,
      if (isDocx) DocxExtractor else extractor,
      ingestDate = java.time.LocalDate.now.toString,
      keepEmptyPages = true, // mcp_server.py:27-28 keeps empties
      category = category)
    // single-row plan; toJSON gives the contract-correct escaping
    out.docs.toJSON.collect().headOption.getOrElse {
      val reason = out.quarantine.select("reason").collect()
        .headOption.map(_.getString(0)).getOrElse("no output")
      errorJson(reason)
    }
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

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, b.length.toLong)
    ex.getResponseBody.write(b)
  }
}

object IngestServer {
  /** The DOCX MIME type admitted at the S7 gate for statute uploads. */
  val DocxContentType: String =
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document"

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
      |"summary":"Ingest one PDF or DOCX through the S6-S14 operator chain",
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
      | "description":"statute sets category=Statute and admits DOCX bodies (auto_ingest.yml parity)"}],
      |"requestBody":{"required":true,"content":{"application/pdf":{
      | "schema":{"type":"string","format":"binary"}},
      | "application/vnd.openxmlformats-officedocument.wordprocessingml.document":{
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
