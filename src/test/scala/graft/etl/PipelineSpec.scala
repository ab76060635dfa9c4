package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.Files

/** End-to-end ETL pipeline tests (SURVEY §3 E1/E2): incremental anti-join,
  * quarantine channel, ordered reassembly through a real (fake-codec)
  * binary → document run, JSON round-trip under the fixed schema, and the
  * non-ASCII (Amharic) byte-level contract.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def binDf(rows: (String, String)*) =
    rows.toDF("url", "raw")
      .select($"url", $"raw".cast("binary").as("content"))

  test("S5 — incremental anti-join skips processed base names") {
    val links = Seq("https://x/Vol%2001.pdf", "https://x/Vol%2002.pdf",
                    "https://x/Vol%2003.pdf").toDF("url")
    val processed = Seq("Vol_01", "Vol_03").toDF("base_name")
    val todo = Pipeline.incremental(links, processed)
      .select("url").as[String].collect()
    assert(todo === Array("https://x/Vol%2002.pdf"))
  }

  test("E1 — binaries → documents with quarantine (S9-S16)") {
    val bins = binDf(
      "https://x/good%20doc.pdf" -> "Decided 1998 page one\f\fpage three",
      "https://x/empty.pdf" -> "\f  \f\t")
    val out = Pipeline.process(bins, FormFeedExtractor, "2026-08-12")
    val docs = out.docs.collect()
    assert(docs.length === 1)
    val doc = docs.head
    assert(doc.getAs[String]("title") === "good doc")
    assert(doc.getAs[String]("year") === "1998")
    // CLI semantics: empty middle page dropped, not joined as ""
    assert(doc.getAs[String]("content") === "Decided 1998 page one\npage three")
    val quarantined = out.quarantine.collect()
    assert(quarantined.length === 1)
    assert(quarantined.head.getAs[String]("url") === "https://x/empty.pdf")
  }

  test("S16 — compensating delete removes staged binaries exactly once (replay-safe)") {
    // reference: import requests.py:84 deletes the PDF whose text came back
    // empty. The utility must remove each quarantined row's staged file and
    // be a no-op on replay (streaming recovery re-runs foreachBatch).
    val stage = Files.createTempDirectory("graft_stage")
    val bad = stage.resolve("bad.pdf"); Files.write(bad, "\f \f".getBytes)
    val good = stage.resolve("good.pdf"); Files.write(good, "some text".getBytes)
    val bins = binDf(
      bad.toUri.toString -> "\f \f",
      good.toUri.toString -> "some text")
    val out = Pipeline.process(bins, FormFeedExtractor, "2026-08-12")
    val q = out.quarantine.withColumn("path", col("url"))
    assert(q.count() === 1)
    Pipeline.compensatingDeleteBatch("path")(q, batchId = 0L)
    assert(!Files.exists(bad) && Files.exists(good))
    // replayed batch: already-deleted file is a no-op, not a failure
    Pipeline.compensatingDeleteBatch("path")(q, batchId = 0L)
    assert(!Files.exists(bad) && Files.exists(good))
  }

  test("E3 variant — keepEmptyPages preserves \"\" pages (mcp_server.py:27-28)") {
    val bins = binDf("https://x/d.pdf" -> "a\f\fb")
    val out = Pipeline.process(bins, FormFeedExtractor, "2026-08-12",
                               keepEmptyPages = true)
    assert(out.docs.select("content").as[String].head() === "a\n\nb")
  }

  test("S15 — JSON round-trip: fixed schema, UTF-8 Amharic preserved") {
    val dir = Files.createTempDirectory("graft_docs").toString
    val amharic = "የፌደራል ጠቅላይ ፍርድ ቤት ሰበር ውሳኔ 1998"
    val bins = binDf("https://x/Amharic%20Vol.pdf" -> amharic)
    val out = Pipeline.process(bins, FormFeedExtractor, "2026-08-12")
    Pipeline.writeDocs(out.docs, dir)
    val back = Pipeline.readDocs(spark, dir)
    assert(back.schema === graft.Tables.legalDocSchema)
    assert(back.select("content").as[String].head() === amharic)
    // byte-level: the json on disk must carry raw UTF-8 (ensure_ascii=False
    // contract, fetch_legal_docs.py:89), not \u escapes
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".json"))
    val rawText = files.map(f => new String(Files.readAllBytes(f.toPath),
      StandardCharsets.UTF_8)).mkString
    assert(rawText.contains("የፌደራል"))
  }

  test("file-per-doc sink writes one json file per title") {
    val dir = Files.createTempDirectory("graft_perdoc").toString
    val bins = binDf(
      "https://x/A.pdf" -> "alpha 1998",
      "https://x/B.pdf" -> "beta 1999",
      "https://x/C.pdf" -> "gamma 2000")
    val out = Pipeline.process(bins, FormFeedExtractor, "2026-08-12")
    Pipeline.writeDocs(out.docs, dir, filePerDoc = true)
    val back = Pipeline.readDocs(spark, dir)
    assert(back.count() === 3)
  }

  test("RawPdfExtractor — uncompressed-stream fixture + garbage input") {
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nstream\n" +
      "BT (Hello) Tj (World) Tj ET\nendstream\nendobj\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(RawPdfExtractor.extractPages(pdf) === Seq("Hello World"))
    assert(RawPdfExtractor.extractPages("not a pdf".getBytes) === Nil)
    assert(RawPdfExtractor.extractPages(Array[Byte](0, 1, 2)) === Nil)
  }

  test("reference fixture PDFs parse without error (parser-gated, SURVEY §7.4)") {
    val vol01 = Files.readAllBytes(java.nio.file.Paths.get("/root/reference/vol01.pdf"))
    // vol01 uses compressed streams — the raw extractor must degrade to
    // empty, never throw; the S16 channel handles it downstream.
    val pages = RawPdfExtractor.extractPages(vol01)
    assert(pages != null)
  }

  test("FlatePdfExtractor — real Amharic text from the reference volumes") {
    val vol01 = Files.readAllBytes(java.nio.file.Paths.get("/root/reference/vol01.pdf"))
    val pages = FlatePdfExtractor.extractPages(vol01)
    assert(pages.nonEmpty, "no pages extracted from vol01.pdf")
    val text = pages.mkString("\n")
    // Ethiopic block U+1200–U+137F — the actual cassation-decision script
    assert(text.exists(c => c >= 'ሀ' && c <= '፿'),
      s"no Ethiopic characters decoded; got: ${text.take(120)}")
    val vol02 = Files.readAllBytes(java.nio.file.Paths.get("/root/reference/vol02.pdf"))
    assert(FlatePdfExtractor.extractPages(vol02).nonEmpty)
    // garbage stays containable
    assert(FlatePdfExtractor.extractPages("junk".getBytes) === Nil)
    assert(FlatePdfExtractor.extractPages(Array[Byte](1, 2, 3)) === Nil)
  }

  test("unsupported filters (DCT/encrypted) degrade to quarantine, never throw (VERDICT r10 #4)") {
    // Fixture builders mirroring the lzwPdf shape. DCT = a raster-only
    // stream (needs OCR — declared out of scope); "encrypted" = /Encrypt
    // in the trailer with stream bytes that are ciphertext to the
    // declared Flate filter.
    def pdf(objs: String*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
      w("%PDF-1.4\n"); objs.foreach(w); w("%%EOF\n")
      out.toByteArray
    }
    val fakeJpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte,
      0xE0.toByte) ++ "not really scan data".getBytes(StandardCharsets.ISO_8859_1)
    def streamObj(num: Int, dict: String, data: Array[Byte]): String =
      s"$num 0 obj\n<< /Length ${data.length} $dict >>\nstream\n" +
        new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
      val buf = new Array[Byte](4096); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    // 1) raster-only document: every stream is DCTDecode → Nil, no throw
    val dctOnly = pdf(streamObj(1, "/Filter /DCTDecode", fakeJpeg),
      "2 0 obj\n<< /Type /Page /Contents 1 0 R >>\nendobj\n")
    assert(FlatePdfExtractor.extractPages(dctOnly) === Nil)
    // 2) encrypted document: declared Flate, ciphertext bytes, /Encrypt
    //    trailer → Nil, no throw
    val cipher = Array.tabulate[Byte](64)(i => ((i * 37 + 11) % 251).toByte)
    val encrypted = pdf(streamObj(1, "/Filter /FlateDecode", cipher),
      "2 0 obj\n<< /Type /Page /Contents 1 0 R >>\nendobj\n",
      "trailer\n<< /Encrypt 9 0 R /Root 2 0 R >>\n")
    assert(FlatePdfExtractor.extractPages(encrypted) === Nil)
    // 3) per-page tolerance (pdfplumber's `if p.extract_text()` rule,
    //    fetch_legal_docs.py:62-63): a mixed doc keeps its text pages
    //    while the raster page is skipped — not all-or-nothing
    val textStream = deflate("BT /F1 12 Tf (salvaged text) Tj ET")
    val mixed = pdf(
      streamObj(1, "/Filter /FlateDecode", textStream),
      streamObj(2, "/Filter /DCTDecode", fakeJpeg),
      "3 0 obj\n<< /Type /Page /Contents 1 0 R >>\nendobj\n")
    assert(FlatePdfExtractor.extractPages(mixed) === Seq("salvaged text"))
    // 4) the S16 channel: through the full pipeline, undecodable docs land
    //    in quarantine WITH a DISTINCT coded reason per failure class
    //    (VERDICT r11 item 3); the mixed doc survives as a doc
    val bins = Seq(
      ("https://x/scanned%20vol.pdf", dctOnly),
      ("https://x/locked%20vol.pdf", encrypted),
      ("https://x/mixed%20vol.pdf", mixed)).toDF("url", "content")
    val out = Pipeline.process(bins, FlatePdfExtractor, "2026-08-15")
    val q = out.quarantine.collect().map(r =>
      (r.getAs[String]("url"), r.getAs[String]("reason"))).sorted
    assert(q.toSeq === Seq(
      ("https://x/locked%20vol.pdf", "encrypted"),
      ("https://x/scanned%20vol.pdf", "unsupported-filter:DCTDecode")),
      q.toSeq)
    val docs = out.docs.collect()
    assert(docs.length === 1 &&
      docs(0).getAs[String]("content") === "salvaged text")
  }

  test("SniffingExtractor — mixed PDF+DOCX corpus routes per row by magic bytes (r11)") {
    // the auto_ingest.yml sweep shape: one staged-binary frame holding a
    // real reference PDF, the checked-in statute DOCX, and garbage — one
    // process() pass extracts both formats and quarantines the garbage
    val vol01 = Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/vol01.pdf"))
    val docx = Files.readAllBytes(java.nio.file.Paths.get(
      "src/test/resources/fixtures/minimal_statute.docx"))
    val bins = Seq(
      ("https://x/vol01.pdf", vol01),
      ("https://x/Proc%201-2016.docx", docx),
      ("https://x/junk.bin", "not a document".getBytes("UTF-8")))
      .toDF("url", "content")
    // per-row categorization (review finding r11): the auto_ingest name
    // rule routes vol* to CassationDecision and everything else to
    // Statute — in the SAME pass as the per-row format sniffing
    val out = Pipeline.process(bins, SniffingExtractor(), "2026-08-15",
      category = DocOps.autoCategory(col("url")))
    val docs = out.docs.collect().map(r =>
      r.getAs[String]("title") ->
        (r.getAs[String]("content"), r.getAs[String]("category"),
          r.getAs[Seq[String]]("tags"))).toMap
    assert(docs.keySet === Set("vol01", "Proc 1-2016"))
    assert(docs("vol01")._1.exists(c => c >= 'ሀ' && c <= '፿'))
    assert(docs("vol01")._2 === "CassationDecision")
    assert(docs("Proc 1-2016")._1.contains("Article 2: scope <broad>"))
    assert(docs("Proc 1-2016")._2 === "Statute")
    assert(docs("Proc 1-2016")._3 === Seq("Statute"))
    val q = out.quarantine.collect().map(r =>
      (r.getAs[String]("url"), r.getAs[String]("reason")))
    assert(q.toSeq === Seq(("https://x/junk.bin", "not-pdf-or-docx")))
    // plan shape (r12 review): the diagnosis attaches via a BROADCAST
    // semi-join of the tiny quarantined-url set, so the corpus-sized
    // binary content column is streamed map-side, never shuffled — the
    // old urls-left join exchanged every document's raw bytes per
    // consuming action, including every streaming micro-batch
    val qPlan = out.quarantine.queryExecution.executedPlan.toString
    val qSemi = qPlan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(qSemi.nonEmpty && qSemi.forall(_.contains("BroadcastHashJoin")),
      s"quarantine diagnosis must broadcast-semi-join, got:\n$qPlan")
    // a NULL url must still surface in quarantine (null-normalized semi
    // key, r12 review round 2: a plain equi semi-join made it vanish
    // from both channels)
    val withNull = Pipeline.process(
      Seq((null: String, "not a document".getBytes("UTF-8")))
        .toDF("url", "content"),
      SniffingExtractor(), "2026-08-15")
    val nq = withNull.quarantine.collect()
    assert(nq.length === 1 && nq.head.isNullAt(0) &&
      nq.head.getString(1) === "not-pdf-or-docx", nq.toSeq)
    // the systemic-failure lever: broadcastQuarantine = false plans a
    // shuffled semi-join (no driver-side collect of a corpus-sized set)
    val shuffled = Pipeline.process(bins, SniffingExtractor(), "2026-08-15",
      broadcastQuarantine = false)
    // the reassembly subtree legitimately broadcasts (LeftOuter); only
    // the SEMI join node itself must not
    val sPlan = shuffled.quarantine.queryExecution.executedPlan.toString
    val semiLines = sPlan.linesIterator.filter(_.contains("LeftSemi")).toSeq
    assert(semiLines.nonEmpty && semiLines.forall(!_.contains("Broadcast")),
      s"fallback semi-join must not broadcast, got:\n$sPlan")
    assert(shuffled.quarantine.collect().map(_.getString(1)).toSeq ===
      Seq("not-pdf-or-docx"))
    // a zip that is not an OPC word document gets its own reason class
    val zipNoDoc = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
      z.write("hi".getBytes("UTF-8")); z.closeEntry(); z.close()
      bos.toByteArray
    }
    val out3 = Pipeline.process(
      Seq(("https://x/archive.docx", zipNoDoc)).toDF("url", "content"),
      SniffingExtractor(), "2026-08-15")
    assert(out3.quarantine.collect().map(r =>
      (r.getAs[String]("url"), r.getAs[String]("reason"))).toSeq ===
      Seq(("https://x/archive.docx", "docx-missing-document-xml")))
    // content-based, not name-based: a DOCX lying behind a .pdf name
    // still extracts (the magic bytes win)
    val lying = Seq(("https://x/mislabeled.pdf", docx)).toDF("url", "content")
    val out2 = Pipeline.process(lying, SniffingExtractor(), "2026-08-15")
    assert(out2.docs.head().getAs[String]("content")
      .contains("Federal Statute"))
  }

  test("E1 with FlatePdfExtractor — full pipeline over a real reference PDF") {
    import org.apache.spark.sql.functions._
    val vol01 = Files.readAllBytes(java.nio.file.Paths.get("/root/reference/vol01.pdf"))
    val bins = Seq(("https://x/Cassation%20Vol%2001.pdf", vol01))
      .toDF("url", "content")
    val out = Pipeline.process(bins, FlatePdfExtractor, "2026-08-12")
    val doc = out.docs.head()
    assert(doc.getAs[String]("title") === "Cassation Vol 01")
    assert(doc.getAs[String]("content").exists(c => c >= 'ሀ' && c <= '፿'))
    assert(out.quarantine.count() === 0)
  }
}
