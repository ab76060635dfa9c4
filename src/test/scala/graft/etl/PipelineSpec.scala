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

  test("raster-loss visibility: mixed text/raster docs report skipped streams while flowing the GOOD channel (VERDICT r13 #4)") {
    // the S9 hole this metric closes: a half-scanned volume extracts its
    // text pages, passes the S11 gate, and never reaches quarantine — so
    // without this count the OCR-exclusion loss is invisible to ops.
    def pdf(objs: String*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream
      def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
      w("%PDF-1.4\n"); objs.foreach(w); w("%%EOF\n")
      out.toByteArray
    }
    def streamObj(num: Int, dict: String, data: Array[Byte]): String =
      s"$num 0 obj\n<< /Length ${data.length} $dict >>\nstream\n" +
        new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
      val buf = new Array[Byte](4096); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val scan = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      "scan".getBytes(StandardCharsets.ISO_8859_1)
    val halfScanned = pdf(
      streamObj(1, "/Filter /FlateDecode", deflate("BT (typed half) Tj ET")),
      streamObj(2, "/Filter /DCTDecode", scan),
      streamObj(3, "/Filter /DCTDecode", scan))
    val allText = pdf(
      streamObj(1, "/Filter /FlateDecode", deflate("BT (all typed) Tj ET")))
    // codec-level counts: per unsupported filter, good docs included
    assert(FlatePdfExtractor.skippedStreams(halfScanned) ===
      Map("DCTDecode" -> 2))
    assert(FlatePdfExtractor.skippedStreams(allText) === Map.empty)
    assert(FlatePdfExtractor.skippedStreams("junk".getBytes) === Map.empty)
    // pipeline channel: (url, filter, n_streams) rows for lossy docs only
    val bins = Seq(
      ("https://x/half%20scanned.pdf", halfScanned),
      ("https://x/typed.pdf", allText)).toDF("url", "content")
    val loss = Pipeline.rasterLoss(bins, FlatePdfExtractor).collect()
      .map(r => (r.getAs[String]("url"), r.getAs[String]("filter"),
        r.getAs[Int]("n_streams"))).toSeq
    assert(loss === Seq(("https://x/half%20scanned.pdf", "DCTDecode", 2)),
      loss)
    // and BOTH docs still flow the good channel — the loss channel is
    // additive, never a new failure mode
    val out = Pipeline.process(bins, FlatePdfExtractor, "2026-08-16")
    assert(out.quarantine.count() === 0)
    assert(out.docs.collect().map(_.getAs[String]("content")).sorted.toSeq ===
      Seq("all typed", "typed half"))
  }

  test("empty-user-password encrypted PDF flows the GOOD channel end-to-end (r13)") {
    // the owner-locked shape every viewer opens silently: through the
    // full pipeline it must land as a DOCUMENT, not in quarantine —
    // the PdfDecryptSpec covers the handler; this pins the S9→S16 wiring.
    // Writer side inline (R3 RC4-128, the PdfDecryptSpec transcription).
    val pad = Array(0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
      0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
      0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)
    def md5(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("MD5")
      parts.foreach(d.update); d.digest()
    }
    def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] =
      PdfDecrypt.rc4(key, data)
    def le(v: Long, n: Int) =
      Array.tabulate(n)(i => ((v >>> (8 * i)) & 0xff).toByte)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    val id0 = (1 to 16).map(_.toByte).toArray
    val kl = 16
    var ok = md5(("owner-x".getBytes(StandardCharsets.ISO_8859_1) ++ pad).take(32))
    for (_ <- 0 until 50) ok = md5(ok.take(kl))
    var o = rc4(ok.take(kl), pad) // empty user password → padded = pad
    for (i <- 1 to 19) o = rc4(ok.take(kl).map(b => (b ^ i).toByte), o)
    var fk = md5(pad, o, le(-3904L & 0xffffffffL, 4), id0)
    for (_ <- 0 until 50) fk = md5(fk.take(kl))
    fk = fk.take(kl)
    var u = rc4(fk, md5(pad, id0))
    for (i <- 1 to 19) u = rc4(fk.map(b => (b ^ i).toByte), u)
    val uv = u.take(16) ++ new Array[Byte](16)
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput("BT (Art 5: tax applies) Tj ET"
        .getBytes(StandardCharsets.ISO_8859_1)); d.finish()
      val buf = new Array[Byte](4096); val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val objKey = md5(fk, le(2L, 3), le(0L, 2)).take(16)
    val enc = rc4(objKey, defl)
    val out2 = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out2.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w(s"1 0 obj\n<< /Filter /Standard /V 2 /R 3 /Length 128 /P -3904 " +
      s"/O <${hex(o)}> /U <${hex(uv)}> >>\nendobj\n")
    w(s"2 0 obj\n<< /Length ${enc.length} /Filter /FlateDecode >>\nstream\n")
    out2.write(enc)
    w("\nendstream\nendobj\n")
    w(s"trailer << /Encrypt 1 0 R /ID [ <${hex(id0)}> <${hex(id0)}> ] >>\n%%EOF\n")
    val lockedOpenable = out2.toByteArray
    val bins = Seq(("https://x/owner%20locked.pdf", lockedOpenable))
      .toDF("url", "content")
    val res = Pipeline.process(bins, FlatePdfExtractor, "2026-08-16")
    assert(res.quarantine.count() === 0)
    val docs = res.docs.collect()
    assert(docs.length === 1 &&
      docs(0).getAs[String]("content") === "Art 5: tax applies", docs.toSeq)
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

  test("legacy binary .doc flows the pipeline per-row next to PDF/DOCX; encrypted .doc quarantines with reason (r17)") {
    // the old-cassation-volume population (Word 97–2003): a .doc row in
    // the same staged frame as the other formats extracts through the
    // sniffing router, and an ENCRYPTED .doc lands in quarantine with
    // the actionable `encrypted` reason — no password channel on the
    // batch path, mirroring the encrypted-OOXML row's behavior
    val am = "የሰበር ውሳኔ ቅጽ 3 1995\r"
    val legacy = DocFixtures.doc(Seq(("Cassation decision, decided 1995\r", true), (am, false)))
    val sealed0 = DocFixtures.rc4Doc("በር", Seq(("hidden\r", true)))
    val bins = Seq(
      ("https://x/vol03.doc", legacy),
      ("https://x/locked.doc", sealed0)).toDF("url", "content")
    val out = Pipeline.process(bins, SniffingExtractor(), "2026-08-16")
    val doc = out.docs.head()
    assert(doc.getAs[String]("title") === "vol03")
    assert(doc.getAs[String]("content")
      === "Cassation decision, decided 1995\n" + am.stripSuffix("\r"))
    assert(doc.getAs[String]("year") === "1995")
    val q = out.quarantine.collect()
    assert(q.length === 1 && q.head.getAs[String]("url").contains("locked"))
    assert(q.head.getAs[String]("reason") === "encrypted")
    // a passworded sniffing router opens the same staged row
    val keyed = Pipeline.process(
      Seq(("https://x/locked.doc", sealed0)).toDF("url", "content"),
      SniffingExtractor().withPassword("በር"), "2026-08-16")
    assert(keyed.docs.head().getAs[String]("content") === "hidden")
  }
}
