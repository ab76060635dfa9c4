package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Decoder-side pins for the DOCX codec (the FlatePdfLzwSpec discipline
  * applied to the statute path): break-variant handling, blank-page
  * semantics, entity unescaping, and the network-facing containment
  * ceilings — all through the same `extractPages` path the pipeline and
  * the ingest server use.
  */
class DocxExtractorSpec extends AnyFunSuite {

  /** Minimal OPC container around a given word/document.xml body. */
  private def docx(bodyXml: String, footnotesXml: Option[String] = None): Array[Byte] = {
    val xml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"<w:body>$bodyXml</w:body></w:document>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: Array[Byte]): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content); z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>"""
        .getBytes(StandardCharsets.UTF_8))
    entry("word/document.xml", xml.getBytes(StandardCharsets.UTF_8))
    footnotesXml.foreach { fx =>
      entry("word/footnotes.xml",
        ("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<w:footnotes xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
          fx + "</w:footnotes>").getBytes(StandardCharsets.UTF_8))
    }
    z.close()
    bos.toByteArray
  }
  private def p(runs: String): String = s"<w:p><w:r>$runs</w:r></w:p>"

  test("attributed non-page breaks and <w:cr/> render as line breaks, never fuse runs") {
    // review finding r11: <w:br w:type="textWrapping"/> matched no token
    // class and silently fused 'ends here' with 'Article 3'
    val pages = DocxExtractor.extractPages(docx(p(
      """<w:t>ends here</w:t><w:br w:type="textWrapping"/><w:t>Article 3</w:t>""" +
        """<w:br w:clear="all"/><w:t>after clear</w:t>""" +
        """<w:cr/><w:t>after cr</w:t>""")))
    assert(pages === Seq("ends here\nArticle 3\nafter clear\nafter cr"),
      pages)
  }

  test("blank interior pages survive as \"\" (keepEmptyPages parity); trailing break adds none") {
    // text <pb> <pb> text: the intentionally blank middle page must be
    // kept as "" — the mcp keep-empty-pages contract the PDF path honors
    val pages = DocxExtractor.extractPages(docx(p(
      """<w:t>first</w:t><w:br w:type="page"/>""" + // ends page 1
        """<w:br w:type="page"/>""" + // blank page 2
        """<w:t>third</w:t>""")))
    assert(pages === Seq("first", "", "third"), pages)
    // and the page-count surface: 3 pages, blank middle joins as blank
    assert(pages.mkString("\n") === "first\n\nthird")
    // a trailing break creates no page (Word renders none)
    assert(DocxExtractor.extractPages(docx(p(
      """<w:t>x</w:t><w:br w:type="page"/>"""))) === Seq("x"))
  }

  test("Word's double page-break markers produce ONE boundary, no phantom blank page (r11 review)") {
    // a Word-saved manual break carries BOTH the explicit break and the
    // next paragraph's lastRenderedPageBreak render marker
    val pages = DocxExtractor.extractPages(docx(
      p("""<w:t>text1</w:t><w:br w:type="page"/>""") +
        p("""<w:lastRenderedPageBreak/><w:t>text2</w:t>""")))
    assert(pages === Seq("text1", "text2"), pages)
    // the render marker alone still splits REAL page content (a
    // Word-paginated doc with no manual breaks)
    val rendered = DocxExtractor.extractPages(docx(
      p("<w:t>page one flows</w:t>") +
        p("""<w:lastRenderedPageBreak/><w:t>page two flows</w:t>""")))
    assert(rendered === Seq("page one flows", "page two flows"), rendered)
  }

  test("all-blank documents return Nil (quarantine contract)") {
    assert(DocxExtractor.extractPages(docx(p("<w:t>  </w:t>"))) === Nil)
    assert(DocxExtractor.extractPages(
      docx(p("""<w:br w:type="page"/>"""))) === Nil)
    assert(DocxExtractor.extractPages(docx("")) === Nil)
  }

  test("table cell text extracts (cells hold ordinary paragraphs); header entries are out of scope") {
    // WordprocessingML tables wrap ordinary <w:p> paragraphs in
    // <w:tbl>/<w:tr>/<w:tc> containers the walk does not key on — cell
    // text must surface, one line per cell paragraph
    val pages = DocxExtractor.extractPages(docx(
      p("<w:t>before table</w:t>") +
        "<w:tbl><w:tr>" +
        "<w:tc>" + p("<w:t>cell A1</w:t>") + "</w:tc>" +
        "<w:tc>" + p("<w:t>cell B1</w:t>") + "</w:tc>" +
        "</w:tr></w:tbl>" +
        p("<w:t>after table</w:t>")))
    assert(pages === Seq("before table\ncell A1\ncell B1\nafter table"),
      pages)
  }

  test("entity unescaping: named, decimal, hex, astral") {
    val pages = DocxExtractor.extractPages(docx(p(
      "<w:t>&amp;&lt;&gt;&quot;&apos; &#65; &#x1218; &#x1F600;</w:t>")))
    assert(pages === Seq("&<>\"' A መ 😀"), pages)
  }

  test("unescape inverts XML escaping on random text (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // the writer side of the property: escape exactly what
    // WordprocessingML escapes in <w:t> content
    def escape(s: String): String = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case '\'' => "&apos;"
      case c => c.toString
    }
    val genText = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf('&', '<', '>', '"', '\'', ' ', '$', '\\')
        .map(_.toString),
      1 -> Gen.choose('ሀ', '፿').map(_.toString), // Ethiopic block
      1 -> Gen.oneOf("😀", "𝕏"))).map(_.mkString) // astral (surrogate pairs)
    val prop = Prop.forAll(genText) { s =>
      DocxExtractor.unescape(escape(s)) == s
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(11L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
    // and a full extractPages round trip through a real zip container
    val tricky = "a&b<c>d\"e'f $1 \\x መ"
    val pages = DocxExtractor.extractPages(docx(p(
      s"<w:t>${escape(tricky)}</w:t>")))
    assert(pages === Seq(tricky), pages)
  }

  test("deflate bomb caps at MaxDocumentXmlBytes and degrades to Nil, not OOM") {
    // a ~70 MB-of-spaces document.xml compresses to ~70 KB; the read loop
    // must stop at the ceiling and return Nil (→ S16 quarantine), never
    // allocate unbounded
    val huge = "<w:body><w:p><w:r><w:t>" +
      (" " * (DocxExtractor.MaxDocumentXmlBytes + (1 << 20))) +
      "</w:t></w:r></w:p></w:body>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(huge.getBytes(StandardCharsets.UTF_8)); z.closeEntry(); z.close()
    val bomb = bos.toByteArray
    assert(bomb.length < (1 << 21), s"fixture should be small: ${bomb.length}")
    assert(DocxExtractor.extractPages(bomb) === Nil)
  }

  test("footnote opt-in: off by default, appended to the last page when on (VERDICT r11 #7)") {
    // a statute whose citation lives in a footnote — separator (-1) and
    // continuation (0) stubs carry w:type and must be skipped; content
    // footnotes (2, 3) extract in document order
    val fixture = docx(
      p("""<w:t>Article 9: tax applies.</w:t>""") +
        p("""<w:t>Body page 2</w:t>"""), // second paragraph, same page
      footnotesXml = Some(
        """<w:footnote w:type="separator" w:id="-1"><w:p><w:r><w:t>SEP</w:t></w:r></w:p></w:footnote>""" +
          """<w:footnote w:type="continuationSeparator" w:id="0"><w:p><w:r><w:t>CONT</w:t></w:r></w:p></w:footnote>""" +
          """<w:footnote w:id="2"><w:p><w:r><w:t>See Proc. No. 12/1995, Art. 4.</w:t></w:r></w:p></w:footnote>""" +
          """<w:footnote w:id="3"><w:p><w:r><w:t>Fed. Neg. Gaz. &amp; annex.</w:t></w:r></w:p></w:footnote>"""))
    // default contract unchanged: body only, no footnote text anywhere
    val off = DocxExtractor.extractPages(fixture)
    assert(off === Seq("Article 9: tax applies.\nBody page 2"), off)
    // flag on (via the pluggable wire-in): content footnotes appended to
    // the LAST page in order; separator stubs absent
    val on = DocxWithFootnotesExtractor.extractPages(fixture)
    assert(on === Seq("Article 9: tax applies.\nBody page 2\n" +
      "See Proc. No. 12/1995, Art. 4.\nFed. Neg. Gaz. & annex."), on)
    assert(!on.mkString.contains("SEP") && !on.mkString.contains("CONT"))
    // a document with no footnotes part is identical under both contracts
    val plain = docx(p("""<w:t>no notes</w:t>"""))
    assert(DocxWithFootnotesExtractor.extractPages(plain) ===
      DocxExtractor.extractPages(plain))
    // multi-page body: notes land on the LAST page only
    val paged = docx(
      p("""<w:t>p1</w:t><w:br w:type="page"/><w:t>p2</w:t>"""),
      footnotesXml = Some(
        """<w:footnote w:id="2"><w:p><w:r><w:t>note</w:t></w:r></w:p></w:footnote>"""))
    assert(DocxWithFootnotesExtractor.extractPages(paged) ===
      Seq("p1", "p2\nnote"))
    // the EXPLICIT default w:type="normal" (python-docx/LibreOffice-style
    // output) is CONTENT, not chrome — only separator/continuation types
    // skip (r12 review: a blanket any-w:type rule dropped citations)
    val explicitNormal = docx(
      p("""<w:t>body</w:t>"""),
      footnotesXml = Some(
        """<w:footnote w:type="normal" w:id="2"><w:p><w:r><w:t>See Proc. 12/1995</w:t></w:r></w:p></w:footnote>""" +
          """<w:footnote w:type="continuationNotice" w:id="3"><w:p><w:r><w:t>CONT2</w:t></w:r></w:p></w:footnote>"""))
    assert(DocxWithFootnotesExtractor.extractPages(explicitNormal) ===
      Seq("body\nSee Proc. 12/1995"))
    // a blank body with real footnotes emits the notes as ONE page
    // instead of quarantining extractable text (r12 review) — body-only
    // default still quarantines it
    val notesOnly = docx(
      p("""<w:t> </w:t>"""),
      footnotesXml = Some(
        """<w:footnote w:id="2"><w:p><w:r><w:t>only the note</w:t></w:r></w:p></w:footnote>"""))
    assert(DocxWithFootnotesExtractor.extractPages(notesOnly) ===
      Seq("only the note"))
    assert(DocxExtractor.extractPages(notesOnly) === Nil)
  }

  test("header opt-in: off by default, distinct headers prepend to the FIRST page (r12, the 'optionally headers' clause)") {
    // Word writes one headerN.xml per variant (default/even/first) —
    // often identical; duplicates must collapse and blanks drop. Order
    // is numeric part order.
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    def wdoc(inner: String) =
      """<w:document xmlns:w="x"><w:body>""" + inner + "</w:body></w:document>"
    def whdr(inner: String) =
      """<w:hdr xmlns:w="x">""" + inner + "</w:hdr>"
    entry("[Content_Types].xml", "<Types/>")
    entry("word/document.xml",
      wdoc("""<w:p><w:r><w:t>p1</w:t><w:br w:type="page"/><w:t>p2</w:t></w:r></w:p>"""))
    // written in REVERSED part order with DISTINCT texts so the numeric
    // sort is actually pinned (r12 review round 4: identical texts let a
    // lexicographic or unsorted regression pass via distinct); header10
    // pins numeric-vs-lexicographic (10 after 2, not between 1 and 2);
    // header4 duplicates header2's text (collapses); header3 is blank
    entry("word/header10.xml", whdr("<w:p><w:r><w:t>C-LAST</w:t></w:r></w:p>"))
    entry("word/header4.xml", whdr("<w:p><w:r><w:t>B-GAZETTE</w:t></w:r></w:p>"))
    entry("word/header2.xml", whdr("<w:p><w:r><w:t>B-GAZETTE</w:t></w:r></w:p>"))
    entry("word/header3.xml", whdr("<w:p><w:r><w:t> </w:t></w:r></w:p>")) // blank: drops
    entry("word/header1.xml", whdr("<w:p><w:r><w:t>A-FIRST</w:t></w:r></w:p>"))
    // an 11-digit part number must be IGNORED, not crash extraction to
    // Nil via toInt overflow (attacker-controlled entry names)
    entry("word/header99999999999.xml", whdr("<w:p><w:r><w:t>OVERFLOW</w:t></w:r></w:p>"))
    entry("word/footnotes.xml",
      """<w:footnotes xmlns:w="x"><w:footnote w:id="2"><w:p><w:r><w:t>cite</w:t></w:r></w:p></w:footnote></w:footnotes>""")
    z.close()
    val fixture = bos.toByteArray
    // defaults: body only (even the footnote extractor skips headers)
    assert(DocxExtractor.extractPages(fixture) === Seq("p1", "p2"))
    assert(DocxWithFootnotesExtractor.extractPages(fixture) ===
      Seq("p1", "p2\ncite"))
    // headers on: numeric part order (1, 2, 4-dup-collapsed, 10), blanks
    // and overflow names dropped, ONE copy prepended to the first page
    assert(DocxPartsExtractor(headers = true).extractPages(fixture) ===
      Seq("A-FIRST\nB-GAZETTE\nC-LAST\np1", "p2"))
    // both opt-ins compose: headers at the head, footnotes at the tail
    assert(DocxPartsExtractor(footnotes = true, headers = true)
      .extractPages(fixture) ===
      Seq("A-FIRST\nB-GAZETTE\nC-LAST\np1", "p2\ncite"))
    // headers alone never make a document: an all-blank body stays Nil
    // (quarantine) even with headers on — chrome must not become a page
    val blankBody = {
      val b2 = new java.io.ByteArrayOutputStream()
      val z2 = new java.util.zip.ZipOutputStream(b2)
      def e2(name: String, body: String): Unit = {
        z2.putNextEntry(new java.util.zip.ZipEntry(name))
        z2.write(body.getBytes(StandardCharsets.UTF_8)); z2.closeEntry()
      }
      e2("word/document.xml", wdoc("<w:p><w:r><w:t> </w:t></w:r></w:p>"))
      e2("word/header1.xml", whdr("<w:p><w:r><w:t>DRAFT</w:t></w:r></w:p>"))
      z2.close(); b2.toByteArray
    }
    assert(DocxPartsExtractor(headers = true).extractPages(blankBody) === Nil)
    // the MaxHeaderParts cap: part 17+ of a 20-header zip never reads
    val manyHeaders = {
      val b3 = new java.io.ByteArrayOutputStream()
      val z3 = new java.util.zip.ZipOutputStream(b3)
      def e3(name: String, body: String): Unit = {
        z3.putNextEntry(new java.util.zip.ZipEntry(name))
        z3.write(body.getBytes(StandardCharsets.UTF_8)); z3.closeEntry()
      }
      e3("word/document.xml", wdoc("<w:p><w:r><w:t>b</w:t></w:r></w:p>"))
      (1 to 20).foreach(i =>
        e3(s"word/header$i.xml", whdr(s"<w:p><w:r><w:t>H$i</w:t></w:r></w:p>")))
      z3.close(); b3.toByteArray
    }
    val capped = DocxPartsExtractor(headers = true).extractPages(manyHeaders)
    assert(capped.head.contains("H16") && !capped.head.contains("H17"),
      capped)
  }

  test("footer opt-in: off by default, distinct footers append BELOW the last page's footnotes (r13, completes the parts family)") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    def wdoc(inner: String) =
      """<w:document xmlns:w="x"><w:body>""" + inner + "</w:body></w:document>"
    def wftr(inner: String) =
      """<w:ftr xmlns:w="x">""" + inner + "</w:ftr>"
    entry("word/document.xml",
      wdoc("""<w:p><w:r><w:t>p1</w:t><w:br w:type="page"/><w:t>p2</w:t></w:r></w:p>"""))
    // reversed part order with distinct texts (the header-test discipline:
    // numeric sort actually pinned); footer10 pins numeric-vs-lexicographic;
    // footer4 duplicates footer2 (collapses); footer3 is blank (drops)
    entry("word/footer10.xml", wftr("<w:p><w:r><w:t>Z-PAGENO</w:t></w:r></w:p>"))
    entry("word/footer4.xml", wftr("<w:p><w:r><w:t>Y-NOTICE</w:t></w:r></w:p>"))
    entry("word/footer2.xml", wftr("<w:p><w:r><w:t>Y-NOTICE</w:t></w:r></w:p>"))
    entry("word/footer3.xml", wftr("<w:p><w:r><w:t> </w:t></w:r></w:p>"))
    entry("word/footer1.xml", wftr("<w:p><w:r><w:t>X-COPYRIGHT</w:t></w:r></w:p>"))
    entry("word/header1.xml",
      """<w:hdr xmlns:w="x"><w:p><w:r><w:t>HEAD</w:t></w:r></w:p></w:hdr>""")
    entry("word/footnotes.xml",
      """<w:footnotes xmlns:w="x"><w:footnote w:id="2"><w:p><w:r><w:t>cite</w:t></w:r></w:p></w:footnote></w:footnotes>""")
    z.close()
    val fixture = bos.toByteArray
    // defaults: body only — no footer text under ANY existing contract
    assert(DocxExtractor.extractPages(fixture) === Seq("p1", "p2"))
    assert(DocxWithFootnotesExtractor.extractPages(fixture) ===
      Seq("p1", "p2\ncite"))
    assert(DocxPartsExtractor(headers = true).extractPages(fixture) ===
      Seq("HEAD\np1", "p2"))
    // footers on: numeric part order (1, 2, 4-dup-collapsed, 10), blanks
    // dropped, ONE copy appended to the LAST page — the mirror of the
    // headers-on-first-page rule
    assert(DocxPartsExtractor(footers = true).extractPages(fixture) ===
      Seq("p1", "p2\nX-COPYRIGHT\nY-NOTICE\nZ-PAGENO"))
    // the full family composes: headers at the head of the first page,
    // footnotes then footers at the tail of the last (footers sit BELOW
    // the footnote block on a rendered page)
    assert(DocxPartsExtractor(footnotes = true, headers = true, footers = true)
      .extractPages(fixture) ===
      Seq("HEAD\np1", "p2\ncite\nX-COPYRIGHT\nY-NOTICE\nZ-PAGENO"))
    // footers alone never make a document: an all-blank body stays Nil
    // (quarantine) even with footers on — same chrome rule as headers
    val blankBody = {
      val b2 = new java.io.ByteArrayOutputStream()
      val z2 = new java.util.zip.ZipOutputStream(b2)
      def e2(name: String, body: String): Unit = {
        z2.putNextEntry(new java.util.zip.ZipEntry(name))
        z2.write(body.getBytes(StandardCharsets.UTF_8)); z2.closeEntry()
      }
      e2("word/document.xml", wdoc("<w:p><w:r><w:t> </w:t></w:r></w:p>"))
      e2("word/footer1.xml", wftr("<w:p><w:r><w:t>PAGE 1</w:t></w:r></w:p>"))
      z2.close(); b2.toByteArray
    }
    assert(DocxPartsExtractor(footers = true).extractPages(blankBody) === Nil)
    // an explicitly blank LAST page takes the footer text without a
    // dangling leading newline (the header blank-first-page mirror):
    // text <pb> <whitespace> <pb> leaves page 2 as the kept-"" page
    val blankLast = {
      val b3 = new java.io.ByteArrayOutputStream()
      val z3 = new java.util.zip.ZipOutputStream(b3)
      def e3(name: String, body: String): Unit = {
        z3.putNextEntry(new java.util.zip.ZipEntry(name))
        z3.write(body.getBytes(StandardCharsets.UTF_8)); z3.closeEntry()
      }
      e3("word/document.xml", wdoc(
        """<w:p><w:r><w:t>p1</w:t><w:br w:type="page"/><w:t> </w:t><w:br w:type="page"/></w:r></w:p>"""))
      e3("word/footer1.xml", wftr("<w:p><w:r><w:t>FTR</w:t></w:r></w:p>"))
      z3.close(); b3.toByteArray
    }
    assert(DocxPartsExtractor(footers = true).extractPages(blankLast) ===
      Seq("p1", "FTR"))
  }

  test("a corrupted mid-directory record diagnoses truncated-or-corrupt, never missing-document-xml (r13 advice)") {
    // the r12 shape returned the PARTIAL directory prefix when a record's
    // signature was bad with the EOCD intact — an archive whose FIRST
    // central-directory record is corrupted then misreported a
    // physically-present word/document.xml as missing, exactly the
    // missing-vs-corrupt triage confusion the entriesXml contract forbids
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    entry("[Content_Types].xml", "<Types/>")
    entry("word/document.xml",
      """<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>present</w:t></w:r></w:p></w:body></w:document>""")
    z.close()
    val bytes = bos.toByteArray
    assert(DocxExtractor.extractPages(bytes) === Seq("present"))
    // corrupt the FIRST central-directory record's signature
    // (PK\x01\x02) — the local headers and entry data stay intact
    val cdSig = Array[Byte](0x50, 0x4b, 0x01, 0x02)
    val firstCd = bytes.indices.find(i =>
      i + 4 <= bytes.length && (0 until 4).forall(j => bytes(i + j) == cdSig(j))).get
    val corrupted = bytes.clone()
    corrupted(firstCd) = 'X'.toByte
    assert(DocxExtractor.extractPages(corrupted) === Nil)
    assert(DocxExtractor.diagnose(corrupted) === "docx-truncated-or-corrupt",
      DocxExtractor.diagnose(corrupted))
  }

  test("zip64 EOCD sentinels (count 0xFFFF, offset 0xFFFFFFFF) resolve via the zip64 record, not corrupt (r14 advice)") {
    // r13's walk-must-complete rule read the 16-bit sentinel as "65535
    // records owed" and quarantined a valid zip64 archive. Build a
    // normal archive, then rewrite its tail into the zip64 shape:
    // [cd][zip64 EOCD][zip64 locator][EOCD with sentinel fields].
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
    }
    entry("[Content_Types].xml", "<Types/>")
    entry("word/document.xml",
      """<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>zip64 ok</w:t></w:r></w:p></w:body></w:document>""")
    z.close()
    val bytes = bos.toByteArray
    def u16(p: Int) = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int) = (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
      ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    val e = (bytes.length - 22 to 0 by -1)
      .find(p => u32(p) == 0x06054b50L).get
    val count = u16(e + 10); val cdSize = u32(e + 12); val cdOff = u32(e + 16)
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Long, n: Int): Unit =
      (0 until n).foreach(i => out.write(((v >>> (8 * i)) & 0xff).toInt))
    out.write(bytes, 0, e) // everything through the central directory
    val z64Pos = e
    le(0x06064b50L, 4); le(44, 8)           // zip64 EOCD sig + record size
    le(45, 2); le(45, 2); le(0, 4); le(0, 4) // versions, disk numbers
    le(count.toLong, 8); le(count.toLong, 8) // entries (disk, total)
    le(cdSize, 8); le(cdOff, 8)
    le(0x07064b50L, 4); le(0, 4); le(z64Pos.toLong, 8); le(1, 4) // locator
    le(0x06054b50L, 4); le(0, 2); le(0, 2)   // EOCD sig, disks
    le(0xFFFFL, 2); le(0xFFFFL, 2)           // sentinel counts
    le(0xFFFFFFFFL, 4); le(0xFFFFFFFFL, 4)   // sentinel cd size + offset
    le(0, 2)                                 // comment length
    val zip64 = out.toByteArray
    assert(DocxExtractor.extractPages(zip64) === Seq("zip64 ok"))
    // a COUNT sentinel without zip64 structures on an archive that does
    // NOT hold 65535 entries is a corrupted EOCD, not a legal
    // saturation (r14 review round 2)
    val noLocator = bytes.clone()
    noLocator(e + 10) = 0xff.toByte; noLocator(e + 11) = 0xff.toByte
    assert(DocxExtractor.diagnose(noLocator) === "docx-truncated-or-corrupt")
    // an OFFSET sentinel without a locator can never be real (no 4 GiB
    // directory offset fits the 256 MB body cap) — stays corrupt
    val badOffset = bytes.clone()
    (0 until 4).foreach(i => badOffset(e + 16 + i) = 0xff.toByte)
    assert(DocxExtractor.diagnose(badOffset) === "docx-truncated-or-corrupt")
  }

  test("a REAL 65535-entry non-zip64 archive (count field legally saturated) still extracts (r14 review)") {
    // java.util.zip writes the true count 65535 == 0xFFFF with no zip64
    // structures — the one legal archive shape whose EOCD count equals
    // the sentinel; the open-ended walk must accept exactly this case
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.setLevel(java.util.zip.Deflater.NO_COMPRESSION)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(
      """<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>all 65535</w:t></w:r></w:p></w:body></w:document>"""
        .getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
    (1 until 65535).foreach { i =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"f/$i"))
      z.closeEntry()
    }
    z.close()
    val raw = bos.toByteArray
    def u32(b: Array[Byte], p: Int) = (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
    val e = (raw.length - 22 to 0 by -1).find(p => u32(raw, p) == 0x06054b50L).get
    // java.util.zip goes zip64 at >= 0xFFFF entries — strip the zip64
    // EOCD + locator (the EOCD's own fields are real values for a small
    // archive) to get the legal saturated NON-zip64 shape under test
    val saturated =
      if (e >= 20 && u32(raw, e - 20) == 0x07064b50L) {
        var z64 = e - 20 - 56
        while (z64 >= 0 && u32(raw, z64) != 0x06064b50L) z64 -= 1
        raw.take(z64) ++ raw.drop(e)
      } else raw
    assert(DocxExtractor.extractPages(saturated) === Seq("all 65535"))
  }

  test("central-directory reads match a ZipInputStream walk on random archives (ScalaCheck)") {
    // the hand-rolled zip parser (entriesXml) vs the JDK streaming walk
    // as ground truth, on TRUSTED random archives (the parser exists
    // because the streaming walk is unsafe on ADVERSARIAL ones): same
    // resolved text for every wanted name, same missing-name behavior,
    // across entry counts, orders, sizes and non-ASCII names
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val namePool = Seq("word/document.xml", "word/footnotes.xml",
      "word/header1.xml", "media/img.bin", "[Content_Types].xml",
      "word/መረጃ.xml", "a/b/c.txt")
    val genEntry = for {
      n <- Gen.oneOf(namePool)
      body <- Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    } yield (n, body)
    val genArchive = Gen.listOf(genEntry).map(_.distinctBy(_._1))
    val genWanted = Gen.someOf(namePool).map(_.toSet)
    val prop = Prop.forAll(genArchive, genWanted) { (entries, wanted) =>
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      entries.foreach { case (n, body) =>
        z.putNextEntry(new java.util.zip.ZipEntry(n))
        z.write(body.getBytes(StandardCharsets.UTF_8)); z.closeEntry()
      }
      z.close()
      val bytes = bos.toByteArray
      // ground truth: the JDK streaming walk
      val truth = scala.collection.mutable.Map[String, String]()
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var e = zin.getNextEntry
      while (e != null) {
        if (wanted(e.getName))
          truth(e.getName) = new String(zin.readAllBytes(), StandardCharsets.UTF_8)
        e = zin.getNextEntry
      }
      zin.close()
      val ours = DocxExtractor.entriesXml(bytes, wanted)
        .toOption.get.collect { case (k, Right(v)) => (k, v) }
      ours == truth.toMap
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(12L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("diagnose distinguishes not-a-docx bytes from a zip missing the OPC part (r12 review)") {
    // an HTML error page saved as .docx must not read as a valid archive
    // lacking word/document.xml
    assert(DocxExtractor.diagnose("<html>404</html>".getBytes(StandardCharsets.UTF_8))
      === "not-a-docx")
    // a REAL zip without the part keeps its own reason class
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    z.write("hi".getBytes(StandardCharsets.UTF_8)); z.closeEntry(); z.close()
    assert(DocxExtractor.diagnose(bos.toByteArray) === "docx-missing-document-xml")
  }

  test("CPU bomb: a million unclosed <w:t> tags tokenize in linear time") {
    // the deflate ceiling bounds MEMORY; this pins CPU (review finding,
    // r12): with a lazy-dot text-run body, every unclosed <w:t> backtracks
    // to end-of-input — 500k tags over ~3.5 MB is ~10^12 regex steps
    // (hours). The [^<]* body fails each in O(1); the whole walk plus the
    // one valid trailing run must finish promptly.
    val xml = ("<w:t>x" * 500000) + "<w:t>ok</w:t></w:p>"
    val t0 = System.nanoTime()
    val pages = DocxExtractor.pagesFromXml(xml)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(pages === Seq("ok"), pages)
    assert(elapsedMs < 30000, s"tokenization took ${elapsedMs} ms — quadratic?")
  }

  test("password-protected OOXML (CFB directory EncryptionInfo) diagnoses `encrypted`; legacy .doc does not (r15)") {
    // detection is a CFB DIRECTORY-entry check, never a content scan
    // (review r15 round 3: a byte scan false-positived on documents
    // whose body text merely mentions 'EncryptionInfo')
    val encrypted = OoxmlFixtures.agileDoc("pw",
      OoxmlFixtures.docx("some text"))
    // a legacy-.doc-shaped container: same CFB magic, WordDocument
    // stream, NO EncryptionInfo entry — and its stream CONTENT carries
    // the UTF-16LE 'EncryptionInfo' needle, the exact false-positive
    val needleBody = ("padding " * 50 + "EncryptionInfo tail")
      .getBytes("UTF-16LE")
    val legacyDoc = OoxmlFixtures.cfb(
      "body about EncryptionInfo settings".getBytes("UTF-16LE"),
      java.util.Arrays.copyOf(needleBody, 4500),
      infoName = "WordDocument", pkgName = "1Table")
    assert(DocxExtractor.looksLikeEncryptedOoxml(encrypted))
    assert(!DocxExtractor.looksLikeEncryptedOoxml(legacyDoc))
    assert(DocxExtractor.diagnose(encrypted) === "encrypted")
    assert(DocxExtractor.diagnose(legacyDoc) === "not-a-docx")
    // not a zip, so extraction degrades to Nil without the password
    assert(DocxExtractor.extractPages(encrypted) === Nil)
    // the sniffing router ROUTES CFB bytes to the DOCX codec, whose
    // diagnosis names the real blocker; a WordDocument-bearing CFB now
    // routes to the r17 DOC codec instead of falling through — this
    // fixture's "legacy doc" carries junk where the FIB belongs, so it
    // earns the structural reason rather than the router's fallback
    val sniff = SniffingExtractor()
    assert(sniff.diagnose(encrypted) === "encrypted")
    assert(sniff.diagnose(legacyDoc) === "doc-truncated-or-corrupt")
    assert(sniff.extractPages(encrypted) === Nil)
    // zip-magic bytes containing the name are a docx question, not an
    // encryption one
    assert(!DocxExtractor.looksLikeEncryptedOoxml(
      "PKEncryptionInfo".getBytes("ISO-8859-1")))
    // the opt-in parts codecs honor the password seam too (review r15
    // round 3: the trait's no-op default silently dropped it)
    assert(DocxPartsExtractor(footnotes = true).withPassword("pw")
      .extractPages(encrypted) === Seq("some text"))
    assert(DocxWithFootnotesExtractor.withPassword("pw")
      .extractPages(encrypted) === Seq("some text"))
  }

  test("entry CRC-32 is verified: a damaged STORED document.xml quarantines docx-crc-mismatch (r16 fuzzer find)") {
    // stored entries have no integrity check of their own — without the
    // central-directory CRC verification a flipped byte lands silently
    // corrupted text in the GOOD channel
    val xml =
      ("""<?xml version="1.0"?><w:document><w:body>""" +
        """<w:p><w:r><w:t>የፍርድ ውሳኔ stored text</w:t></w:r></w:p>""" +
        "</w:body></w:document>").getBytes(StandardCharsets.UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    val e = new java.util.zip.ZipEntry("word/document.xml")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(xml.length.toLong)
    val c = new java.util.zip.CRC32(); c.update(xml)
    e.setCrc(c.getValue)
    z.putNextEntry(e); z.write(xml); z.closeEntry(); z.close()
    val good = bos.toByteArray
    assert(DocxExtractor.extractPages(good) === Seq("የፍርድ ውሳኔ stored text"))
    // flip one byte inside the stored data (the 't' of "text")
    val target = "stored text".getBytes(StandardCharsets.UTF_8)
    val dataOff = good.indexOfSlice(target)
    assert(dataOff > 0)
    val bad = good.clone()
    bad(dataOff) = 'x'.toByte
    assert(DocxExtractor.extractPages(bad) === Nil)
    assert(DocxExtractor.diagnose(bad) === "docx-crc-mismatch")
  }

  test("entry CRC-32 is verified: a deflate-literal flip that still inflates quarantines docx-crc-mismatch") {
    // raw deflate carries NO checksum: a single flipped byte that lands
    // in a LITERAL inflates "successfully" into wrong text (the r16
    // seed-sweep fuzzer found exactly this through an RC4-decrypted
    // package). Scan deterministically for such a byte and pin that the
    // CRC check catches it.
    val doc = docx(p("<w:t>የፌዴራል ጠቅላይ ፍርድ ቤት ውሳኔ 2015</w:t>"))
    val want = DocxExtractor.extractPages(doc)
    assert(want.nonEmpty)
    val hit = (0 until doc.length).iterator.map { off =>
      val m = doc.clone(); m(off) = (m(off) ^ 0x01).toByte
      (off, DocxExtractor.diagnose(m))
    }.find(_._2 == "docx-crc-mismatch")
    assert(hit.isDefined,
      "no single-byte flip reached the CRC check — the deflate stream " +
        "rejected every mutation, so the pin lost its subject")
    val (off, _) = hit.get
    val m = doc.clone(); m(off) = (m(off) ^ 0x01).toByte
    assert(DocxExtractor.extractPages(m) === Nil)
  }

  test("a CRC-failing INCLUDED part fails the document — footnote-wired extraction must not silently drop citations (r17 review round 3)") {
    // good deflated body + a STORED footnotes.xml whose data is flipped
    // against its central-directory CRC: with footnotes ON the document
    // quarantines with the integrity reason (statutes cite in
    // footnotes — body-only output would be corruption in the good
    // channel); with footnotes OFF the part is not decoded at all and
    // the body extracts as before
    val bodyXml = ("""<?xml version="1.0"?><w:document><w:body>""" +
      """<w:p><w:r><w:t>body article</w:t></w:r></w:p>""" +
      "</w:body></w:document>").getBytes(StandardCharsets.UTF_8)
    val fnXml = ("""<?xml version="1.0"?>""" +
      """<w:footnotes xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
      """<w:footnote w:id="1"><w:p><w:r><w:t>citation text</w:t></w:r></w:p></w:footnote>""" +
      "</w:footnotes>").getBytes(StandardCharsets.UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(bodyXml); z.closeEntry()
    val e = new java.util.zip.ZipEntry("word/footnotes.xml")
    e.setMethod(java.util.zip.ZipEntry.STORED)
    e.setSize(fnXml.length.toLong)
    val c = new java.util.zip.CRC32(); c.update(fnXml)
    e.setCrc(c.getValue)
    z.putNextEntry(e); z.write(fnXml); z.closeEntry(); z.close()
    val good = bos.toByteArray
    assert(DocxWithFootnotesExtractor.extractPages(good)
      === Seq("body article\ncitation text"))
    val bad = good.clone()
    val off = good.indexOfSlice("citation text".getBytes(StandardCharsets.UTF_8))
    assert(off > 0)
    bad(off) = 'x'.toByte
    assert(DocxWithFootnotesExtractor.extractPages(bad) === Nil)
    assert(DocxWithFootnotesExtractor.diagnose(bad) === "docx-crc-mismatch")
    assert(DocxPartsExtractor(footnotes = true).extractPages(bad) === Nil)
    assert(DocxPartsExtractor(footnotes = true).diagnose(bad)
      === "docx-crc-mismatch")
    // footnotes OFF: the damaged part is never decoded, body extracts
    assert(DocxExtractor.extractPages(bad) === Seq("body article"))
    assert(DocxPartsExtractor().extractPages(bad) === Seq("body article"))
  }
}
