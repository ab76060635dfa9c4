package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Adversarial-input pins for the network-admitted codecs (r12 hardening
  * — the `<w:t>` CPU-bomb class generalized): every lazy-dot regex that
  * scanned attacker-shaped bytes is now a linear open/close pairing walk,
  * and every decompressor that can expand super-linearly is ceilinged at
  * [[FlatePdfExtractor.MaxDecodedStreamBytes]]. Each pin builds a small
  * crafted document that made the OLD shape quadratic (hours) or
  * gigabyte-scale, and asserts the walk completes promptly with the
  * documented graceful degrade — and that adjacent GOOD content still
  * extracts (per-stream/per-page tolerance, the S9 contract).
  *
  * Wall-clock bounds are generous (the DocxExtractorSpec CPU-bomb
  * convention): a quadratic path overshoots them by orders of magnitude.
  */
class CodecBombSpec extends AnyFunSuite {

  private def pdf(objs: String*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n"); objs.foreach(w); w("%%EOF\n")
    out.toByteArray
  }

  private def streamObj(num: Int, dict: String, data: Array[Byte]): String =
    s"$num 0 obj\n<< /Length ${data.length} $dict >>\nstream\n" +
      new String(data, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n"

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](65536)
    while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
    d.end(); out.toByteArray
  }

  private def deflateS(s: String): Array[Byte] =
    deflate(s.getBytes(StandardCharsets.ISO_8859_1))

  private def timed[A](maxMs: Long, what: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val a = body
    val ms = (System.nanoTime() - t0) / 1000000
    assert(ms < maxMs, s"$what took $ms ms — quadratic?")
    a
  }

  test("object-header CPU bomb: 300k terminator-less `1 0 obj` headers walk in linear time") {
    // the old ObjRe rescanned to end-of-input per header (O(k·n) ≈ 10^12
    // regex steps over ~2.4 MB); the linear objSlices walk clamps each
    // header's terminator search at the next header
    val raw = "%PDF-1.4\n" + ("1 0 obj " * 300000) +
      streamObj(2, "/Filter /FlateDecode", deflateS("BT (still works) Tj ET"))
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    val pages = timed(30000, "extract") { FlatePdfExtractor.extractPages(bytes) }
    assert(pages === Seq("still works"), pages)
    timed(30000, "diagnose") { FlatePdfExtractor.diagnose(bytes) }
  }

  test("an overflowing object number skips ITS header only — adjacent objects still extract (r13 advice)") {
    // `99999999999 0 obj` used to throw NumberFormatException out of
    // objSlices and abort the WHOLE document to Nil (diagnosing a
    // misleading 'empty-text'); attacker-controlled numbers must skip,
    // the same class as the DOCX HeaderNameRe \d{1,6} fix
    val raw = "%PDF-1.4\n" +
      "99999999999 0 obj\n<< /Type /XObject >>\nendobj\n" +
      streamObj(2, "/Filter /FlateDecode", deflateS("BT (survives) Tj ET"))
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    val pages = FlatePdfExtractor.extractPages(bytes)
    assert(pages === Seq("survives"), pages)
  }

  test("overflowing /ToUnicode ref and /Predicator numbers skip, never abort the document (r13 review)") {
    // the objSlices toIntOption fix generalized: extract()'s remaining
    // attacker-number parses (ToUnicode/font refs, DecodeParms ints,
    // EarlyChange) must also skip on overflow instead of throwing
    // NumberFormatException out to the Nil catch-all
    val raw = "%PDF-1.4\n" +
      "1 0 obj\n<< /Font << /F1 3 0 R >> /ToUnicode 99999999999 0 R >>\nendobj\n" +
      streamObj(2, "/Filter /FlateDecode /DecodeParms << /Predictor 99999999999 >>",
        deflateS("ignored — implausible parms")) +
      streamObj(4, "/Filter /FlateDecode", deflateS("BT (still here) Tj ET"))
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    val pages = FlatePdfExtractor.extractPages(bytes)
    assert(pages.contains("still here"), pages)
  }

  test("CMap hex bombs skip their entry only: <FFFFFFFF> CIDs and invalid-codepoint ranges (r13 review round 2)") {
    // Integer.parseInt on an 8-digit CID threw NumberFormatException out
    // of extract() to the Nil catch-all — one crafted mapping lost the
    // whole document; now the bad ENTRY skips and the good rows map
    val cmap = "begincmap beginbfchar " +
      "<FFFFFFFF> <0041> " + // overflows Int: skip
      "<0042> <1218> " + // good: CID 0x42 -> U+1218 (Ethiopic me)
      "endbfchar beginbfrange " +
      "<0000> <0001> <7FFFFFF0> " + // dst past valid code points: rows skip
      "<0050> <0051> <0041> " + // good range
      "endbfrange endcmap"
    val raw = "%PDF-1.4\n" +
      "1 0 obj\n<< /Font << /F1 2 0 R >> >>\nendobj\n" +
      "2 0 obj\n<< /ToUnicode 3 0 R >>\nendobj\n" +
      streamObj(3, "/Filter /FlateDecode", deflateS(cmap)) +
      streamObj(4, "/Filter /FlateDecode",
        deflateS("BT /F1 12 Tf [ <00420050> ] TJ ET"))
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    val pages = FlatePdfExtractor.extractPages(bytes)
    assert(pages === Seq("መA"), pages)
  }

  test("an indirect multi-digit /Length cannot backtrack into a direct length (r13 review round 2)") {
    // '/Length 20 0 R' with a backtrackable \d+ matched the prefix '2'
    // and truncated the stream to 2 bytes when the plausibility window
    // allowed it; the possessive quantifier rejects the whole form and
    // the endstream scan takes over
    val body = deflateS("BT (full stream intact) Tj ET")
    // N = (L-2)*10 + 1: the backtracked digit-prefix (L-2) sits inside
    // the plausibility window and TRUNCATES the stream by 2 bytes
    val n = (body.length - 2) * 10 + 1
    val raw = "%PDF-1.4\n" +
      s"2 0 obj\n<< /Length $n 0 R /Filter /FlateDecode >>\nstream\n" +
      new String(body, StandardCharsets.ISO_8859_1) + "\nendstream\nendobj\n" +
      s"3 0 obj\n<< /Length ${body.length} >>\nendobj\n"
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    assert(FlatePdfExtractor.extractPages(bytes) === Seq("full stream intact"))
  }

  test("/Crypt stream filter: skipped per-stream, diagnosed unsupported-filter:Crypt (VERDICT r13 #6)") {
    // the last declared-out PDF shape: a stream whose filter chain names
    // /Crypt (per-stream crypt-filter selection, ISO 32000 §7.4.10).
    // decodeStream must skip it (never mis-decode), text in OTHER
    // streams must survive, and an all-Crypt document must reason-code
    // as unsupported-filter:Crypt — not fall through to empty-text.
    val good = streamObj(2, "/Filter /FlateDecode",
      deflateS("BT (visible text) Tj ET"))
    val crypt = streamObj(3,
      "/Filter [ /Crypt ] /DecodeParms [ << /Name /Identity >> ]",
      "opaque-bytes-the-decoder-must-not-touch".getBytes(StandardCharsets.ISO_8859_1))
    assert(FlatePdfExtractor.extractPages(pdf(good, crypt)) ===
      Seq("visible text"))
    val onlyCrypt = pdf(crypt)
    assert(FlatePdfExtractor.extractPages(onlyCrypt) === Nil)
    assert(FlatePdfExtractor.diagnose(onlyCrypt) === "unsupported-filter:Crypt",
      FlatePdfExtractor.diagnose(onlyCrypt))
    // mixed-raster determinism: Crypt sorts into the +-joined list
    val dct = streamObj(4, "/Filter /DCTDecode", Array[Byte](1, 2, 3))
    assert(FlatePdfExtractor.diagnose(pdf(crypt, dct)) ===
      "unsupported-filter:Crypt+DCTDecode")
  }

  test("trailer CPU bomb: 200k close-less `trailer <<` markers diagnose in linear time") {
    val raw = "%PDF-1.4\n" + ("trailer << /X " * 200000)
    val bytes = raw.getBytes(StandardCharsets.ISO_8859_1)
    val reason = timed(30000, "diagnose") { FlatePdfExtractor.diagnose(bytes) }
    assert(reason === "empty-text", reason)
  }

  test("deflate bomb: a ~100 KB stream inflating past the 64 MB ceiling degrades per-stream, text pages survive") {
    val bombPlain = new Array[Byte](128 << 20) // zeros: 128 MB → ~130 KB deflated
    val doc = pdf(
      streamObj(1, "/Filter /FlateDecode", deflate(bombPlain)),
      streamObj(2, "/Filter /FlateDecode", deflateS("BT (salvaged) Tj ET")))
    val pages = timed(30000, "extract") { FlatePdfExtractor.extractPages(doc) }
    assert(pages === Seq("salvaged"), pages)
  }

  test("RunLength bomb: 128x expansion past the ceiling degrades per-stream") {
    // 1.5 MB of (0xFF, 'x') pairs → each pair emits 130 bytes → ~96 MB
    val rl = new Array[Byte](3 << 19)
    var i = 0
    while (i < rl.length) { rl(i) = 0x81.toByte; rl(i + 1) = 'x'.toByte; i += 2 }
    val doc = pdf(
      streamObj(1, "/Filter /RunLengthDecode", rl),
      streamObj(2, "/Filter /FlateDecode", deflateS("BT (kept) Tj ET")))
    val pages = timed(30000, "extract") { FlatePdfExtractor.extractPages(doc) }
    assert(pages === Seq("kept"), pages)
  }

  test("TJ CPU bomb: 400k close-less `[` openers in a content stream pair in linear time") {
    // the old lazy TJRe rescanned the tail per `[`; the pairing walk
    // consults the precomputed close positions once
    val content = "BT " + ("[x" * 400000) + " (ok) Tj ET"
    val doc = pdf(streamObj(1, "/Filter /FlateDecode", deflateS(content)))
    val pages = timed(30000, "extract") { FlatePdfExtractor.extractPages(doc) }
    assert(pages === Seq("ok"), pages)
  }

  test("bfrange span bomb: a <00000000><7FFFFFFF> range is skipped, sane CMap entries still map") {
    // 2^31 map inserts before the cap — an OOM/CPU bomb through the
    // ToUnicode path; CIDs here are 16-bit so the wide range carries no
    // legitimate text. The synthetic CMap wiring doubles as the path's
    // first non-reference fixture: F1 → obj 4 → ToUnicode obj 5.
    val cmap =
      "beginbfchar\n<0041> <12AB>\nendbfchar\n" +
        "beginbfrange\n<00000000> <7FFFFFFF> <0041>\nendbfrange\n"
    val doc = pdf(
      streamObj(1, "/Filter /FlateDecode",
        deflateS("BT /F1 12 Tf [<0041>] TJ ET")),
      "2 0 obj\n<< /Type /Page /Resources << /Font << /F1 4 0 R >> >> >>\nendobj\n",
      "4 0 obj\n<< /Type /Font /ToUnicode 5 0 R >>\nendobj\n",
      streamObj(5, "", cmap.getBytes(StandardCharsets.ISO_8859_1)))
    val pages = timed(30000, "extract") { FlatePdfExtractor.extractPages(doc) }
    assert(pages === Seq("ካ"), pages.map(_.map(_.toInt.toHexString)))
  }

  test("RawPdfExtractor stream CPU bomb: 200k endstream-less `stream` markers walk in linear time") {
    val raw = "%PDF-1.4\n" + ("stream\n" * 200000) +
      "stream\nBT (last) Tj ET\nendstream\n"
    val pages = timed(30000, "raw extract") {
      RawPdfExtractor.extractPages(raw.getBytes(StandardCharsets.ISO_8859_1))
    }
    // every marker pairs with the single endstream lazily — first opener
    // wins, so one (text-free) giant block plus nothing else; the pin is
    // the wall-clock, the old regex ran O(k·n) here
    assert(pages.size <= 1)
  }

  test("a deflate-bomb entry the extractor never asked for costs nothing (central-directory read)") {
    // ZipInputStream.getNextEntry drains every SKIPPED entry through the
    // inflater to find the next header, so a bomb entry BEFORE the
    // wanted parts used to cost its full inflated size in discarded CPU;
    // the central-directory read jumps straight to the wanted entries
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, b: Array[Byte]): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name)); z.write(b); z.closeEntry()
    }
    // 512 MB of zeros streamed in 1 MB writes (~0.5 MB deflated) — the
    // bomb never exists uncompressed on the test heap
    locally {
      z.putNextEntry(new java.util.zip.ZipEntry("media/bomb.bin"))
      val mb = new Array[Byte](1 << 20)
      (1 to 512).foreach(_ => z.write(mb))
      z.closeEntry()
    }
    entry("word/document.xml",
      ("""<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>body</w:t></w:r></w:p>""" +
        "</w:body></w:document>").getBytes(StandardCharsets.UTF_8))
    entry("word/footnotes.xml",
      ("""<w:footnotes xmlns:w="x"><w:footnote w:id="2"><w:p><w:r>""" +
        "<w:t>note</w:t></w:r></w:p></w:footnote></w:footnotes>")
        .getBytes(StandardCharsets.UTF_8))
    z.close()
    val doc = bos.toByteArray
    val pages = timed(30000, "docx with unwanted bomb entry") {
      DocxWithFootnotesExtractor.extractPages(doc)
    }
    assert(pages === Seq("body\nnote"), pages)
    // an OVERSIZE wanted part degrades that part only — and skipping it
    // costs nothing either (nothing is drained to reach other entries)
    val bos2 = new java.io.ByteArrayOutputStream()
    val z2 = new java.util.zip.ZipOutputStream(bos2)
    def entry2(name: String, b: Array[Byte]): Unit = {
      z2.putNextEntry(new java.util.zip.ZipEntry(name)); z2.write(b); z2.closeEntry()
    }
    locally { // 128 MB body, past the 64 MB ceiling — streamed, same reason
      z2.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      val mb = new Array[Byte](1 << 20)
      (1 to 128).foreach(_ => z2.write(mb))
      z2.closeEntry()
    }
    entry2("word/footnotes.xml", "<w:footnotes/>".getBytes(StandardCharsets.UTF_8))
    z2.close()
    val quarantined = timed(30000, "oversize body") {
      DocxWithFootnotesExtractor.extractPages(bos2.toByteArray)
    }
    assert(quarantined === Nil)
    assert(DocxExtractor.diagnose(bos2.toByteArray) === "docx-oversize-xml")
  }

  test("footnotes CPU bomb: 300k close-less `<w:footnote` openers walk in linear time") {
    val notes = ("<w:footnote " * 300000) +
      """<w:footnote w:id="2"><w:p><w:r><w:t>real note</w:t></w:r></w:p></w:footnote>"""
    // minimal OPC container (the DocxExtractorSpec fixture shape)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, b: Array[Byte]): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name)); z.write(b); z.closeEntry()
    }
    entry("[Content_Types].xml", "<Types/>".getBytes(StandardCharsets.UTF_8))
    entry("word/document.xml",
      ("""<w:document xmlns:w="x"><w:body><w:p><w:r><w:t>body</w:t></w:r></w:p>""" +
        "</w:body></w:document>").getBytes(StandardCharsets.UTF_8))
    entry("word/footnotes.xml",
      ("""<w:footnotes xmlns:w="x">""" + notes + "</w:footnotes>")
        .getBytes(StandardCharsets.UTF_8))
    z.close()
    val pages = timed(30000, "footnotes walk") {
      DocxWithFootnotesExtractor.extractPages(bos.toByteArray)
    }
    // the close-less openers pair lazily: the FIRST opener swallows up to
    // the single real close (regex parity) — body text must survive and
    // the walk must stay linear
    assert(pages.nonEmpty && pages.head.startsWith("body"), pages)
  }
}
