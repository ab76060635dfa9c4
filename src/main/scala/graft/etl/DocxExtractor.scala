package graft.etl

import java.nio.charset.StandardCharsets
import scala.util.matching.Regex

/** Zero-dependency DOCX text extractor (SURVEY §7.4's codec family,
  * VERDICT r10 #3) — the statute-ingestion twin of [[FlatePdfExtractor]],
  * mirroring the reference's DOCX path (auto_ingest.yml:27-29 posts
  * `*.docx` and the statutes tree with `resource_type=statute`).
  *
  * A .docx is a ZIP container (OPC); the body text lives in
  * `word/document.xml` as WordprocessingML. The extractor:
  *   - walks the archive with `java.util.zip.ZipInputStream` (JDK-only,
  *     streaming — the entry is decompressed once, never materialized
  *     beyond its own bytes),
  *   - tokenizes the XML with one linear regex pass: `<w:t>` text runs
  *     (entity-unescaped), `<w:tab/>` → TAB, in-paragraph `<w:br/>` →
  *     newline, `</w:p>` paragraph ends → newline,
  *   - splits PAGES on explicit page breaks (`<w:br w:type="page"/>`) and
  *     Word's rendered-break markers (`<w:lastRenderedPageBreak/>`), the
  *     closest DOCX analogue to the PDF extractor's page contract — a
  *     document with no breaks is one page.
  * Never throws on garbage — returns Nil (the S16 quarantine contract,
  * same as the PDF codecs): non-zip bytes, a zip without
  * `word/document.xml`, or an entry that fails to decompress all degrade
  * to Nil.
  */
object DocxExtractor extends PageExtractor {

  private val DocumentEntry = "word/document.xml"

  /** One token class per structural element we honor; a single
    * alternation keeps the walk linear and order-faithful.
    */
  private val TokenRe: Regex =
    ("""(?s)<w:t(?:\s[^>]*)?>(.*?)</w:t>""" + // 1: text run
      """|<w:tab\s*/>""" +
      """|<w:br\s+[^>]*w:type="page"[^>]*/?>""" +
      """|<w:lastRenderedPageBreak\s*/>""" +
      """|<w:br\s*/>""" +
      """|</w:p>""").r

  def extractPages(bytes: Array[Byte]): Seq[String] = {
    try {
      documentXml(bytes) match {
        case None => Nil
        case Some(xml) => pagesFromXml(xml)
      }
    } catch { case _: Exception => Nil }
  }

  /** Locate and decompress `word/document.xml`; None when absent or
    * undecodable.
    */
  private[etl] def documentXml(bytes: Array[Byte]): Option[String] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      var entry = zin.getNextEntry
      while (entry != null) {
        if (entry.getName == DocumentEntry) {
          val out = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](8192)
          var n = zin.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
          return Some(new String(out.toByteArray, StandardCharsets.UTF_8))
        }
        entry = zin.getNextEntry
      }
      None
    } finally zin.close()
  }

  private[etl] def pagesFromXml(xml: String): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def flushPage(): Unit = {
      val t = cur.toString
      if (t.trim.nonEmpty) pages += t.stripLineEnd
      cur.clear()
    }
    TokenRe.findAllMatchIn(xml).foreach { m =>
      val tok = m.matched
      if (m.group(1) != null) cur ++= unescape(m.group(1))
      else if (tok.startsWith("<w:tab")) cur += '\t'
      else if (tok.startsWith("<w:lastRenderedPageBreak") ||
        tok.contains("w:type=\"page\"")) flushPage()
      else cur += '\n' // </w:p> and plain <w:br/>
    }
    flushPage()
    pages.toSeq
  }

  /** True iff the bytes start with the ZIP local-file-header magic
    * (every OPC/.docx container does). Content-based, not name-based —
    * the [[SniffingExtractor]] routing key.
    */
  def looksLikeZip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 0x03 && bytes(3) == 0x04

  /** The five XML named entities plus numeric character references —
    * everything WordprocessingML emits in `<w:t>` content.
    */
  private val EntityRe: Regex = """&(#x[0-9A-Fa-f]+|#\d+|amp|lt|gt|quot|apos);""".r

  private[etl] def unescape(s: String): String =
    EntityRe.replaceAllIn(s, m => Regex.quoteReplacement(m.group(1) match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case num if num.startsWith("#x") =>
        new String(Character.toChars(Integer.parseInt(num.drop(2), 16)))
      case num => new String(Character.toChars(num.drop(1).toInt))
    }))
}
