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
  *   - resolves the wanted entries through the zip CENTRAL DIRECTORY
  *     (JDK-only, random access — only wanted entries are ever
  *     inflated, each under the bomb ceiling; see [[entriesXml]] for
  *     why a ZipInputStream walk is an inflate-and-discard CPU hole),
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
  *
  * Scope: the document BODY by default. Table text extracts naturally
  * (cells hold ordinary `<w:p>` paragraphs — the walk keys on runs and
  * paragraph ends, not on container elements), each cell ending as a
  * line. Footnotes and headers live in SEPARATE zip entries and are
  * OPT-IN via [[DocxPartsExtractor]] (r12 — statutes cite in
  * footnotes; headers and footers stay off even there, they are usually
  * the boilerplate chrome q95's screen removes; r13 completes the parts
  * family with the footer opt-in).
  */
object DocxExtractor extends PageExtractor {

  private val DocumentEntry = "word/document.xml"
  private val FootnotesEntry = "word/footnotes.xml"

  /** One token class per structural element we honor; a single
    * alternation keeps the walk linear and order-faithful. The br family
    * covers the ATTRIBUTED non-page variants too (`w:type="textWrapping"`,
    * `w:clear=...`) and the legacy `<w:cr/>` carriage return — all render
    * as line breaks; only `w:type="page"` (and Word's rendered-break
    * marker) starts a new page (review finding, r11).
    *
    * The text-run body is `[^<]*`, NOT a lazy dot: WordprocessingML text
    * content never contains a raw `<` (always entity-escaped), and the
    * negated class makes failure at an unclosed `<w:t>` O(1) instead of
    * backtracking to end-of-input — a crafted document.xml of millions of
    * unclosed tags (well under [[MaxDocumentXmlBytes]]) would otherwise
    * pin the network-admitted statute ingest path in O(n²) regex work
    * (CPU-bomb review finding, r12; the deflate ceiling bounds memory
    * but not CPU).
    */
  private val TokenRe: Regex =
    ("""<w:t(?:\s[^>]*)?>([^<]*)</w:t>""" + // 1: text run
      """|<w:tab\s*/>""" +
      """|<w:br\s+[^>]*w:type="page"[^>]*/?>""" +
      """|<w:lastRenderedPageBreak\s*/>""" +
      """|<w:br(?:\s[^>]*)?/?>""" +
      """|<w:cr\s*/>""" +
      """|</w:p>""").r

  def extractPages(bytes: Array[Byte]): Seq[String] =
    extractPages(bytes, includeFootnotes = false)

  /** Body pages, optionally with the document's footnotes appended
    * (VERDICT r11 item 7 — statutes cite in footnotes; the body-only
    * contract stays the DEFAULT). Footnote text lives in a SEPARATE zip
    * entry (`word/footnotes.xml`) with no pagination of its own, so with
    * the flag on each content footnote (separator/continuation chrome
    * stubs are skipped — see [[footnoteChromeTypes]]) is appended as
    * extra lines to the LAST page, in footnote order — the closest
    * analogue to where a renderer places them without inventing phantom
    * pages. A body whose pages are all blank but whose footnotes carry
    * text emits the notes as ONE page (review finding, r12 — the
    * footnote-wired corpus is exactly the one whose content may live
    * entirely in footnotes; quarantining it would drop real text). A
    * missing/empty footnotes part is not an error: body-only output.
    * Both entries decompress in ONE archive walk (review finding, r12 —
    * the extraction hot path shouldn't re-open the zip per part).
    */
  def extractPages(bytes: Array[Byte], includeFootnotes: Boolean): Seq[String] =
    extractPages(bytes, includeFootnotes, includeHeaders = false,
      includeFooters = false)

  def extractPages(bytes: Array[Byte], includeFootnotes: Boolean,
                   includeHeaders: Boolean): Seq[String] =
    extractPages(bytes, includeFootnotes, includeHeaders,
      includeFooters = false)

  /** The full opt-in surface (VERDICT r11 item 7's "and optionally
    * headers"): headers live in `word/headerN.xml` parts — one per
    * section/variant (first/even/odd), resolved per page by rels this
    * extractor deliberately doesn't parse — so with `includeHeaders` on,
    * the DISTINCT header texts (numeric part order; Word often writes
    * identical default/even/first variants — duplicates collapse) are
    * PREPENDED to the FIRST page as lines: the least-phantom placement
    * without pagination fidelity, mirroring the footnotes-on-last-page
    * choice. Headers are usually boilerplate chrome (q95's screen
    * exists to remove exactly this), hence off by default even in the
    * footnote-wired extractor.
    */
  /** The widest signature — body, footnotes, headers, footers. ONE
    * [[cdEntries]] parse serves every part this call reads: the body
    * resolve, the footnotes entry, and the header/footer part discovery
    * all walk the SAME parsed directory (r13 advice — the r12 shape
    * re-parsed the directory inside `headersText`, contradicting the
    * one-archive-walk contract the extraction hot path documents).
    */
  def extractPages(bytes: Array[Byte], includeFootnotes: Boolean,
                   includeHeaders: Boolean,
                   includeFooters: Boolean): Seq[String] =
    extractPagesOrPartReason(bytes, includeFootnotes, includeHeaders,
      includeFooters).getOrElse(Nil)

  /** Left ⇔ an INCLUDED part (footnotes / a header / a footer) failed
    * integrity or decoding — the whole document quarantines with that
    * part's reason rather than silently dropping the part into the
    * good channel (r17 review round 3: a CRC-failing footnotes.xml
    * previously extracted body-only, exactly the silent-partial class
    * the r16 CRC gate closed for the body; statutes CITE in footnotes,
    * so a citation-less statute in the good channel is corruption, not
    * degradation). Body failures stay Right(Nil) — [[diagnose]] names
    * them through [[documentXmlOrReason]] as before.
    */
  private[etl] def extractPagesOrPartReason(bytes: Array[Byte],
      includeFootnotes: Boolean, includeHeaders: Boolean,
      includeFooters: Boolean): Either[String, Seq[String]] = {
    try {
      cdEntries(bytes) match {
        case Left(_) => Right(Nil)
        case Right(entries) =>
          // directory order, first occurrence wins — the entriesXml rule
          def read(name: String): Option[Either[String, String]] =
            entries.find(_.name == name).map(e =>
              readEntry(bytes, e.localOff, e.method, e.compSize, e.crc))
          read(DocumentEntry) match {
            case None | Some(Left(_)) => Right(Nil) // diagnose names it
            case Some(Right(xml)) =>
              val pages = pagesFromXml(xml)
              val notes =
                if (includeFootnotes) read(FootnotesEntry) match {
                  case Some(Left(reason)) => return Left(reason)
                  case Some(Right(x)) => footnotesFromXml(x)
                  case None => Nil
                } else Nil
              val heads =
                if (includeHeaders)
                  variantParts(bytes, entries, HeaderNameRe) match {
                    case Left(reason) => return Left(reason)
                    case Right(h) => h
                  }
                else Nil
              val foots =
                if (includeFooters)
                  variantParts(bytes, entries, FooterNameRe) match {
                    case Left(reason) => return Left(reason)
                    case Right(f) => f
                  }
                else Nil
              val withNotes =
                if (notes.isEmpty) pages
                else if (pages.isEmpty) Seq(notes.mkString("\n"))
                else pages.init :+ (pages.last + "\n" + notes.mkString("\n"))
              // headers and footers alone never MAKE a document (unlike
              // footnotes, which can carry the content): a no-text body
              // stays Nil → quarantine even with the chrome flags on —
              // emitting a chrome-only page would put exactly the
              // boilerplate q95 removes into the good channel (r12
              // review round 4). An explicitly blank first/last page
              // takes the chrome text without minting a dangling
              // newline. Footers sit BELOW the footnote block on the
              // rendered last page, hence appended after the notes.
              val withFoots =
                if (foots.isEmpty || withNotes.isEmpty) withNotes
                else {
                  val last =
                    if (withNotes.last.isEmpty) foots.mkString("\n")
                    else withNotes.last + "\n" + foots.mkString("\n")
                  withNotes.init :+ last
                }
              Right(
                if (heads.isEmpty || withFoots.isEmpty) withFoots
                else {
                  val first =
                    if (withFoots.head.isEmpty) heads.mkString("\n")
                    else heads.mkString("\n") + "\n" + withFoots.head
                  first +: withFoots.tail
                })
          }
      }
    } catch { case _: Exception => Right(Nil) }
  }

  /** Distinct variant-part texts (`word/headerN.xml` /
    * `word/footerN.xml`) in numeric part order — duplicates collapse
    * (Word writes identical default/even/first variants), blanks drop.
    * Bounded to the first [[MaxVariantParts]] parts: a crafted zip with
    * thousands of header/footer entries shouldn't turn the opt-in into a
    * decompress-everything request. Part numbers longer than 6 digits
    * are ignored (attacker-controlled names must not overflow toInt and
    * crash the whole extraction to Nil — r12 review round 4). Operates
    * on the CALLER's already-parsed directory — `extractPages` performs
    * exactly one [[cdEntries]] walk per document (r13 advice).
    */
  private val MaxVariantParts = 16
  private val HeaderNameRe: Regex = """word/header(\d{1,6})\.xml""".r
  private val FooterNameRe: Regex = """word/footer(\d{1,6})\.xml""".r

  private def variantParts(bytes: Array[Byte], entries: Seq[CdEntry],
                           nameRe: Regex): Either[String, Seq[String]] = {
    val seen = scala.collection.mutable.Set[String]()
    val selected = entries
      .flatMap { e =>
        e.name match {
          case nameRe(num) if seen.add(e.name) => Some((num.toInt, e))
          case _ => None
        }
      }
      .sortBy(_._1)
      .take(MaxVariantParts)
    val texts = Seq.newBuilder[String]
    selected.foreach { case (_, e) =>
      // an included part that fails integrity/decoding fails the
      // document (r17 review round 3) — .toOption here silently dropped
      // a CRC-mismatched header/footer
      readEntry(bytes, e.localOff, e.method, e.compSize, e.crc) match {
        case Left(reason) => return Left(reason)
        case Right(xml) =>
          val t = pagesFromXml(xml).mkString("\n").trim
          if (t.nonEmpty) texts += t
      }
    }
    Right(texts.result().distinct)
  }

  /** Footnote types that are LAYOUT CHROME, not content — the rendered
    * separator rules and continuation notices (ECMA-376 §17.11.11
    * w:type values). Everything else — no w:type attribute, or the
    * explicit default `w:type="normal"` that non-Word generators emit —
    * is a content footnote (review finding, r12: a blanket
    * any-w:type-skips rule silently dropped citations from
    * python-docx/LibreOffice-style output).
    */
  private val footnoteChromeTypes =
    Set("separator", "continuationSeparator", "continuationNotice")

  /** One text block per CONTENT footnote, document order (chrome types
    * skipped — [[footnoteChromeTypes]]). The element walk is a linear
    * open/close pairing, not a lazy-dot regex: a crafted close-less
    * footnotes part would make `(.*?)</w:footnote>` rescan to
    * end-of-input per opening — the same CPU-bomb class as the `<w:t>`
    * text-run finding this part's 64 MB inflate ceiling already
    * guards for memory (r12 review).
    */
  private[etl] def footnotesFromXml(xml: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val Open = "<w:footnote"
    val Close = "</w:footnote>"
    // both XML-legal quote styles: single-quoted attributes are exactly
    // what the non-Word generators this path exists for may emit
    // (r12 review round 2)
    val TypeAttr = """w:type=["']([^"']*)["']""".r
    var p = xml.indexOf(Open)
    while (p >= 0) {
      val after = p + Open.length
      // name boundary: exclude the <w:footnotes> root element
      val isTag = after < xml.length && {
        val c = xml.charAt(after)
        c == ' ' || c == '>' || c == '\t' || c == '\r' || c == '\n' || c == '/'
      }
      val gt = if (isTag) xml.indexOf('>', after) else -1
      if (gt < 0) p = xml.indexOf(Open, p + 1)
      else {
        val close = xml.indexOf(Close, gt + 1)
        if (close < 0) p = -1
        else {
          val chrome = TypeAttr.findFirstMatchIn(xml.substring(after, gt))
            .exists(m => footnoteChromeTypes(m.group(1)))
          if (!chrome)
            out ++= pagesFromXml(xml.substring(gt + 1, close))
          p = xml.indexOf(Open, close + Close.length)
        }
      }
    }
    out.result()
  }

  /** Decompression ceiling for `word/document.xml` (review finding, r11):
    * the DOCX path is network-admitted (the statute ingest gate), and a
    * small crafted deflate bomb would otherwise inflate unbounded and
    * escape the Nil-on-garbage containment as an OutOfMemoryError. 64 MB
    * of body XML is far beyond any real statute; past it the document
    * degrades to Nil → the S16 quarantine channel, like any other
    * undecodable input.
    */
  private[etl] val MaxDocumentXmlBytes: Int = 64 << 20

  /** Locate and decompress `word/document.xml`; None when absent,
    * undecodable, or inflating past [[MaxDocumentXmlBytes]].
    */
  private[etl] def documentXml(bytes: Array[Byte]): Option[String] =
    documentXmlOrReason(bytes).toOption

  /** The same walk with the failure CLASS on the Left — the r12
    * reason-coded-quarantine seam ([[diagnose]] reads it; `documentXml`
    * flattens it back to Option for the extraction path).
    */
  private[etl] def documentXmlOrReason(bytes: Array[Byte]): Either[String, String] =
    entryXml(bytes, DocumentEntry) match {
      case Left("missing") => Left("docx-missing-document-xml")
      case Left(other) => Left(other)
      case right => right
    }

  /** Locate and decompress ONE named zip entry — [[entriesXml]] with a
    * singleton want-set. Left("missing") when the archive parsed but
    * the entry is genuinely absent; a structurally unreadable archive
    * propagates its own reason (r12 review round 3 — a tail-truncated
    * download must not read as a valid archive lacking the OPC part).
    */
  private def entryXml(bytes: Array[Byte], name: String): Either[String, String] =
    entriesXml(bytes, Set(name)) match {
      case Left(reason) => Left(reason)
      case Right(m) => m.getOrElse(name, Left("missing"))
    }

  private def zipU16(bytes: Array[Byte], p: Int): Int =
    (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
  private def zipU32(bytes: Array[Byte], p: Int): Long =
    (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
      ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
  private def zipU64(bytes: Array[Byte], p: Int): Long =
    zipU32(bytes, p) | (zipU32(bytes, p + 4) << 32)

  /** Decompress the NAMED zip entries via the archive's CENTRAL
    * DIRECTORY (random access over the byte array), never a streaming
    * walk: `ZipInputStream.getNextEntry` drains every SKIPPED entry
    * through the inflater to reach the next header, so a deflate-bomb
    * entry anywhere before (or between) the wanted parts would cost its
    * full inflated size in discarded CPU even though its bytes were
    * never requested (r12 review round 2 — the one-walk refactor made
    * this reachable from the footnote-wired ingest path; the central
    * directory removes the whole class). Only wanted entries are ever
    * inflated, each under [[MaxDocumentXmlBytes]]
    * (Left("docx-oversize-xml") past it — every text part shares the
    * bomb ceiling; footnotes are network-admitted through the same
    * ingest gate); absent entries are absent from the map. Structural
    * anomalies — no end-of-central-directory record (the
    * tail-truncated-download shape), bad signatures, zip64 fields no
    * real .docx writer produces at the sizes the 256 MB body cap
    * admits — are Left("docx-truncated-or-corrupt"), NOT an empty map:
    * entries may literally be present in the bytes, so reporting them
    * "missing" would mislead ops triage (r12 review round 3; partial
    * RECOVERY via a streaming local-header walk is deliberately not
    * attempted — it would reintroduce the drain hole).
    */
  private[etl] def entriesXml(bytes: Array[Byte], names: Set[String])
      : Either[String, Map[String, Either[String, String]]] =
    cdEntries(bytes).map { entries =>
      val found = scala.collection.mutable.Map[String, Either[String, String]]()
      entries.foreach { e =>
        if (names(e.name) && !found.contains(e.name))
          found(e.name) =
            readEntry(bytes, e.localOff, e.method, e.compSize, e.crc)
      }
      found.toMap
    }

  /** One central-directory record — the fields both consumers need. */
  private final case class CdEntry(name: String, method: Int,
                                   compSize: Long, localOff: Long, crc: Long)

  /** THE zip central-directory parser (r12 review round 4 — a second
    * copy of the EOCD scan had appeared for name discovery; any future
    * fix must land exactly once). Returns every record in directory
    * order, no decompression; Left("docx-truncated-or-corrupt") on a
    * missing EOCD or structural anomaly (the tail-truncated-download
    * shape — see [[entriesXml]]'s scaladoc for why that's not
    * "missing").
    */
  private def cdEntries(bytes: Array[Byte]): Either[String, Seq[CdEntry]] = {
    def sigAt(p: Int, s: Long): Boolean =
      p >= 0 && p + 4 <= bytes.length && zipU32(bytes, p) == s
    try {
      // end-of-central-directory record: fixed 22 bytes + a comment of
      // up to 65535 — scan backward for its signature
      var e = bytes.length - 22
      val eMin = math.max(0, bytes.length - 22 - 65535)
      while (e >= eMin && !sigAt(e, 0x06054b50L)) e -= 1
      if (e < eMin) return Left("docx-truncated-or-corrupt")
      var cdCount: Long = zipU16(bytes, e + 10)
      var cdOffset: Long = zipU32(bytes, e + 16)
      // zip64: the 16-bit count and/or 32-bit offset at their sentinel
      // (0xFFFF / 0xFFFFFFFF) mean the REAL values live in the zip64
      // EOCD record, reached via the 20-byte locator directly preceding
      // the EOCD (APPNOTE 4.3.15). Before r14 the walk-must-complete
      // rule read the sentinel as "65535 records owed", exited at the
      // real count with i < cdCount, and quarantined a valid zip64
      // archive as corrupt (r14 advice).
      // openEnded: the walk-must-complete rule suspends — the count is
      // unknowable (a legal non-zip64 archive may hold EXACTLY 65535
      // entries, r14 review), so walk while central-directory signatures
      // continue and require the terminator to be a known tail record.
      var openEnded = false
      if (cdCount == 0xFFFFL || cdOffset == 0xFFFFFFFFL) {
        val loc = e - 20
        if (sigAt(loc, 0x07064b50L)) {
          val z64 = zipU64(bytes, loc + 8)
          if (z64 < 0 || z64 > Int.MaxValue - 56 ||
              !sigAt(z64.toInt, 0x06064b50L) || z64 + 56 > bytes.length)
            return Left("docx-truncated-or-corrupt")
          if (cdCount == 0xFFFFL) cdCount = zipU64(bytes, z64.toInt + 32)
          if (cdOffset == 0xFFFFFFFFL) cdOffset = zipU64(bytes, z64.toInt + 48)
          if (cdCount < 0 || cdCount > Int.MaxValue)
            return Left("docx-truncated-or-corrupt")
        } else if (cdCount == 0xFFFFL && cdOffset != 0xFFFFFFFFL) {
          // a real 65535-entry archive: no zip64 structures exist, the
          // 16-bit field simply saturates at its legal maximum
          openEnded = true
        } else {
          // an offset sentinel with no locator can never be real (the
          // 256 MB body cap admits no 4 GiB directory offset)
          return Left("docx-truncated-or-corrupt")
        }
      }
      if (cdOffset < 0 || cdOffset > Int.MaxValue || cdOffset > bytes.length)
        return Left("docx-truncated-or-corrupt")
      val out = Seq.newBuilder[CdEntry]
      var p = cdOffset.toInt
      var i = 0L
      val walkLimit = if (openEnded) Long.MaxValue else cdCount
      while (i < walkLimit && sigAt(p, 0x02014b50L) && p + 46 <= bytes.length) {
        val nameLen = zipU16(bytes, p + 28)
        val extraLen = zipU16(bytes, p + 30)
        val commentLen = zipU16(bytes, p + 32)
        if (p + 46 + nameLen <= bytes.length)
          out += CdEntry(
            new String(bytes, p + 46, nameLen, StandardCharsets.UTF_8),
            zipU16(bytes, p + 10), zipU32(bytes, p + 20),
            zipU32(bytes, p + 42), zipU32(bytes, p + 16))
        p += 46 + nameLen + extraLen + commentLen
        i += 1
      }
      // the walk must COMPLETE: exiting on a bad signature or bounds with
      // records still owed (i < cdCount per the intact EOCD) is the
      // corrupt-directory shape, and returning the partial prefix would
      // misreport physically-present entries as "missing" — verified
      // live in r12's ops triage, where a corrupted FIRST record made a
      // document with word/document.xml present diagnose as
      // 'docx-missing-document-xml' (r13 advice)
      if (openEnded) {
        // the saturated-count ambiguity justifies acceptance ONLY when
        // the archive really holds 65535 entries (the one legal non-zip64
        // shape with this field value) AND the walk terminated on the
        // EOCD; a 2-entry archive with FF FF count is a corrupted EOCD,
        // not a legal saturation (r14 review round 2 — accepting it
        // reopens the present-entries-reported-missing triage confusion)
        if (i == 0xFFFFL && p == e) Right(out.result())
        else Left("docx-truncated-or-corrupt")
      }
      else if (i < cdCount) Left("docx-truncated-or-corrupt")
      else Right(out.result())
    } catch { case _: Exception => Left("docx-truncated-or-corrupt") }
  }

  /** One entry's data via its LOCAL header (r12 — [[entriesXml]]'s
    * random-access read): the central directory's sizes are
    * authoritative (a streamed writer leaves the local sizes 0 with a
    * data descriptor), the local header's own name/extra lengths locate
    * the data. Stored (0) and deflate (8) cover every real .docx writer.
    *
    * The decoded bytes are verified against the central directory's
    * CRC-32 (r16, found by the seed-sweep fuzzer): raw deflate carries
    * NO integrity check of its own, so a single damaged byte that lands
    * in a deflate LITERAL — an RC4-decrypted package with one flipped
    * ciphertext byte, storage rot on a staged binary — inflates
    * "successfully" into silently corrupted text; stored entries have
    * no check at all. A mismatch quarantines as `docx-crc-mismatch`
    * instead of landing one wrong character in the GOOD channel.
    */
  private def readEntry(bytes: Array[Byte], localOff: Long, method: Int,
                        compSize: Long, crc: Long): Either[String, String] = {
    if (localOff > Int.MaxValue || localOff + 30 > bytes.length ||
        zipU32(bytes, localOff.toInt) != 0x04034b50L)
      return Left("docx-bad-local-header")
    val lo = localOff.toInt
    val dataOff = lo + 30 + zipU16(bytes, lo + 26) + zipU16(bytes, lo + 28)
    if (compSize > Int.MaxValue || dataOff + compSize > bytes.length)
      return Left("docx-bad-local-header")
    val len = compSize.toInt
    def checked(data: Array[Byte]): Either[String, String] = {
      val c = new java.util.zip.CRC32()
      c.update(data)
      if (c.getValue != crc) Left("docx-crc-mismatch")
      else Right(new String(data, StandardCharsets.UTF_8))
    }
    method match {
      case 0 => // stored
        if (len > MaxDocumentXmlBytes) Left("docx-oversize-xml")
        else checked(java.util.Arrays.copyOfRange(bytes, dataOff,
          dataOff + len))
      case 8 => // deflate, raw (nowrap)
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(bytes, dataOff, len)
          val out = new java.io.ByteArrayOutputStream(8192)
          val buf = new Array[Byte](8192)
          // a nowrap Inflater may need ONE dummy byte after the real
          // input to flush its final block (Inflater javadoc)
          var fedDummy = false
          var done = false
          while (!done) {
            val n = inf.inflate(buf)
            if (n > 0) {
              if (out.size() + n > MaxDocumentXmlBytes)
                return Left("docx-oversize-xml")
              out.write(buf, 0, n)
            } else if (inf.finished()) done = true
            else if (inf.needsInput() && !fedDummy) {
              inf.setInput(Array[Byte](0)); fedDummy = true
            } else
              // truncated/corrupt deflate data: the stream consumed all
              // input without reaching its end marker — returning the
              // partial text as success would land a silently-clipped
              // document in the GOOD channel (r12 review round 3)
              return Left("docx-undecodable-entry")
          }
          checked(out.toByteArray)
        } catch { case _: Exception => Left("docx-undecodable-entry") }
        finally inf.end()
      case _ => Left("docx-unsupported-compression")
    }
  }

  /** Why a DOCX yielded no text (VERDICT r11 item 3): bytes that are
    * not a zip archive at all (`not-a-docx` — ZipInputStream returns
    * null on unrecognized bytes rather than throwing, so without the
    * magic check a saved HTML error page would misleadingly read
    * `docx-missing-document-xml`; r12 review), a zip without
    * `word/document.xml` (not an OPC word document, or a renamed
    * plain archive), a body XML inflating past the deflate-bomb
    * ceiling, a zip that fails to decompress, a decoded entry whose
    * bytes fail the central directory's CRC-32
    * (`docx-crc-mismatch` — r16: damaged-but-inflatable deflate
    * literals and flipped stored bytes must not read as clean text) —
    * else the body was decodable and simply empty.
    */
  /** This codec with a caller-supplied document password (r15):
    * CFB-wrapped encrypted packages decrypt via [[OoxmlDecrypt]]
    * (ECMA-376 agile + standard schemes) and feed the decrypted OPC
    * zip back through the normal extraction; everything else is
    * untouched. Empty string = no-op, per the trait contract.
    */
  override def withPassword(password: String): PageExtractor =
    if (password.isEmpty) this else PasswordedDocxExtractor(password)

  override def diagnose(bytes: Array[Byte]): String =
    diagnose(bytes, includeFootnotes = false, includeHeaders = false,
      includeFooters = false)

  /** Diagnosis must consider the SAME included parts extraction
    * decoded (r17 review round 3 — the .doc invariant): with the
    * footnote/header/footer opt-ins, a part-integrity failure names
    * itself instead of reading `empty-text`. The base codec (all
    * opt-ins off) keeps its historical behavior exactly.
    */
  private[etl] def diagnose(bytes: Array[Byte], includeFootnotes: Boolean,
                            includeHeaders: Boolean,
                            includeFooters: Boolean): String =
    try {
      if (looksLikeEncryptedOoxml(bytes)) "encrypted" // CFB-wrapped (r15)
      else if (!looksLikeZip(bytes)) "not-a-docx"
      else documentXmlOrReason(bytes) match {
        case Left(reason) => reason
        case Right(_) =>
          extractPagesOrPartReason(bytes, includeFootnotes, includeHeaders,
            includeFooters) match {
            case Left(reason) => reason
            case Right(_) => "empty-text"
          }
      }
    } catch { case _: Exception => "docx-unreadable" }

  /** Page assembly rules (review findings, r11 ×2): an EXPLICIT page
    * break always ends a page, so intentionally blank interior pages
    * survive as `""` — the keepEmptyPages/mcp-parity contract the ingest
    * server documents (the PDF path keeps `""` pages the same way).
    * `<w:lastRenderedPageBreak/>` is a RENDER marker, not content: it
    * ends a page only when the page has non-whitespace text — a
    * Word-saved manual break carries BOTH markers (`<w:br
    * w:type="page"/>` then `<w:lastRenderedPageBreak/>` at the next
    * paragraph's head), and honoring the second would mint a phantom
    * blank page per manual break; its whitespace-only prefix (the broken
    * paragraph's ¶ mark) is dropped so the new page starts clean. The
    * DELIBERATE narrowing this buys (signed off, r11 review): a blank
    * page that exists only in Word's own pagination (empty paragraphs
    * straddling a rendered break, no manual break anywhere) merges away
    * — the two cases are indistinguishable in the token stream, and a
    * phantom page per manual break is the worse artifact for page-count
    * and content contracts. Blank pages survive EXACTLY when explicit
    * (`<w:br w:type="page"/>`). A
    * trailing break creates no page (Word renders none), and a document
    * whose pages are ALL blank returns Nil — the no-text/garbage
    * contract that routes it to quarantine.
    */
  private[etl] def pagesFromXml(xml: String): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    def page(): String = { val t = cur.toString.stripLineEnd; cur.clear(); t }
    TokenRe.findAllMatchIn(xml).foreach { m =>
      val tok = m.matched
      if (m.group(1) != null) cur ++= unescape(m.group(1))
      else if (tok.startsWith("<w:tab")) cur += '\t'
      else if (tok.startsWith("<w:lastRenderedPageBreak")) {
        val p = page()
        if (p.trim.nonEmpty) pages += p // render marker: never a blank page
      }
      else if (tok.contains("w:type=\"page\"")) {
        val p = page()
        pages += (if (p.trim.isEmpty) "" else p) // blank page survives as ""
      }
      else cur += '\n' // </w:p>, <w:br/> variants, <w:cr/>
    }
    val t = page()
    if (t.trim.nonEmpty) pages += t
    if (pages.forall(_.trim.isEmpty)) Nil else pages.toSeq
  }

  /** True iff the bytes start with the ZIP local-file-header magic
    * (every OPC/.docx container does). Content-based, not name-based —
    * the [[SniffingExtractor]] routing key.
    */
  def looksLikeZip(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 0x03 && bytes(3) == 0x04

  /** Password-protected OOXML (r15): an encrypted `.docx` is NOT a zip
    * — Word wraps the AES-encrypted package in an OLE/CFB compound
    * file whose DIRECTORY carries an `EncryptionInfo` stream. The
    * detection parses the CFB structure and confirms that directory
    * entry (review r15 round 3: a whole-file byte scan for the
    * UTF-16LE name false-positived on a legacy binary `.doc` whose
    * BODY TEXT merely contained the word, and duplicated the CFB
    * magic check the r11 one-place rule forbids — both the magic and
    * the walk live in [[OoxmlDecrypt]] now). Legacy `.doc` files
    * (same magic, `WordDocument` stream, no EncryptionInfo entry) are
    * NOT this codec's: they carry no EncryptionInfo, so this probe
    * misses them — standalone they read `not-a-docx`, and the sniffing
    * router routes them to [[DocExtractor]] (r17) by their
    * `WordDocument` entry instead. Cost on the extract hot path is one
    * 8-byte
    * magic check for non-CFB rows; CFB rows pay a bounded directory
    * walk, no decompression.
    */
  def looksLikeEncryptedOoxml(bytes: Array[Byte]): Boolean =
    OoxmlDecrypt.hasEncryptionInfo(bytes)

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

/** The opt-in parts as a pluggable extractor (VERDICT r11 item 7; r13
  * completes the family with footers) — wire it where a corpus's content
  * lives outside the body:
  * `Pipeline.process(..., DocxPartsExtractor(footnotes = true))` or
  * `SniffingExtractor(docx = DocxPartsExtractor(headers = true))`.
  * Body-only [[DocxExtractor]] stays the default everywhere; headers
  * and footers default off even here (usually boilerplate chrome — see
  * the extractPages scaladoc). Footers map to the LAST page, below the
  * footnote block — the mirror of the headers-on-first-page rule.
  */
final case class DocxPartsExtractor(footnotes: Boolean = false,
                                    headers: Boolean = false,
                                    footers: Boolean = false)
    extends PageExtractor {
  def extractPages(bytes: Array[Byte]): Seq[String] =
    DocxExtractor.extractPages(bytes, footnotes, headers, footers)
  override def diagnose(bytes: Array[Byte]): String =
    DocxExtractor.diagnose(bytes, footnotes, headers, footers)
  // the passworded wrapper decrypts and re-routes through THIS codec,
  // so the opt-in parts survive the password path (review r15 round 3:
  // the trait's no-op default silently dropped the password here while
  // diagnose still read `encrypted`)
  override def withPassword(password: String): PageExtractor =
    if (password.isEmpty) this
    else PasswordedDocxExtractor(password, this)
}

/** The footnote-including variant (the common statute wiring — statutes
  * cite in footnotes).
  */
case object DocxWithFootnotesExtractor extends PageExtractor {
  def extractPages(bytes: Array[Byte]): Seq[String] =
    DocxExtractor.extractPages(bytes, includeFootnotes = true)
  override def diagnose(bytes: Array[Byte]): String =
    DocxExtractor.diagnose(bytes, includeFootnotes = true,
      includeHeaders = false, includeFooters = false)
  override def withPassword(password: String): PageExtractor =
    if (password.isEmpty) this
    else PasswordedDocxExtractor(password, this)
}

/** [[DocxExtractor]] carrying a caller-supplied document password
  * (r15) — the DOCX face of `PageExtractor.withPassword`, the twin of
  * [[PasswordedPdfExtractor]]. An encrypted OOXML container (CFB +
  * EncryptionInfo) decrypts through [[OoxmlDecrypt]] and the recovered
  * OPC zip flows through the normal extraction/diagnosis; a wrong
  * password (or an unsupported scheme) keeps the `encrypted`
  * quarantine; plain zips ignore the password entirely. Stateless and
  * Serializable like every PageExtractor.
  */
final case class PasswordedDocxExtractor(password: String,
    inner: PageExtractor = DocxExtractor) extends PageExtractor {
  // last-(document, outcome) memo (review r15 rounds 3+4): the ingest
  // route runs extractPages and then, on an empty result, diagnose —
  // in SEPARATE UDF invocations whose byte arrays are fresh copies
  // deserialized per call, so an identity-keyed memo never hit there
  // (round 4) and the spin-count KDF ran twice per quarantined upload.
  // Keyed on (length, MD5) instead — milliseconds against a KDF worth
  // seconds — and storing only the OUTCOME, never the input bytes.
  // One entry suffices (the two calls arrive back-to-back); transient
  // (rebuilt empty per executor/deserialization).
  @transient private lazy val lastDecrypt =
    new java.util.concurrent.atomic.AtomicReference[
      ((Long, String), Option[Array[Byte]])]()
  private def decrypt(bytes: Array[Byte]): Option[Array[Byte]] = {
    val key = (bytes.length.toLong,
      java.util.Base64.getEncoder.encodeToString(
        java.security.MessageDigest.getInstance("MD5").digest(bytes)))
    val cached = lastDecrypt.get()
    if (cached != null && cached._1 == key) cached._2
    else {
      val r = OoxmlDecrypt.decryptPackage(bytes, password)
      lastDecrypt.set((key, r))
      r
    }
  }
  def extractPages(bytes: Array[Byte]): Seq[String] =
    if (DocxExtractor.looksLikeEncryptedOoxml(bytes))
      decrypt(bytes).map(inner.extractPages).getOrElse(Nil)
    else inner.extractPages(bytes)
  override def diagnose(bytes: Array[Byte]): String =
    if (DocxExtractor.looksLikeEncryptedOoxml(bytes))
      // a RIGHT password moves the reason past `encrypted` to whatever
      // actually blocked the text inside the decrypted package
      decrypt(bytes).map(inner.diagnose).getOrElse("encrypted")
    else inner.diagnose(bytes)
  override def withPassword(p: String): PageExtractor =
    if (p.isEmpty || p == password) this
    else PasswordedDocxExtractor(p, inner)
}
