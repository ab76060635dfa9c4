package graft.etl

import java.nio.charset.StandardCharsets
import scala.util.matching.Regex

/** Best-effort pure-JVM PDF text extractor (no external deps — the
  * zero-egress answer to SURVEY §7.4). Handles the dominant
  * machine-generated-PDF shape:
  *   - stream filters applied as a declared CHAIN (`/Filter` name or
  *     array): FlateDecode (java.util.zip.Inflater), LZWDecode (9→12-bit
  *     MSB-first codes, clear=256/EOD=257, `/EarlyChange` honored),
  *     ASCIIHexDecode, ASCII85Decode, RunLengthDecode — plus PNG
  *     `/Predictor` 10–15 and TIFF 2 un-filtering from per-stage
  *     `/DecodeParms` after the decompressor (the xref-stream shape),
  *   - per-font /ToUnicode CMaps (bfchar + bfrange) mapping 2-byte CIDs to
  *     Unicode — which is how the reference corpus encodes Amharic,
  *   - `(…) Tj` literal and `[ <hex> (lit) … ] TJ` array show-text
  *     operators, with the current font tracked via `/Fn … Tf`.
  * One page per content stream containing a text block (matches the
  * reference volumes). Never throws on garbage — returns Nil.
  * Extracts the real Ethiopic text of /root/reference/vol01.pdf (asserted
  * in PipelineSpec); LZW and predictor paths are fixture-tested
  * (MultimodalSpec, FlatePdfLzwSpec — decoder pinned against the PDF
  * spec's own LZWDecode worked example).
  *
  * Encrypted documents (r13, [[PdfDecrypt]]): the Standard security
  * handler with an EMPTY user password — R2/R3/R4 RC4, R4 AESV2,
  * R5/R6 AESV3 — decrypts transparently before filter decoding (the
  * owner-locked shape every viewer opens silently; pdfminer under the
  * reference's pdfplumber opens it too). Password-protected documents
  * stay quarantined with the `encrypted` reason.
  *
  * Declared out of scope (environment-bound — no pdfbox/tika in the
  * container, SURVEY §7.4): DCTDecode/JPXDecode raster text (needs OCR),
  * JBIG2/CCITT fax images, and the /Crypt stream filter; streams
  * with those filters decode to None and are skipped.
  */
object FlatePdfExtractor extends PageExtractor {

  private val ObjHeaderRe: Regex = """(\d+)\s+0\s+obj""".r
  private val TfRe: Regex = """/(\w+)\s+[\d.]+\s+Tf""".r
  private val TjRe: Regex = """\(((?:[^()\\]++|\\.)*+)\)\s*Tj""".r
  private val TJCloseRe: Regex = """\]\s*TJ""".r
  private val HexRe: Regex = """<([0-9A-Fa-f]+)>""".r
  private val LitRe: Regex = """\(((?:[^()\\]++|\\.)*+)\)""".r
  private val HexPairRe: Regex = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
  private val RangeTripleRe: Regex =
    """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r

  /** Decompression ceiling PER STREAM (r12 — the DOCX MaxDocumentXmlBytes
    * lesson applied to the network-admitted PDF path): Flate expands up
    * to ~1000×, LZW up to ~4000× via table-entry replay, RunLength 128×,
    * so a small crafted upload could otherwise materialize gigabytes.
    * Past the ceiling a stream decodes to None — the same per-stream
    * graceful degrade as an unsupported filter.
    */
  private[etl] val MaxDecodedStreamBytes: Int = 64 << 20

  /** Every `open(.*?)close` segment body in ONE linear pass — the
    * lazy-dot regex costs O(openings × tail) on crafted close-less input
    * (the DOCX `<w:t>` CPU-bomb class, r11/r12 reviews): each failing
    * attempt rescans to end-of-input. Pairing each `open` with the first
    * `close` after it and resuming past the pair reproduces the regex's
    * match set exactly, in O(n).
    */
  private[etl] def lazySegments(hay: String, open: String,
                                close: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = hay.indexOf(open)
    while (p >= 0) {
      val c = hay.indexOf(close, p + open.length)
      if (c < 0) p = -1
      else {
        out += hay.substring(p + open.length, c)
        p = hay.indexOf(open, c + close.length)
      }
    }
    out.toSeq
  }

  /** (objNum, dictText, streamDataStart | −1) per `N 0 obj` header, in
    * one linear pass (r12 — replaces the lazy-dot ObjRe/StreamRe pair,
    * which was O(headers × tail) on terminator-less crafted input AND
    * copied the whole remaining document per stream object via
    * `substring(m.start)`). Each header's dict runs to its first
    * `stream`-EOL marker or `endobj`, clamped at the NEXT header: on
    * well-formed documents the terminator always comes first, so the
    * clamp only bounds adversarial input (a terminator-less object is
    * skipped instead of swallowing its successors). `streamDataStart`
    * points just past the marker EOL; −1 for dict-only objects.
    */
  private def objSlices(raw: String): Seq[(Int, String, Int)] = {
    // toIntOption, not toInt: the object number is attacker-controlled
    // and unbounded — one crafted `99999999999 0 obj` header must skip,
    // not throw NumberFormatException and abort the WHOLE document's
    // extraction to Nil with a misleading 'empty-text' diagnosis (r13
    // advice; the DOCX HeaderNameRe \d{1,6} fix for the same class)
    val hs = ObjHeaderRe.findAllMatchIn(raw)
      .flatMap(m => m.group(1).toIntOption.map(n => (n, m.start, m.end)))
      .toVector
    if (hs.isEmpty) return Nil
    // ALL terminator positions up front (one linear sweep each), so the
    // per-header resolution is a binary search: a per-header indexOf
    // still scans to the first occurrence even when it lies far past the
    // clamp — with 300k crafted headers and one real `endobj` at EOF
    // that re-opened the O(headers × tail) hole the clamp exists to
    // close (caught by the CodecBombSpec pin).
    val endobjs = {
      val b = Vector.newBuilder[Int]
      var p = raw.indexOf("endobj")
      while (p >= 0) { b += p; p = raw.indexOf("endobj", p + 6) }
      b.result()
    }
    // `stream` + framing EOL only (bare `stream` tokens — e.g. inside
    // names or `endstream` — don't terminate a dict; the old regex
    // required the EOL too). (markerIdx, dataStart) pairs.
    val markers = {
      val b = Vector.newBuilder[(Int, Int)]
      var p = raw.indexOf("stream")
      while (p >= 0) {
        val a = p + 6
        if (a < raw.length && raw.charAt(a) == '\n') b += ((p, a + 1))
        else if (a + 1 < raw.length && raw.charAt(a) == '\r' &&
                 raw.charAt(a + 1) == '\n') b += ((p, a + 2))
        p = raw.indexOf("stream", p + 1)
      }
      b.result()
    }
    def lowerBound(size: Int, posAt: Int => Int, from: Int): Int = {
      var lo = 0; var hi = size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (posAt(mid) < from) lo = mid + 1 else hi = mid
      }
      lo
    }
    hs.indices.flatMap { i =>
      val (num, _, dictStart) = hs(i)
      val clamp = if (i + 1 < hs.size) hs(i + 1)._2 else raw.length
      val endobjIdx = {
        val j = lowerBound(endobjs.size, endobjs(_), dictStart)
        if (j < endobjs.size && endobjs(j) < clamp) endobjs(j) else -1
      }
      val (markerIdx, dataStart) = {
        val j = lowerBound(markers.size, markers(_)._1, dictStart)
        if (j < markers.size && markers(j)._1 < clamp) markers(j) else (-1, -1)
      }
      if (markerIdx < 0 && endobjIdx < 0) None
      else if (markerIdx >= 0 && (endobjIdx < 0 || markerIdx < endobjIdx))
        Some((num, raw.substring(dictStart, markerIdx), dataStart))
      else Some((num, raw.substring(dictStart, endobjIdx), -1))
    }
  }

  /** `trailer << … >>` dict bodies, linear (replaces the lazy-dot
    * TrailerDictRe — same CPU-bomb class as [[objSlices]]).
    */
  private def trailerDicts(raw: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = raw.indexOf("trailer")
    while (p >= 0) {
      var q = p + 7
      while (q < raw.length && Character.isWhitespace(raw.charAt(q))) q += 1
      if (q + 1 < raw.length && raw.charAt(q) == '<' && raw.charAt(q + 1) == '<') {
        val close = raw.indexOf(">>", q + 2)
        if (close < 0) p = -1
        else { out += raw.substring(q + 2, close)
               p = raw.indexOf("trailer", close + 2) }
      } else p = raw.indexOf("trailer", p + 7)
    }
    out.toSeq
  }

  def extractPages(bytes: Array[Byte]): Seq[String] = {
    try extract(bytes, "")
    catch { case _: Exception => Nil }
  }

  /** Password-supplied extraction (r15, VERDICT #1) — the pdfminer
    * `password=` parity surface. The password is offered to the
    * Standard security handler as user-then-owner ([[PdfDecrypt.open]]);
    * unencrypted documents ignore it entirely.
    */
  private[etl] def extractPages(bytes: Array[Byte],
                                password: String): Seq[String] = {
    try extract(bytes, password)
    catch { case _: Exception => Nil }
  }

  /** This codec with a caller-supplied document password. Empty string
    * returns `this` — the password-free singleton path stays allocation-
    * and behavior-identical.
    */
  override def withPassword(password: String): PageExtractor =
    if (password.isEmpty) this else PasswordedPdfExtractor(password)

  private val EncryptKeyRe: Regex = """/Encrypt\s*(?:\d+\s+\d+\s+R|<<)""".r
  private val EncryptRefRe: Regex = """/Encrypt\s+(\d+)\s+\d+\s+R""".r
  // direct form only: the lookahead rejects the indirect `/Length N 0 R`;
  // the quantifier is POSSESSIVE — a backtrackable \d+ would shrink the
  // capture to a digit-prefix of N ('/Length 20 0 R' matching '2') and
  // smuggle the indirect form past the lookahead (r13 review round 2)
  private val LengthRe: Regex = """/Length\s+(\d++)(?!\s+\d+\s+R)""".r

  /** The decryption context for an encrypted document the EMPTY user
    * password opens (r13 — the owner-locked shape every viewer opens
    * silently; pdfminer under the reference's pdfplumber opens it too,
    * so this is parity). None when the document is really
    * password-protected, uses a non-Standard handler, or spells the
    * Encrypt dict inline (rare; those keep the `encrypted` quarantine).
    * The /ID needed by key derivation lives in the SAME dict that
    * carries the /Encrypt ref (classic trailer or xref-stream dict), so
    * that dict leads the search text.
    */
  private def openEncryption(raw: String, slices: Seq[(Int, String, Int)],
      password: String): Option[PdfDecrypt.Ctx] = {
    // cheap gate first: virtually all corpus PDFs are unencrypted and
    // must not pay the trailer walk + per-dict regex probe (r13 review)
    if (!raw.contains("/Encrypt")) return None
    // LAST occurrences win throughout IN RAW BYTE ORDER: an
    // incrementally-updated PDF appends its live trailer and rewritten
    // objects at the end, and extract's objs map is last-wins — key
    // derivation must read the same revision. The last /Encrypt REF in
    // the raw text is the live one regardless of whether it sits in a
    // classic trailer or an xref-stream dict (r13 review round 2: a
    // carrier list built as trailers-then-slices let a stale rev-1
    // xref dict beat a newer appended classic trailer).
    val num = EncryptRefRe.findAllMatchIn(raw).toSeq.lastOption
      .flatMap(_.group(1).toIntOption)
    num.flatMap { n =>
      slices.filter(_._1 == n).lastOption.flatMap { case (_, encDict, _) =>
        // /ID's FIRST element — the one key derivation uses — is
        // revision-INVARIANT by spec (§14.4: only the second element
        // changes on update), so any carrier's /ID serves; trailers
        // lead the search text, xref-ish dicts follow.
        val idText = (trailerDicts(raw) ++
          slices.map(_._2).filter(_.contains("/ID"))).mkString(" ")
        PdfDecrypt.open(encDict, idText, password)
      }
    }
  }

  /** Why a document yielded no text (VERDICT r11 item 3 — reason-coded
    * quarantine). Runs ONLY on already-quarantined rows (the S16 rare
    * path), so it re-parses structure but never re-decodes streams:
    *   - `encrypted` — an `/Encrypt` key in a trailer or object dict
    *     (classic-trailer and xref-stream-dict spellings both land in
    *     the [[objSlices]]/[[trailerDicts]] text),
    *   - `unsupported-filter:<A+B>` — every declared stream filter
    *     outside [[SupportedFilters]] (DCTDecode scans, JBIG2/CCITT fax,
    *     Crypt, JPX), sorted and `+`-joined so a mixed raster doc reads
    *     deterministically,
    *   - `not-a-pdf` — no `%PDF` magic,
    *   - `empty-text` — structurally decodable, just nothing to extract
    *     (whitespace-only show-text, or no text operators at all).
    */
  override def diagnose(bytes: Array[Byte]): String = diagnose(bytes, "")

  /** Password-aware diagnosis (r15): the same reason codes, with the
    * caller's password offered to the handler — a RIGHT password moves
    * the reason past `encrypted` to whatever actually blocked the text;
    * a wrong one keeps `encrypted`.
    */
  private[etl] def diagnose(bytes: Array[Byte], password: String): String = {
    try {
      if (!PageExtractor.looksLikePdf(bytes)) return "not-a-pdf"
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      val slices = objSlices(raw)
      val dicts = trailerDicts(raw) ++ slices.map(_._2)
      // `encrypted` now means PASSWORD-PROTECTED: an /Encrypt key whose
      // empty-user-password open fails (r13 — empty-password documents
      // extract, so a quarantined one fell through for another reason
      // and gets that reason's code)
      if (dicts.exists(d => EncryptKeyRe.findFirstIn(d).isDefined) &&
          openEncryption(raw, slices, password).isEmpty) "encrypted"
      else {
        // only STREAM-BEARING dicts contribute filter names: a
        // dict-only /Filter is a different vocabulary — the Encrypt
        // dict's /Filter /Standard names the security handler, not a
        // codec (r13, surfaced by the empty-password diagnose path)
        val unsupported = slices.filter(_._3 >= 0).map(_._2)
          .flatMap(filterNames)
          .filterNot(SupportedFilters).distinct.sorted
        if (unsupported.nonEmpty)
          unsupported.mkString("unsupported-filter:", "+", "")
        else "empty-text"
      }
    } catch { case _: Exception => "empty-text" }
  }

  /** The raster-loss visibility count (VERDICT r13 item 4): how many
    * stream objects extraction SKIPPED per unsupported filter name —
    * DCTDecode/JBIG2Decode/CCITTFaxDecode scans (the no-OCR exclusion),
    * Crypt, JPX. Unlike [[diagnose]] (quarantine-only) this runs on
    * GOOD-channel documents too, because a half-scanned volume yields
    * its text pages and passes the S11 gate — the loss is silent without
    * this count. Same structure-only re-parse cost as diagnose (object
    * headers + dict slices, zero stream decoding); a stream declaring
    * several unsupported filters counts once per name.
    */
  override def skippedStreams(bytes: Array[Byte]): Map[String, Int] = {
    try {
      if (!PageExtractor.looksLikePdf(bytes)) return Map.empty
      val raw = new String(bytes, StandardCharsets.ISO_8859_1)
      objSlices(raw).filter(_._3 >= 0).map(_._2)
        .flatMap(d => filterNames(d).filterNot(SupportedFilters).distinct)
        .groupBy(identity).view.mapValues(_.size).toMap
    } catch { case _: Exception => Map.empty }
  }

  /** The EOL between stream data and `endstream` is FRAMING, not data
    * (ISO 32000 §7.3.8.1) — strip exactly one marker, at extraction time
    * only. Decoders must NOT strip EOLs themselves: chained stages see
    * exact decoded intermediates where a trailing 0x0A/0x0D is a real
    * payload byte (inflate stops at the zlib end marker and LZW at the
    * EOD code, so residual framing never corrupts them anyway).
    */
  private def stripFramingEol(data: Array[Byte]): Array[Byte] = {
    val n = data.length
    if (n >= 2 && data(n - 2) == '\r' && data(n - 1) == '\n')
      java.util.Arrays.copyOf(data, n - 2)
    else if (n >= 1 && (data(n - 1) == '\n' || data(n - 1) == '\r'))
      java.util.Arrays.copyOf(data, n - 1)
    else data
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(data, 0, data.length)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return Some(out.toByteArray) // stalled
        out.write(buf, 0, n)
        if (out.size > MaxDecodedStreamBytes) return None // deflate bomb
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** PDF/TIFF-variant LZW: MSB-first bit packing, 9→12-bit codes,
    * 256 = clear-table, 257 = EOD; `earlyChange` widens the code one
    * entry early (the PDF default, 1). Decoder behavior is pinned in
    * FlatePdfLzwSpec against the LZWDecode worked example in the PDF
    * spec (45×5 65 45×3 66 ⇄ codes 256,45,258,258,65,259,66,257).
    */
  private[etl] def lzwDecode(data: Array[Byte],
                             earlyChange: Int = 1): Option[Array[Byte]] = {
    try {
      val end = data.length // EOD (257) terminates; never strip trailing bytes
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val table = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
      def reset(): Unit = {
        table.clear()
        var i = 0
        while (i < 258) { table += Array((i & 0xff).toByte); i += 1 } // 256/257 are control slots, never emitted
      }
      reset()
      var width = 9
      var prev: Array[Byte] = null
      var bitBuf = 0L; var nBits = 0; var i = 0; var done = false
      while (!done) {
        while (nBits < width && i < end) {
          bitBuf = (bitBuf << 8) | (data(i) & 0xffL); nBits += 8; i += 1
        }
        if (nBits < width) done = true // ran out of input before EOD — emit what we have
        else {
          val code = ((bitBuf >>> (nBits - width)) & ((1L << width) - 1)).toInt
          nBits -= width
          if (code == 256) { reset(); width = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry: Array[Byte] =
              if (code < table.length) table(code)
              else if (prev != null && code == table.length) prev :+ prev(0) // KwKwK
              else return None // corrupt stream
            out.write(entry)
            if (out.size > MaxDecodedStreamBytes) return None // LZW bomb
            if (prev != null) table += (prev :+ entry(0))
            prev = entry
            if (table.length >= (1 << width) - earlyChange && width < 12) width += 1
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** RunLengthDecode (ISO 32000 §7.4.5): length byte L — 0..127 copies
    * the next L+1 bytes literally, 129..255 repeats the next byte
    * 257−L times, 128 is EOD.
    */
  private def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 2)
      var i = 0; var done = false
      while (i < data.length && !done) {
        val l = data(i) & 0xff
        if (l == 128) done = true
        else if (l < 128) {
          if (i + 1 + l + 1 > data.length) return None // truncated literal run
          out.write(data, i + 1, l + 1); i += l + 1
        } else {
          if (i + 1 >= data.length) return None // truncated repeat run
          var n = 257 - l
          while (n > 0) { out.write(data(i + 1)); n -= 1 }
          i += 1
        }
        if (out.size > MaxDecodedStreamBytes) return None // 128× RL bomb
        i += 1
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** ASCII85Decode (ISO 32000 §7.4.3): 5 chars '!'..'u' → 4 bytes base-85
    * big-endian; 'z' is a 4-zero-byte shortcut (only between groups);
    * `~>` is EOD; a final partial group of n chars yields n−1 bytes
    * (pad with 'u', drop the padding bytes). Whitespace ignored.
    */
  private def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
      val grp = new Array[Int](5)
      var n = 0; var i = 0; var done = false
      // a leading <~ (non-PDF but common in the wild) is tolerated
      if (data.length >= 2 && data(0) == '<' && data(1) == '~') i = 2
      def flush(chars: Int): Boolean = {
        if (chars == 1) return false // 1 leftover char is malformed
        var v = 0L
        var k = 0
        while (k < 5) { v = v * 85 + (if (k < chars) grp(k) else 84); k += 1 }
        if (v > 0xffffffffL) return false // group decodes above 2^32
        var b = 3
        while (b >= 0) {
          if (3 - b < chars - 1) out.write(((v >>> (8 * b)) & 0xff).toInt)
          b -= 1
        }
        true
      }
      while (i < data.length && !done) {
        val c = data(i).toChar
        if (c == '~') done = true
        else if (c == 'z' && n == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
        else if (c >= '!' && c <= 'u') {
          grp(n) = c - '!'; n += 1
          if (n == 5) { if (!flush(5)) return None; n = 0 }
        } else if (!c.isWhitespace) return None
        i += 1
      }
      if (n > 0 && !flush(n)) return None
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(data.length / 2)
      var hi = -1; var i = 0; var done = false
      while (i < data.length && !done) {
        val c = data(i).toChar
        if (c == '>') done = true
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) { if (hi < 0) hi = d else { out.write(hi << 4 | d); hi = -1 } }
          else if (!c.isWhitespace) return None
        }
        i += 1
      }
      if (hi >= 0) out.write(hi << 4) // odd final digit: low nibble 0 (spec)
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  private val PredRe = """/Predictor\s+(\d+)""".r
  private val ColsRe = """/Columns\s+(\d+)""".r
  private val ColorsRe = """/Colors\s+(\d+)""".r
  private val BpcRe = """/BitsPerComponent\s+(\d+)""".r
  private val EarlyRe = """/EarlyChange\s+(\d+)""".r

  /** Un-apply the `/DecodeParms` predictor after decompression: PNG
    * row filters 10–15 (per-row filter byte: None/Sub/Up/Average/Paeth
    * — the xref-stream shape, usually Up=12) and TIFF predictor 2
    * (8-bit horizontal differencing). Predictor 1/absent = identity.
    */
  private[etl] def unpredict(dict: String, data: Array[Byte]): Array[Byte] = {
    def intOf(re: Regex, dflt: Int) =
      // toIntOption: attacker-controlled digits must skip, not abort the
      // whole document via NumberFormatException (r13 review — the
      // objSlices class)
      re.findFirstMatchIn(dict).flatMap(_.group(1).toIntOption)
        .getOrElse(dflt)
    val pred = intOf(PredRe, 1)
    if (pred <= 1) return data
    val cols = intOf(ColsRe, 1)
    val colors = intOf(ColorsRe, 1)
    val bpc = intOf(BpcRe, 8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (cols * colors * bpc + 7) / 8
    if (pred == 2) { // TIFF horizontal differencing (8-bit components)
      if (bpc != 8) return data
      val out = data.clone()
      var r = 0
      while ((r + 1) * rowLen <= out.length) {
        var j = bpp
        while (j < rowLen) {
          out(r * rowLen + j) =
            ((out(r * rowLen + j) + out(r * rowLen + j - bpp)) & 0xff).toByte
          j += 1
        }
        r += 1
      }
      out
    } else { // PNG predictors: filter byte prefixes each row
      val nRows = data.length / (rowLen + 1)
      val out = new Array[Byte](nRows * rowLen)
      var r = 0
      while (r < nRows) {
        val ft = data(r * (rowLen + 1)) & 0xff
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        var j = 0
        while (j < rowLen) {
          val raw = data(src + j) & 0xff
          val left = if (j >= bpp) out(dst + j - bpp) & 0xff else 0
          val up = if (r > 0) out(dst - rowLen + j) & 0xff else 0
          val ul = if (r > 0 && j >= bpp) out(dst - rowLen + j - bpp) & 0xff else 0
          val v = ft match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) >> 1)
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => raw
          }
          out(dst + j) = (v & 0xff).toByte
          j += 1
        }
        r += 1
      }
      out
    }
  }

  private val NameRe = """/(\w+)""".r

  private def isDecompressor(f: String): Boolean =
    f == "FlateDecode" || f == "Fl" || f == "LZWDecode" || f == "LZW"

  /** Per-stage `/DecodeParms` (or `/DP`) entries aligned with the filter
    * chain. An ARRAY aligns by index (null entries → defaults). A SINGLE
    * dict aligns to the first decompression stage — per spec a lone dict
    * accompanies a lone filter, but writers that pair one dict with a
    * chain (e.g. [/ASCIIHexDecode /FlateDecode]) mean the decompressor's
    * parms, never the transport encoding's. Predictors and EarlyChange
    * then apply ONLY to their own stage: a predictor declared for the
    * final stage must not mangle an earlier stage's intermediate bytes.
    */
  /** The first `/DecodeParms` (or `/DP`) value in `dict` — `[ … ]` array,
    * `<< … >>` dict (to the FIRST `>>`, the old lazy-regex semantics) or
    * `null` — via a linear key scan instead of the lazy-dot DecodeParmsRe
    * (same CPU-bomb class as [[objSlices]]: a dict stuffed with
    * close-less `/DP <<` keys made findFirstMatchIn rescan the tail per
    * key). A key whose value doesn't parse falls through to the next
    * occurrence, matching the regex's keep-searching behavior.
    */
  private def decodeParmsValue(dict: String): Option[String] = {
    def at(key: String, from: Int): Int = dict.indexOf(key, from)
    var p = math.min(at("/DecodeParms", 0) & Int.MaxValue,
                     at("/DP", 0) & Int.MaxValue)
    while (p < Int.MaxValue) {
      val keyLen = if (dict.startsWith("/DecodeParms", p)) 12 else 3
      var q = p + keyLen
      while (q < dict.length && Character.isWhitespace(dict.charAt(q))) q += 1
      if (dict.startsWith("[", q)) {
        val e = dict.indexOf(']', q + 1)
        if (e >= 0) return Some(dict.substring(q, e + 1))
      } else if (dict.startsWith("<<", q)) {
        val e = dict.indexOf(">>", q + 2)
        if (e >= 0) return Some(dict.substring(q, e + 2))
      } else if (dict.startsWith("null", q)) return Some("null")
      val n = p + keyLen
      p = math.min(at("/DecodeParms", n) & Int.MaxValue,
                   at("/DP", n) & Int.MaxValue)
    }
    None
  }

  /** `<< … >>` / `null` elements of a parms ARRAY body, linear (replaces
    * ParmElemRe's lazy dot): earliest-starting element wins, a close-less
    * `<<` can only be followed by `null` elements.
    */
  private def parmElems(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var p = 0
    var stop = false
    while (!stop && p < s.length) {
      val d = s.indexOf("<<", p)
      val nl = s.indexOf("null", p)
      val e = if (d < 0) -1 else s.indexOf(">>", d + 2)
      if (d >= 0 && e >= 0 && (nl < 0 || d < nl)) {
        out += s.substring(d, e + 2); p = e + 2
      } else if (nl >= 0) { out += "null"; p = nl + 4 }
      else stop = true
    }
    out.toSeq
  }

  private[etl] def decodeParms(dict: String, filters: Seq[String]): Seq[String] = {
    val parsed: Seq[String] =
      decodeParmsValue(dict) match {
        case Some(s) if s.startsWith("[") =>
          parmElems(s.substring(1, s.length - 1))
        case Some(s) => Seq(s)
        case None => Nil
      }
    val byIndex = parsed.map(p => if (p == "null") "" else p)
    if (byIndex.size == 1 && filters.length > 1) {
      val at = filters.indexWhere(isDecompressor) max 0
      filters.indices.map(i => if (i == at) byIndex.head else "")
    } else byIndex.padTo(filters.length, "")
  }

  /** Apply the stream's declared filter CHAIN in order, each stage with
    * its OWN DecodeParms. Unknown filters (DCT, JBIG2, CCITT, Crypt —
    * see scaladoc) yield None so the stream is skipped rather than
    * mis-decoded; a stream with no /Filter passes through raw.
    */
  /** The declared filter chain of one stream dict — `/Filter` name or
    * array form. Shared by [[decodeStream]] and [[diagnose]] (the r12
    * reason-coded-quarantine thread: one parse, two consumers).
    */
  private[etl] def filterNames(dict: String): Seq[String] = {
    // linear key scan (r12 — the decodeParmsValue rationale: the old
    // FilterListRe's `[^\]]*` rescanned the dict tail per close-less
    // `/Filter [` occurrence); a key whose value doesn't parse falls
    // through to the next occurrence, matching findFirstMatchIn.
    def asciiWord(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_'
    var p = dict.indexOf("/Filter")
    while (p >= 0) {
      var q = p + 7
      while (q < dict.length && Character.isWhitespace(dict.charAt(q))) q += 1
      if (q < dict.length && dict.charAt(q) == '[') {
        val e = dict.indexOf(']', q + 1)
        if (e >= 0)
          return NameRe.findAllMatchIn(dict.substring(q + 1, e))
            .map(_.group(1)).toSeq
      } else if (q < dict.length && dict.charAt(q) == '/') {
        var e = q + 1
        while (e < dict.length && asciiWord(dict.charAt(e))) e += 1
        if (e > q + 1) return Seq(dict.substring(q + 1, e))
      }
      p = dict.indexOf("/Filter", p + 7)
    }
    Nil
  }

  /** Filters [[decodeStream]] can actually decode (incl. abbreviations). */
  private val SupportedFilters: Set[String] = Set(
    "FlateDecode", "Fl", "LZWDecode", "LZW", "ASCIIHexDecode", "AHx",
    "ASCII85Decode", "A85", "RunLengthDecode", "RL")

  private[etl] def decodeStream(dict: String, data: Array[Byte]): Option[Array[Byte]] = {
    val filters: Seq[String] = filterNames(dict)
    filters.zip(decodeParms(dict, filters)).foldLeft(Option(data)) {
      case (acc, (f, parm)) =>
        acc.flatMap { d =>
          f match {
            case "FlateDecode" | "Fl" => inflate(d).map(unpredict(parm, _))
            case "LZWDecode" | "LZW" =>
              val early = EarlyRe.findFirstMatchIn(parm)
                .flatMap(_.group(1).toIntOption).getOrElse(1)
              lzwDecode(d, early).map(unpredict(parm, _))
            case "ASCIIHexDecode" | "AHx" => asciiHexDecode(d)
            case "ASCII85Decode" | "A85" => ascii85Decode(d)
            case "RunLengthDecode" | "RL" => runLengthDecode(d)
            case _ => None
          }
        }
    }
  }

  private def extract(bytes: Array[Byte], password: String): Seq[String] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("%PDF")) return Nil

    val slices = objSlices(raw)
    // encrypted documents: streams decrypt BEFORE filter decoding (the
    // spec's layering — encryption wraps the filtered bytes). None here
    // for unencrypted docs; a doc the (possibly empty) password doesn't
    // open never reaches extract with ctx (openEncryption fails) — its
    // streams decode to garbage → Nil → the `encrypted` quarantine.
    val ctx = openEncryption(raw, slices, password)

    // object number → (header dict text, decoded stream body if any);
    // stream data runs from the marker EOL to the first `endstream`
    // (missing endstream ⇒ no body, matching the old regex behavior).
    // Under encryption, streams the handler exempts (xref streams,
    // unencrypted metadata) decrypt to garbage and fail their filter
    // decode — the usual per-stream degrade; nothing this extractor
    // reads navigates through them.
    val objs: Map[Int, (String, Option[String])] =
      slices.map { case (num, dict, dataStart) =>
        val body =
          if (dataStart < 0) None
          else {
            val endIdx = raw.indexOf("endstream", dataStart)
            if (endIdx < 0) None
            else {
              // the DIRECT /Length is authoritative when plausible
              // (r13 review): stripFramingEol's \r\n branch eats a real
              // trailing 0x0D payload byte when the writer framed with a
              // bare \n — harmless for self-terminating codecs, but an
              // AES ciphertext ending in 0x0D then fails the %16 check
              // and silently drops the page. Indirect `/Length N 0 R`
              // and implausible values (gap past framing) fall back to
              // the endstream scan.
              val declared = LengthRe.findFirstMatchIn(dict)
                .flatMap(_.group(1).toIntOption)
                .filter(l => l >= 0 && dataStart.toLong + l <= endIdx &&
                  endIdx - (dataStart + l) <= 4)
              val data = declared match {
                case Some(l) => raw.substring(dataStart, dataStart + l)
                  .getBytes(StandardCharsets.ISO_8859_1)
                case None => stripFramingEol(raw.substring(dataStart, endIdx)
                  .getBytes(StandardCharsets.ISO_8859_1))
              }
              val plain = ctx match {
                case Some(c) => PdfDecrypt.decryptStream(c, num, data)
                case None => Some(data)
              }
              plain.flatMap(decodeStream(dict, _))
                .map(new String(_, StandardCharsets.ISO_8859_1))
            }
          }
        num -> (dict, body)
      }.toMap

    // ToUnicode CMaps: font object number → cid → unicode string
    def parseCMap(s: String): Map[Int, String] = {
      // hexInt: attacker-controlled hex must SKIP its entry on overflow,
      // never throw out of extract() to the whole-document Nil (r13
      // review round 2 — the toIntOption class; Integer.parseInt on a
      // <FFFFFFFF> CID aborted every page of the document)
      def hexInt(h: String): Option[Int] =
        if (h.isEmpty || h.length > 8) None
        else java.lang.Long.parseLong(h, 16) match {
          case v if v <= Int.MaxValue => Some(v.toInt)
          case _ => None
        }
      val out = scala.collection.mutable.Map[Int, String]()
      lazySegments(s, "beginbfchar", "endbfchar").foreach { seg =>
        HexPairRe.findAllMatchIn(seg).foreach { p =>
          hexInt(p.group(1)).foreach(cid => out(cid) = hexToUnicode(p.group(2)))
        }
      }
      lazySegments(s, "beginbfrange", "endbfrange").foreach { seg =>
        RangeTripleRe.findAllMatchIn(seg).foreach { t =>
          (hexInt(t.group(1)), hexInt(t.group(2)), hexInt(t.group(3))) match {
            case (Some(lo), Some(hi), Some(dst)) =>
              // CIDs in this extractor are 16-bit (emitHex reads 4 hex
              // digits) — a wider range is meaningless at best and a
              // memory/CPU bomb at worst (a crafted <0> <7FFFFFFF> range
              // would materialize 2^31 map entries). Skip, don't clamp:
              // a clamp would fabricate mappings the document never uses.
              // Per-entry code-point validity guards toChars (a dst near
              // Int.MaxValue is not a throwable offense for other rows).
              if (lo >= 0 && hi <= 0xFFFF) {
                var c = lo
                while (c <= hi) {
                  val cp = dst + (c - lo)
                  if (Character.isValidCodePoint(cp))
                    out(c) = new String(Character.toChars(cp))
                  c += 1
                }
              }
            case _ => // overflowed member: skip this range only
          }
        }
      }
      out.toMap
    }
    val toUnicodeRe = """/ToUnicode\s+(\d+)\s+0\s+R""".r
    val fontCmaps: Map[Int, Map[Int, String]] = objs.flatMap { case (num, (dict, _)) =>
      toUnicodeRe.findFirstMatchIn(dict).flatMap { m =>
        m.group(1).toIntOption.flatMap(objs.get).flatMap(_._2)
          .map(s => num -> parseCMap(s))
      }
    }
    // font resource name (F1, F2, …) → cmap, scraped from /Font <<…>> dicts
    val fontNameRe = """/(\w+)\s+(\d+)\s+0\s+R""".r
    val nameToCmap: Map[String, Map[Int, String]] = objs.values.flatMap { case (dict, _) =>
      val fontIdx = dict.indexOf("/Font")
      if (fontIdx < 0) Nil
      else fontNameRe.findAllMatchIn(dict.substring(fontIdx)).flatMap { m =>
        m.group(2).toIntOption.flatMap(fontCmaps.get).map(m.group(1) -> _)
      }.toList
    }.toMap

    // content streams with a text block, in document order = pages
    val pages = objs.toSeq.sortBy(_._1).flatMap(_._2._2).filter(_.contains("BT"))
    pages.map(decodePage(_, nameToCmap)).filter(_.nonEmpty)
  }

  private def hexToUnicode(hex: String): String = {
    // UTF-16BE code units, 4 hex digits each
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= hex.length) {
      sb.append(Integer.parseInt(hex.substring(i, i + 4), 16).toChar)
      i += 4
    }
    sb.toString
  }

  private def unescape(t: String): String =
    t.replace("\\(", "(").replace("\\)", ")").replace("\\\\", "\\")
      .replaceAll("""\\[rn]""", " ")

  /** `[ … ] TJ` array bodies as (start, body), linear: TJ-close positions
    * come from a fixed-shape regex scan, then each `[` pairs with the
    * first close after it (resuming past the pair) — exactly the old
    * lazy `\[(.*?)\]\s*TJ` match set without its O(opens × tail) blowup
    * on crafted close-less content (r12, the objSlices rationale; the
    * decoded stream the content arrives in is attacker-shaped on the
    * ingest path even under the decode ceiling).
    */
  private def tjSegments(content: String): Seq[(Int, String)] = {
    val closes = TJCloseRe.findAllMatchIn(content)
      .map(m => (m.start, m.end)).toVector
    val out = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    var p = content.indexOf('[')
    var ci = 0
    while (p >= 0) {
      while (ci < closes.size && closes(ci)._1 <= p) ci += 1
      if (ci >= closes.size) p = -1
      else {
        out += ((p, content.substring(p + 1, closes(ci)._1)))
        p = content.indexOf('[', closes(ci)._2)
      }
    }
    out.toSeq
  }

  private def decodePage(content: String, fonts: Map[String, Map[Int, String]]): String = {
    // walk the stream once, tracking the current font across Tf/Tj/TJ in order
    val events = (
      TfRe.findAllMatchIn(content).map(m => (m.start, "Tf", m.group(1))) ++
      TjRe.findAllMatchIn(content).map(m => (m.start, "Tj", m.group(1))) ++
      tjSegments(content).iterator.map { case (s, b) => (s, "TJ", b) }
    ).toSeq.sortBy(_._1)
    var cmap: Map[Int, String] = Map.empty
    val sb = new StringBuilder
    def emitHex(hex: String): Unit = {
      var i = 0
      while (i + 4 <= hex.length) {
        val cid = Integer.parseInt(hex.substring(i, i + 4), 16)
        sb.append(cmap.getOrElse(cid, ""))
        i += 4
      }
    }
    events.foreach {
      case (_, "Tf", name) => cmap = fonts.getOrElse(name, Map.empty)
      case (_, "Tj", lit) => sb.append(unescape(lit))
      case (_, "TJ", arr) =>
        // hex and literal elements interleave in one TJ array — emit both
        // in positional order (dropping literals when any hex is present
        // would silently lose mixed-font text)
        val elems =
          HexRe.findAllMatchIn(arr).map(m => (m.start, "hex", m.group(1))) ++
          LitRe.findAllMatchIn(arr).map(m => (m.start, "lit", m.group(1)))
        elems.toSeq.sortBy(_._1).foreach {
          case (_, "hex", h) => emitHex(h)
          case (_, _, lit) => sb.append(unescape(lit))
        }
      case _ => ()
    }
    sb.toString.replaceAll("\\s+", " ").trim
  }
}

/** [[FlatePdfExtractor]] carrying a caller-supplied document password
  * (r15, VERDICT #1 — the reference toolchain's pdfminer takes exactly
  * this via `password=`). Same codec, same reason codes; the password
  * is offered to the Standard security handler user-side then
  * owner-side on every encrypted document, and ignored by unencrypted
  * ones. Stateless and Serializable — safe inside executor tasks like
  * every PageExtractor.
  */
final case class PasswordedPdfExtractor(password: String)
    extends PageExtractor {
  def extractPages(bytes: Array[Byte]): Seq[String] =
    FlatePdfExtractor.extractPages(bytes, password)
  override def diagnose(bytes: Array[Byte]): String =
    FlatePdfExtractor.diagnose(bytes, password)
  override def skippedStreams(bytes: Array[Byte]): Map[String, Int] =
    FlatePdfExtractor.skippedStreams(bytes)
  override def withPassword(p: String): PageExtractor =
    // empty = "no password offered" = NO-OP (the trait contract —
    // review r15: mapping "" to the password-free singleton silently
    // stripped a baked-in corpus password on every request without
    // ?password=, and disagreed with SniffingExtractor's handling)
    if (p.isEmpty || p == password) this
    else FlatePdfExtractor.withPassword(p)
}
