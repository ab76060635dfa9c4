package graft.etl

import java.nio.charset.StandardCharsets

/** Legacy binary `.doc` (Word 97–2003, MS-DOC) text extractor — the
  * round-17 codec closing the last implementable real-user gap
  * (VERDICT r16 #1): a legal archive of old cassation volumes is
  * exactly the population where Word-97–2003 binaries survive, and
  * until now those bytes quarantined as `not-pdf-or-docx`. The
  * reference's python-docx stack cannot read `.doc` either
  * (requirements.txt — parity holds), so like the r15/r16 decryptors
  * this is a beyond-reference capability of the same class.
  *
  * A `.doc` is an OLE/CFB compound file (the hardened reader already
  * in-tree — [[OoxmlDecrypt.readCfbStream]]) holding a `WordDocument`
  * stream (the File Information Block + raw text) and a table stream
  * (`0Table` or `1Table`, chosen by FIB `fWhichTblStm`) holding the
  * piece table. Extraction:
  *   - parse the FIB, navigating its variable-size sections by their
  *     own counts (`csw`/`cslw`/`cbRgFcLcb`) so every nFib from Word 97
  *     (0x00C1) through 2003 walks the same path; `ccpText`/`ccpFtn`
  *     come from FibRgLw97, `fcClx`/`lcbClx` from FibRgFcLcb97 pair 33;
  *   - parse the Clx in the table stream: skip the leading Prc grpprl
  *     blocks, then the Pcdt's PlcPcd — n+1 CPs and n PCDs, each PCD
  *     carrying a 30-bit fc, an fCompressed bit (8-bit CP-1252 bytes at
  *     fc/2) or clear (UTF-16LE at fc);
  *   - decode the body CP range [0, ccpText) piece by piece, map
  *     Word's control characters (paragraph mark, cell mark, line
  *     break, tab, hyphens), drop field INSTRUCTION text (0x13..0x14,
  *     keeping the 0x14..0x15 field RESULT, nesting honored), and
  *     split PAGES on 0x0C — the explicit page/section break character,
  *     with the same blank-page rules as [[DocxExtractor]].
  * Word 6/95 binaries (wIdent 0xA5DC, a different FIB layout) are
  * declared out with reason `doc-unsupported-version`; XOR-obfuscated
  * documents (FIB `fObfuscated`) with `doc-xor-obfuscated` (the legacy
  * 16-bit checksum scheme — weak enough that refusing to silently
  * "decrypt" is the right call for a verifier-less format). RC4 and
  * RC4 CryptoAPI ENCRYPTED documents (FIB `fEncrypted`) decrypt via
  * [[DocDecrypt]] when the caller supplies a password
  * ([[PasswordedDocExtractor]]) and quarantine `encrypted` otherwise.
  *
  * Never throws on garbage — Nil (the S16 quarantine contract); all
  * parsing is bounds-checked against attacker-shaped input like every
  * other codec in the family (the r12 hardening rule). Decoded text is
  * capped at [[MaxTextChars]] — the MS-DOC face of the DOCX side's
  * deflate-bomb ceiling (crafted overlapping pieces could otherwise
  * expand a small upload quadratically).
  *
  * KNOWN FORMAT PROPERTY (found by this codec's own structural fuzzer
  * on day one): MS-DOC carries NO content integrity check anywhere —
  * no zip CRC-32 (the r16 DOCX gate), no zlib adler32 (the PDF gate).
  * A damaged byte in the text region, or one RC4-local bit flip in an
  * encrypted stream, reads as a DIFFERENT well-formed document, for
  * this codec exactly as for Word itself. Storage-rot detection for
  * `.doc` therefore has to live upstream (staging checksums), not in
  * the format; the fuzzer's poke property asserts the honest contract
  * (never throw, extract or quarantine) rather than byte fidelity no
  * reader of this format can promise.
  */
object DocExtractor extends PageExtractor {

  /** Output ceiling, in chars — the [[DocxExtractor.MaxDocumentXmlBytes]]
    * analogue. Every legitimate character costs ≥ 1 WordDocument-stream
    * byte, but pieces are attacker-addressable and may OVERLAP, so the
    * cap is enforced on the requested CP total, not inferred.
    */
  private[etl] val MaxTextChars: Int = 64 << 20

  /** CP-1252 for fCompressed pieces. The MS-DOC "special byte mapping"
    * (0x82 → U+201A … 0x9F → U+0178) IS windows-1252's high range, so
    * the JDK charset decodes it exactly; every standard JDK ships it,
    * but a minimal runtime without it degrades to Latin-1 (identical on
    * all bytes real Ethiopian legal text uses — Ethiopic never appears
    * in compressed pieces at all, it needs the UTF-16 form).
    */
  private val Cp1252: java.nio.charset.Charset =
    try java.nio.charset.Charset.forName("windows-1252")
    catch { case _: Exception => StandardCharsets.ISO_8859_1 }

  /** Structural probe for the sniffing router: CFB magic + a
    * `WordDocument` DIRECTORY entry — entry existence only, same
    * contract (and same reader) as
    * [[DocxExtractor.looksLikeEncryptedOoxml]]: no stream read, so a
    * tail-truncated `.doc` still earns its actionable reason instead of
    * regressing to `not-pdf-or-docx`. Encrypted OOXML containers carry
    * `EncryptionInfo` and no `WordDocument`, so the two CFB probes
    * never both fire.
    */
  def looksLikeDoc(bytes: Array[Byte]): Boolean =
    OoxmlDecrypt.readCfbStream(bytes, "WordDocument", probeOnly = true)
      .isDefined

  // ---- FIB ---------------------------------------------------------------

  // shared with DocDecrypt below — one byte-order decoder per file
  // (the r11 one-place rule; r17 review collapsed DocDecrypt's copies)
  private[etl] def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private[etl] def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  /** The FIB fields this codec needs. `fWhichTblStm` picks the table
    * stream; the encryption trio (`fEncrypted`/`fObfuscated`/`lKey`)
    * lives in the never-encrypted first 0x44 bytes, so [[fibBase]] can
    * read it before any decryption decision.
    */
  private[etl] final case class Fib(nFib: Int, fEncrypted: Boolean,
                                    fObfuscated: Boolean,
                                    fWhichTblStm: Boolean, lKey: Long,
                                    ccpText: Long, ccpFtn: Long,
                                    fcClx: Long, lcbClx: Long)

  /** Just FibBase (32 bytes, plaintext even in encrypted documents) —
    * enough to route: version, encryption flags, table-stream choice.
    */
  private[etl] def fibBase(wd: Array[Byte]): Either[String, Fib] = {
    if (wd.length < 32) return Left("doc-truncated-or-corrupt")
    val wIdent = le16(wd, 0)
    if (wIdent != 0xA5EC)
      return Left(
        // Word 6/95 (wIdent 0xA5DC) has a different FIB layout and a
        // fcMin/fcMac text model — declared out; anything else under a
        // WordDocument entry is not a Word binary at all
        if (wIdent == 0xA5DC) "doc-unsupported-version"
        else "doc-truncated-or-corrupt")
    val nFib = le16(wd, 2)
    val flags = le16(wd, 10)
    Right(Fib(nFib,
      fEncrypted = (flags & 0x0100) != 0,
      fObfuscated = (flags & 0x8000) != 0,
      fWhichTblStm = (flags & 0x0200) != 0,
      lKey = le32(wd, 14),
      ccpText = -1, ccpFtn = -1, fcClx = -1, lcbClx = -1))
  }

  /** The full FIB: FibBase, then FibRgW97/FibRgLw97/FibRgFcLcbBlob
    * navigated by their own leading counts — robust across every
    * Word-97–2003 nFib (csw/cslw are constant in practice, cbRgFcLcb
    * grows 0x5D → 0xB7 across versions; pair 33 = fcClx/lcbClx in all
    * of them).
    */
  private[etl] def parseFib(wd: Array[Byte]): Either[String, Fib] =
    fibBase(wd).flatMap { base =>
      if (wd.length < 34) return Left("doc-truncated-or-corrupt")
      val csw = le16(wd, 32)
      val lwOff = 34 + csw * 2
      if (csw < 14 || lwOff + 2 > wd.length)
        return Left("doc-truncated-or-corrupt")
      val cslw = le16(wd, lwOff)
      val lwBase = lwOff + 2
      if (cslw < 8 || lwBase + cslw * 4 + 2 > wd.length)
        return Left("doc-truncated-or-corrupt")
      val ccpText = le32(wd, lwBase + 3 * 4)
      val ccpFtn = le32(wd, lwBase + 4 * 4)
      val fcLcbOff = lwBase + cslw * 4
      val cbRgFcLcb = le16(wd, fcLcbOff)
      val pairBase = fcLcbOff + 2
      // pair 33 is fcClx/lcbClx in FibRgFcLcb97 and every superset
      if (cbRgFcLcb < 34 || pairBase + 34 * 8 > wd.length)
        return Left("doc-truncated-or-corrupt")
      val fcClx = le32(wd, pairBase + 33 * 8)
      val lcbClx = le32(wd, pairBase + 33 * 8 + 4)
      Right(base.copy(ccpText = ccpText, ccpFtn = ccpFtn,
        fcClx = fcClx, lcbClx = lcbClx))
    }

  // ---- piece table ---------------------------------------------------------

  /** One text run: CPs [cpStart, cpEnd) live at WordDocument-stream
    * byte `byteOff`, 1 byte/char CP-1252 when compressed, else 2
    * bytes/char UTF-16LE.
    */
  private final case class Piece(cpStart: Long, cpEnd: Long, byteOff: Long,
                                 compressed: Boolean)

  /** Parse the Clx → pieces. Structure checks are strict — monotonic
    * CPs, in-bounds Pcdt — because a corrupt piece table must
    * quarantine, not emit re-ordered text.
    */
  private def parseClx(table: Array[Byte], fcClx: Long,
                       lcbClx: Long): Either[String, Seq[Piece]] = {
    if (fcClx < 0 || lcbClx < 4 || fcClx + lcbClx > table.length)
      return Left("doc-truncated-or-corrupt")
    var p = fcClx.toInt
    val end = (fcClx + lcbClx).toInt
    // leading Prcs (property modifiers): clxt=1, i16 size, grpprl bytes.
    // The size read itself stays inside the declared Clx region (p+3
    // <= end) — a 0x01 in the last two bytes must fall through to the
    // Pcdt check's structural reason, not read past the region (r17
    // review)
    while (p + 3 <= end && table(p) == 0x01) {
      val cb = le16(table, p + 1)
      if (cb > end - p - 3) return Left("doc-truncated-or-corrupt")
      p += 3 + cb
    }
    if (p + 5 > end || table(p) != 0x02)
      return Left("doc-truncated-or-corrupt")
    val lcb = le32(table, p + 1)
    val plc = p + 5
    if (lcb < 16 || (lcb - 4) % 12 != 0 || plc + lcb > end)
      return Left("doc-truncated-or-corrupt")
    val n = ((lcb - 4) / 12).toInt
    val pcdBase = plc + (n + 1) * 4
    val out = Vector.newBuilder[Piece]
    var prevCp = -1L
    var i = 0
    while (i < n) {
      val cpStart = le32(table, plc + i * 4)
      val cpEnd = le32(table, plc + (i + 1) * 4)
      if (cpStart <= prevCp || cpEnd <= cpStart)
        return Left("doc-truncated-or-corrupt")
      prevCp = cpStart
      val fcRaw = le32(table, pcdBase + i * 8 + 2)
      val compressed = (fcRaw & 0x40000000L) != 0
      val fc = fcRaw & 0x3FFFFFFFL
      out += Piece(cpStart, cpEnd, if (compressed) fc / 2 else fc, compressed)
      i += 1
    }
    Right(out.result())
  }

  /** Decode one CP range [from, until) through the pieces; None on any
    * out-of-bounds read (corrupt fc) OR on a coverage gap — partial
    * text must not pass as a clean document. Pieces are contiguous by
    * construction (piece i's cpEnd IS plc entry i+1), but the table's
    * CP domain need not start at 0 or reach ccpText in corrupt input
    * (r17 review: a PlcPcd starting at CP 100 silently dropped the
    * document head), so the decoded char count must equal the request.
    */
  private def decodeRange(wd: Array[Byte], pieces: Seq[Piece],
                          from: Long, until: Long): Option[String] = {
    if (until <= from) return Some("")
    val sb = new java.lang.StringBuilder(
      math.min(until - from, 1L << 20).toInt)
    var covered = 0L
    pieces.foreach { pc =>
      val lo = math.max(pc.cpStart, from)
      val hi = math.min(pc.cpEnd, until)
      if (lo < hi) {
        val count = (hi - lo).toInt
        val skip = lo - pc.cpStart
        if (pc.compressed) {
          val off = pc.byteOff + skip
          if (off < 0 || off + count > wd.length) return None
          sb.append(new String(wd, off.toInt, count, Cp1252))
        } else {
          val off = pc.byteOff + skip * 2
          if (off < 0 || off + count * 2L > wd.length) return None
          sb.append(new String(wd, off.toInt, count * 2, StandardCharsets.UTF_16LE))
        }
        covered += count
      }
    }
    if (covered != until - from) None else Some(sb.toString)
  }

  // ---- text → pages ----------------------------------------------------

  /** Word's in-text control characters → the page/line contract, with
    * field-instruction filtering. 0x13 begins a field's INSTRUCTION
    * (e.g. ` HYPERLINK "…" `), 0x14 separates it from the RESULT text a
    * reader sees, 0x15 ends the field — so instruction spans drop,
    * results keep, nesting honored via a phase stack (a HYPERLINK
    * wrapping a PAGE field is ordinary Word output). Depth is capped —
    * a crafted run of 0x13s must stay O(n).
    */
  private[etl] def pagesFromText(raw: String): Seq[String] = {
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    def page(): String = {
      // drop the page's trailing paragraph mark, as the DOCX twin does
      var e = cur.length
      while (e > 0 && (cur.charAt(e - 1) == '\n')) e -= 1
      val t = cur.substring(0, e)
      cur.setLength(0)
      t
    }
    // instruction-phase stack: bit i set = enclosing field i still in
    // its instruction part. Depth-capped; overflow treated as corrupt
    // noise (chars drop until the stack unwinds).
    var stack = 0L
    var depth = 0
    def inInstruction: Boolean = stack != 0L
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      c match {
        case '\u0013' => // field begin: instruction phase opens
          if (depth < 64) stack |= 1L << depth
          depth += 1
        case '\u0014' => // field separator: instruction -> result
          if (depth > 0 && depth <= 64) stack &= ~(1L << (depth - 1))
        case '\u0015' => // field end
          if (depth > 0) {
            depth -= 1
            if (depth < 64) stack &= ~(1L << depth)
          }
        case _ if inInstruction => // field instruction text: dropped
        case '\r' | '\u0007' | '\u000B' => cur.append('\n')
        case '\t' => cur.append('\t')
        case '\f' =>
          val p = page()
          pages += (if (p.trim.isEmpty) "" else p) // blank page survives
        case '\u001E' => cur.append('-') // non-breaking hyphen
        case '\u001F' => // optional hyphen: invisible unless broken
        case _ if c >= ' ' => cur.append(c)
        case _ => // remaining control marks (pictures, note refs): drop
      }
      i += 1
    }
    val t = page()
    if (t.trim.nonEmpty) pages += t
    if (pages.forall(_.trim.isEmpty)) Nil else pages.toSeq
  }

  // ---- extraction core ---------------------------------------------------

  private[etl] def tableStreamName(fib: Fib): String =
    if (fib.fWhichTblStm) "1Table" else "0Table"

  /** The shared body of the plain and decrypted paths: FIB → Clx →
    * pieces → pages. Left carries the quarantine reason.
    */
  private[etl] def extractFromStreams(wd: Array[Byte], table: Array[Byte],
                                      includeFootnotes: Boolean)
      : Either[String, Seq[String]] =
    parseFib(wd).flatMap { fib =>
      if (fib.ccpText < 0 || fib.ccpFtn < 0 ||
          fib.ccpText + fib.ccpFtn > MaxTextChars)
        return Left("doc-oversize-text")
      parseClx(table, fib.fcClx, fib.lcbClx).flatMap { pieces =>
        decodeRange(wd, pieces, 0L, fib.ccpText) match {
          case None => Left("doc-truncated-or-corrupt")
          case Some(body) =>
            val pages = pagesFromText(body)
            val notes =
              if (includeFootnotes && fib.ccpFtn > 0)
                decodeRange(wd, pieces, fib.ccpText,
                  fib.ccpText + fib.ccpFtn) match {
                  case None => return Left("doc-truncated-or-corrupt")
                  case Some(t) => pagesFromText(t)
                }
              else Nil
            // footnote placement mirrors the DOCX twin: appended to the
            // LAST page; a no-text body whose notes carry the content
            // emits them as ONE page rather than quarantining
            val joined =
              if (notes.isEmpty) pages
              else if (pages.isEmpty) Seq(notes.mkString("\n"))
              else pages.init :+ (pages.last + "\n" + notes.mkString("\n"))
            Right(joined)
        }
      }
    }

  private[etl] def streamsOf(bytes: Array[Byte])
      : Either[String, (Array[Byte], Array[Byte], Fib)] = {
    val wd = OoxmlDecrypt.readCfbStream(bytes, "WordDocument")
      .getOrElse(return Left("doc-truncated-or-corrupt"))
    fibBase(wd).flatMap { base =>
      OoxmlDecrypt.readCfbStream(bytes, tableStreamName(base)) match {
        case None => Left("doc-truncated-or-corrupt")
        case Some(table) => Right((wd, table, base))
      }
    }
  }

  def extractPages(bytes: Array[Byte]): Seq[String] =
    extractPages(bytes, includeFootnotes = false)

  def extractPages(bytes: Array[Byte], includeFootnotes: Boolean): Seq[String] =
    try {
      // no looksLikeDoc pre-probe: streamsOf's WordDocument read IS the
      // detection (absent stream → Left → Nil), and the probe would be
      // a second full directory walk per document (r17 review)
      streamsOf(bytes) match {
        case Left(_) => Nil
        case Right((_, _, base)) if base.fEncrypted =>
          Nil // password/obfuscation: quarantine (PasswordedDocExtractor opens)
        case Right((wd, table, _)) =>
          // fObfuscated is NOT consulted here: MS-DOC says the bit MUST
          // be ignored when fEncrypted is 0 (r17 review — a plain doc
          // with a stray bit 15 opens in Word and must extract here)
          extractFromStreams(wd, table, includeFootnotes)
            .getOrElse(Nil)
      }
    } catch { case _: Exception => Nil }

  override def diagnose(bytes: Array[Byte]): String =
    diagnose(bytes, includeFootnotes = false)

  /** Diagnosis must decode the SAME ranges extraction decoded: since
    * the r17 coverage check, a footnote range the piece table doesn't
    * cover quarantines, and a footnotes=false diagnosis of that
    * document would succeed body-only and report a wrong `empty-text`
    * (r17 review round 2).
    */
  private[etl] def diagnose(bytes: Array[Byte],
                            includeFootnotes: Boolean): String =
    try {
      if (!looksLikeDoc(bytes)) "not-a-doc"
      else streamsOf(bytes) match {
        case Left(reason) => reason
        case Right((_, _, base)) if base.fEncrypted && base.fObfuscated =>
          "doc-xor-obfuscated"
        case Right((_, _, base)) if base.fEncrypted => "encrypted"
        case Right((wd, table, _)) =>
          extractFromStreams(wd, table, includeFootnotes) match {
            case Left(reason) => reason
            case Right(_) => "empty-text"
          }
      }
    } catch { case _: Exception => "doc-unreadable" }

  override def withPassword(password: String): PageExtractor =
    if (password.isEmpty) this else PasswordedDocExtractor(password)
}

/** The footnote-including variant — the statute wiring's `.doc` twin of
  * [[DocxWithFootnotesExtractor]] (statutes cite in footnotes; the
  * footnote CP range follows the body range in the text stream).
  */
case object DocWithFootnotesExtractor extends PageExtractor {
  def extractPages(bytes: Array[Byte]): Seq[String] =
    DocExtractor.extractPages(bytes, includeFootnotes = true)
  override def diagnose(bytes: Array[Byte]): String =
    DocExtractor.diagnose(bytes, includeFootnotes = true)
  override def withPassword(password: String): PageExtractor =
    if (password.isEmpty) this
    else PasswordedDocExtractor(password, includeFootnotes = true)
}

/** [[DocExtractor]] carrying a caller-supplied document password — the
  * `.doc` face of `PageExtractor.withPassword`, completing the family
  * (PDF r15, OOXML r15/r16). An encrypted `.doc` (FIB `fEncrypted`)
  * decrypts through [[DocDecrypt]] (RC4 v1.1 and RC4 CryptoAPI — the
  * Word-97–2003 password population) and the recovered streams flow
  * through the normal extraction; a wrong password or an unsupported
  * scheme keeps the `encrypted` quarantine; plain `.doc`s ignore the
  * password entirely. XOR obfuscation stays declared out even with a
  * password (`doc-xor-obfuscated` — the scheme has no verifier, so a
  * "successful" open can silently emit garbage text). Stateless and
  * Serializable like every PageExtractor.
  */
final case class PasswordedDocExtractor(password: String,
    includeFootnotes: Boolean = false) extends PageExtractor {

  /** One container read serves detection, routing and decryption: the
    * pre-r17-review shape walked the CFB directory ~4× per encrypted
    * document (probe, route read, then decryptStreams re-reading both
    * streams); now [[DocExtractor.streamsOf]] reads (wd, table, fib)
    * once and the decryptor consumes them as arrays.
    */
  def extractPages(bytes: Array[Byte]): Seq[String] =
    try {
      DocExtractor.streamsOf(bytes) match {
        case Left(_) => Nil
        case Right((wd, table, base)) if base.fEncrypted && base.fObfuscated =>
          Nil // XOR obfuscation: declared out even with a password
        case Right((wd, table, base)) if base.fEncrypted =>
          DocDecrypt.decryptStreams(wd, table, base, password) match {
            case Some((dwd, dtable)) =>
              DocExtractor.extractFromStreams(dwd, dtable, includeFootnotes)
                .getOrElse(Nil)
            case None => Nil // wrong password / unsupported scheme
          }
        case Right((wd, table, _)) => // plain: password ignored
          DocExtractor.extractFromStreams(wd, table, includeFootnotes)
            .getOrElse(Nil)
      }
    } catch { case _: Exception => Nil }

  override def diagnose(bytes: Array[Byte]): String =
    try {
      if (!DocExtractor.looksLikeDoc(bytes)) "not-a-doc"
      else DocExtractor.streamsOf(bytes) match {
        case Left(reason) => reason
        case Right((_, _, base)) if base.fEncrypted && base.fObfuscated =>
          "doc-xor-obfuscated"
        case Right((wd, table, base)) if base.fEncrypted =>
          DocDecrypt.decryptStreams(wd, table, base, password) match {
            case Some((dwd, dtable)) =>
              // right password: the reason moves past `encrypted` to
              // whatever actually blocked the text (the DOCX-twin rule)
              DocExtractor.extractFromStreams(dwd, dtable, includeFootnotes)
                match {
                  case Left(reason) => reason
                  case Right(_) => "empty-text"
                }
            case None => "encrypted"
          }
        case Right((wd, table, _)) =>
          // same includeFootnotes as extraction — see
          // DocExtractor.diagnose (r17 review round 2)
          DocExtractor.extractFromStreams(wd, table, includeFootnotes) match {
            case Left(reason) => reason
            case Right(_) => "empty-text"
          }
      }
    } catch { case _: Exception => "doc-unreadable" }

  override def withPassword(p: String): PageExtractor =
    if (p.isEmpty || p == password) this
    else PasswordedDocExtractor(p, includeFootnotes)
}

/** Binary `.doc` decryption (MS-OFFCRYPTO 2.3.6 "Office Binary Document
  * RC4" family), DECRYPT side — the legacy twin of [[OoxmlDecrypt]].
  * The encryption header lives at the START of the table stream
  * (FibBase.lKey = its size); both the WordDocument and table streams
  * are then RC4-encrypted in 512-byte blocks, block b keyed by the
  * stream-offset block counter (b = offset/512), with the plaintext
  * regions — WordDocument's first 0x44 bytes (FibBase) and the table
  * stream's first lKey bytes (the header itself) — written back OVER
  * the ciphertext by the writer. Decryption therefore processes every
  * 512-byte block and re-patches those prefixes from the original
  * bytes, the convention every public implementation of this format
  * follows. Covered:
  *   - **RC4 v1.1** (2.3.6.1/2.3.6.2 — the Word-97/2000 default): MD5
  *     KDF (trunc-5 password hash, ×16 salt interleave, per-block
  *     MD5(keyBase ++ LE32(b)) 128-bit keys), verifier pair decrypted
  *     as one continuous block-0 keystream, MD5(verifier) check;
  *   - **RC4 CryptoAPI** (2.3.5 inside a binary header — Word
  *     2002/2003 optional): the SHA-1 key schedule ALREADY IN-TREE from
  *     r16 ([[OoxmlDecrypt.rc4CryptoApiKey]]/[[OoxmlDecrypt.rc4CryptoApiVerify]]).
  * Declared out: 40-bit-capped CryptoAPI nuances beyond the shared
  * schedule's zero-pad rule (none exist), and XOR obfuscation (handled
  * upstream — it never reaches this module). Passwords try the shared
  * `[as-typed, NFC]` forms ([[PdfDecrypt.pwdForms]]) so `?password=`
  * behaves format-independently. All JDK crypto; never throws.
  */
private[etl] object DocDecrypt {

  import DocExtractor.{le16, le32} // one decoder per file (r11 rule)

  private def le32b(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte,
      (v >>> 24).toByte)
  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** WordDocument's plaintext prefix: FibBase (0x44 bytes were written
    * in the clear so a reader can route before key derivation).
    */
  private val WdPlainPrefix = 0x44

  /** Decrypt-all-blocks-then-re-patch (see object scaladoc). */
  private def decryptStream(s: Array[Byte], blockKey: Int => Array[Byte],
                            plainPrefix: Int): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var off = 0
    var b = 0
    while (off < s.length) {
      val n = math.min(512, s.length - off)
      val plain = PdfDecrypt.rc4(blockKey(b),
        java.util.Arrays.copyOfRange(s, off, off + n))
      System.arraycopy(plain, 0, out, off, n)
      off += n
      b += 1
    }
    val patch = math.min(math.max(plainPrefix, 0), s.length)
    System.arraycopy(s, 0, out, 0, patch)
    out
  }

  /** RC4 v1.1 key base (MS-OFFCRYPTO 2.3.6.2): trunc5(MD5(pwd16)),
    * interleaved ×16 with the salt into a 336-byte buffer, MD5 again,
    * trunc5. Block-b key = MD5(keyBase ++ LE32(b)), all 16 bytes.
    */
  private def rc4V1KeyBase(salt: Array[Byte],
                           pwd16: Array[Byte]): Array[Byte] = {
    val trunc = java.util.Arrays.copyOf(md5(pwd16), 5)
    val buf = new java.io.ByteArrayOutputStream(336)
    var i = 0
    while (i < 16) { buf.write(trunc); buf.write(salt); i += 1 }
    java.util.Arrays.copyOf(md5(buf.toByteArray), 5)
  }
  private def rc4V1Key(keyBase: Array[Byte], block: Int): Array[Byte] =
    md5(keyBase, le32b(block))

  /** Decrypt a password-protected `.doc`'s already-read (WordDocument,
    * table) streams — the caller owns the single CFB read (r17 review).
    * None ⇔ wrong password, an unsupported scheme, or a FIB that is not
    * RC4-encrypted at all.
    */
  private[etl] def decryptStreams(wd: Array[Byte], table: Array[Byte],
                                  base: DocExtractor.Fib, password: String)
      : Option[(Array[Byte], Array[Byte])] = {
    try {
      if (!base.fEncrypted || base.fObfuscated) return None
      if (base.lKey < 4 || base.lKey > table.length) return None
      val lKey = base.lKey.toInt
      val vMajor = le16(table, 0)
      val vMinor = le16(table, 2)

      // each password form attempts independently (the OoxmlDecrypt
      // r17 rule)
      PdfDecrypt.pwdForms(password).iterator.map { form =>
        try {
          val pwd16 = form.getBytes(StandardCharsets.UTF_16LE)
          (vMajor, vMinor) match {
            case (1, 1) => // RC4 v1.1: version ++ salt16 ++ verifier16 ++ hash16
              if (lKey < 52) None
              else {
                val salt = java.util.Arrays.copyOfRange(table, 4, 20)
                val encV = java.util.Arrays.copyOfRange(table, 20, 36)
                val encVH = java.util.Arrays.copyOfRange(table, 36, 52)
                val keyBase = rc4V1KeyBase(salt, pwd16)
                val both = PdfDecrypt.rc4(rc4V1Key(keyBase, 0), encV ++ encVH)
                val verifier = java.util.Arrays.copyOfRange(both, 0, 16)
                val vHash = java.util.Arrays.copyOfRange(both, 16, 32)
                if (!java.util.Arrays.equals(md5(verifier), vHash)) None
                else Some(rc4V1Key(keyBase, _))
              }
            case (2 | 3 | 4, 2) => // RC4 CryptoAPI binary header
              cryptoApiKeyFn(table, lKey, pwd16)
            case _ => None // anything else (AES in a .doc never shipped)
          }
        } catch { case _: Exception => None }
      }.collectFirst { case Some(blockKey) =>
        (decryptStream(wd, blockKey, WdPlainPrefix),
          decryptStream(table, blockKey, lKey))
      }
    } catch { case _: Exception => None }
  }

  /** Parse the binary-header CryptoAPI layout (version ++ flags ++
    * headerSize ++ EncryptionHeader ++ EncryptedVerifier) and verify;
    * Some(block-key function) on a password match. AlgID must be RC4
    * (0x6801) — an AES AlgID inside a `.doc` is not a real population.
    */
  private def cryptoApiKeyFn(table: Array[Byte], lKey: Int,
                             pwd16: Array[Byte])
      : Option[Int => Array[Byte]] = {
    if (lKey < 12) return None
    val headerSize = le32(table, 8)
    if (headerSize < 32 || 12 + headerSize + 60 > lKey) return None
    val hdr = 12
    val algId = le32(table, hdr + 8)
    if (algId != 0x6801) return None
    val keyBits0 = le32(table, hdr + 16).toInt
    val keyBits = if (keyBits0 == 0) 40 else keyBits0 // 0 = the 40-bit alias
    if (keyBits < 40 || keyBits > 128 || keyBits % 8 != 0) return None
    var p = 12 + headerSize.toInt
    if (le32(table, p) != 16) return None // SaltSize
    val salt = java.util.Arrays.copyOfRange(table, p + 4, p + 20)
    val encVerifier = java.util.Arrays.copyOfRange(table, p + 20, p + 36)
    val verifierHashSize = le32(table, p + 36).toInt
    if (verifierHashSize != 20 || p + 60 > table.length) return None
    val encVerifierHash = java.util.Arrays.copyOfRange(table, p + 40, p + 60)
    OoxmlDecrypt
      .rc4CryptoApiVerify(salt, encVerifier, encVerifierHash, pwd16, keyBits)
      .map(h0 => OoxmlDecrypt.rc4CryptoApiKey(h0, keyBits, _))
  }
}
