package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Legacy binary `.doc` fixtures, WRITE-side (r17) — FIB, piece table
  * and the two RC4 encryption schemes transcribed independently from
  * MS-DOC / MS-OFFCRYPTO 2.3.6, so a transcription error in the
  * decoder's FIB navigation or key schedule fails the round trip
  * instead of cancelling out (the OoxmlFixtures discipline). The CFB
  * container reuses [[OoxmlFixtures.cfb]]: the table stream rides the
  * MINISTREAM (< 4096 bytes, as real small tables do) and the
  * WordDocument stream rides regular FAT sectors (padded ≥ the 4096
  * cutoff, as every real WordDocument stream is).
  */
private[graft] object DocFixtures {
  import OoxmlFixtures.{cfb, le16, le32, sha}

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** One text run for the piece table: `compressed` = CP-1252 bytes
    * (fc/2 addressing), else UTF-16LE.
    */
  type Piece = (String, Boolean)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update); d.digest()
  }

  /** Word-97 FIB (nFib 0x00C1 layout): FibBase(32) ++ csw=14 ++
    * FibRgW97(28) ++ cslw=22 ++ FibRgLw97(88) ++ cbRgFcLcb=0x5D ++
    * 93 fc/lcb pairs ++ cswNew=0, zero-padded to 1024 — the text area
    * starts at 1024 like real Word output.
    */
  def fib(ccpText: Int, ccpFtn: Int, fcClx: Int, lcbClx: Int,
          flags: Int = 0, lKey: Int = 0): Array[Byte] = {
    val f = new Array[Byte](1024)
    def put16(p: Int, v: Int): Unit = System.arraycopy(le16(v), 0, f, p, 2)
    def put32(p: Int, v: Int): Unit = System.arraycopy(le32(v), 0, f, p, 4)
    put16(0, 0xA5EC) // wIdent: Word 97+
    put16(2, 0x00C1) // nFib: Word 97
    put16(10, flags | 0x1000) // fExtChar always set in real files
    put16(12, 0x00BF) // nFibBack
    put32(14, lKey)
    put16(32, 14) // csw
    put16(62, 22) // cslw
    put32(76, ccpText) // FibRgLw97[3]
    put32(80, ccpFtn) // FibRgLw97[4]
    put16(152, 0x5D) // cbRgFcLcb (Word 97)
    put32(418, fcClx) // pair 33
    put32(422, lcbClx)
    f
  }

  private final case class Built(wd: Array[Byte], table: Array[Byte],
                                 lKey: Int)

  /** Assemble plaintext (WordDocument, table) streams: text pieces laid
    * out from fc 1024, the Clx at `fcClx` in the table stream (after
    * `tablePrefix` — the encryption header slot), optional leading Prc
    * junk the reader must skip, optional footnote text as a trailing
    * UTF-16 piece covering the ccpFtn range.
    */
  private def buildStreams(pieces: Seq[Piece], ftn: String,
                           tablePrefix: Array[Byte], flags: Int,
                           prcJunk: Boolean): Built = {
    val parts: Seq[Piece] =
      pieces ++ (if (ftn.nonEmpty) Seq((ftn, false)) else Nil)
    var fc = 1024
    val laid = parts.map { case (t, comp) =>
      val bytes = if (comp) t.getBytes(Cp1252) else
        t.getBytes(StandardCharsets.UTF_16LE)
      require(!comp || bytes.length == t.length,
        "compressed fixture text must be CP-1252-clean")
      val fcRaw = if (comp) (fc * 2) | 0x40000000 else fc
      val r = (bytes, t.length, fcRaw)
      fc += bytes.length
      r
    }
    val ccpText = pieces.map(_._1.length).sum
    val ccpFtn = ftn.length
    // PlcPcd: n+1 CPs then n PCDs (2 reserved bytes ++ fc u32 ++ prm u16)
    val n = laid.length
    val plc = new java.io.ByteArrayOutputStream()
    var cp = 0
    plc.write(le32(0))
    laid.foreach { case (_, cpLen, _) => cp += cpLen; plc.write(le32(cp)) }
    laid.foreach { case (_, _, fcRaw) =>
      plc.write(le16(0)); plc.write(le32(fcRaw)); plc.write(le16(0))
    }
    val pcdt = Array(0x02.toByte) ++ le32(plc.size) ++ plc.toByteArray
    val clx =
      (if (prcJunk) Array(0x01.toByte) ++ le16(4) ++ Array[Byte](9, 9, 9, 9)
       else Array.emptyByteArray) ++ pcdt
    // a small gap between the header slot and the Clx proves fcClx is
    // honored, not assumed
    val fcClx = tablePrefix.length + 8
    val table = tablePrefix ++ new Array[Byte](8) ++ clx
    val lKey = tablePrefix.length
    val fibArr = fib(ccpText, ccpFtn, fcClx, clx.length, flags, lKey)
    val textBytes = laid.flatMap(_._1).toArray
    val wdLen = math.max(4096, 1024 + textBytes.length) // regular-sector cutoff
    val wd = new Array[Byte](wdLen)
    System.arraycopy(fibArr, 0, wd, 0, 1024)
    System.arraycopy(textBytes, 0, wd, 1024, textBytes.length)
    Built(wd, table, lKey)
  }

  private def wrap(b: Built, whichTbl1: Boolean): Array[Byte] =
    cfb(b.table, b.wd, if (whichTbl1) "1Table" else "0Table", "WordDocument")

  /** A plain (unencrypted) `.doc`. */
  def doc(pieces: Seq[Piece], ftn: String = "", whichTbl1: Boolean = false,
          prcJunk: Boolean = false, extraFlags: Int = 0): Array[Byte] = {
    val flags = extraFlags | (if (whichTbl1) 0x0200 else 0)
    wrap(buildStreams(pieces, ftn, Array.emptyByteArray, flags, prcJunk),
      whichTbl1)
  }

  /** Encrypt both streams per the binary-format convention: RC4 over
    * every 512-byte block (block b = stream offset / 512), then the
    * plaintext regions — WordDocument[0, 0x44) and table[0, lKey) —
    * written back over the ciphertext.
    */
  private def encStream(s: Array[Byte], blockKey: Int => Array[Byte],
                        plainPrefix: Int): Array[Byte] = {
    val out = s.grouped(512).zipWithIndex.map { case (blk, i) =>
      PdfDecrypt.rc4(blockKey(i), blk)
    }.reduceLeft(_ ++ _)
    System.arraycopy(s, 0, out, 0, plainPrefix)
    out
  }

  /** RC4 v1.1 (MS-OFFCRYPTO 2.3.6.1/2 — the Word-97/2000 default):
    * table-stream header = version(1,1) ++ salt16 ++ encVerifier16 ++
    * encVerifierHash16 (lKey = 52). KDF: keyBase = trunc5(MD5(×16
    * interleave of trunc5(MD5(pwd16)) and salt)); block key =
    * MD5(keyBase ++ LE32(b)). Verifier pair encrypted as one continuous
    * block-0 keystream; MD5 verifier hash.
    */
  def rc4Doc(password: String, pieces: Seq[Piece], ftn: String = "",
             whichTbl1: Boolean = false): Array[Byte] = {
    val pwd16 = password.getBytes(StandardCharsets.UTF_16LE)
    val salt = (201 to 216).map(_.toByte).toArray
    val trunc = java.util.Arrays.copyOf(md5(pwd16), 5)
    val inter = new java.io.ByteArrayOutputStream(336)
    (1 to 16).foreach { _ => inter.write(trunc); inter.write(salt) }
    val keyBase = java.util.Arrays.copyOf(md5(inter.toByteArray), 5)
    def blockKey(b: Int): Array[Byte] = md5(keyBase, le32(b))
    val verifier = (211 to 226).map(_.toByte).toArray
    val encBoth = PdfDecrypt.rc4(blockKey(0), verifier ++ md5(verifier))
    val header = le16(1) ++ le16(1) ++ salt ++
      encBoth.take(16) ++ encBoth.drop(16)
    val flags = 0x0100 | (if (whichTbl1) 0x0200 else 0)
    val b = buildStreams(pieces, ftn, header, flags, prcJunk = false)
    wrap(Built(encStream(b.wd, blockKey, 0x44),
      encStream(b.table, blockKey, b.lKey), b.lKey), whichTbl1)
  }

  /** RC4 CryptoAPI inside the binary header (MS-OFFCRYPTO 2.3.5 via
    * 2.3.6.3 — Word 2002/2003 optional): version(2,2) ++ flags ++
    * headerSize ++ EncryptionHeader(AlgID 0x6801) ++ saltSize ++ salt ++
    * encVerifier ++ verifierHashSize ++ encVerifierHash(20). Key
    * schedule: H0 = SHA-1(salt ++ pwd16); block key = SHA-1(H0 ++
    * LE32(b)) truncated (40-bit: 5 bytes zero-padded to 16).
    */
  def rc4CryptoApiDoc97(password: String, pieces: Seq[Piece],
                        keyBits: Int = 128,
                        keySizeZero: Boolean = false): Array[Byte] = {
    val pwd16 = password.getBytes(StandardCharsets.UTF_16LE)
    val salt = (221 to 236).map(_.toByte).toArray
    val h0 = sha("SHA-1", salt, pwd16)
    def blockKey(b: Int): Array[Byte] = {
      val hb = sha("SHA-1", h0, le32(b))
      if (keyBits == 40)
        java.util.Arrays.copyOf(java.util.Arrays.copyOf(hb, 5), 16)
      else java.util.Arrays.copyOf(hb, keyBits / 8)
    }
    val verifier = (231 to 246).map(_.toByte).toArray
    val encBoth = PdfDecrypt.rc4(blockKey(0),
      verifier ++ sha("SHA-1", verifier))
    val csp = ("Microsoft Base Cryptographic Provider v1.0 ")
      .getBytes(StandardCharsets.UTF_16LE)
    val ehdr = le32(0x04) ++ le32(0) ++ le32(0x6801) ++ le32(0x8004) ++
      le32(if (keySizeZero) 0 else keyBits) ++ le32(0x01) ++
      le32(0) ++ le32(0) ++ csp
    val header = le16(2) ++ le16(2) ++ le32(0x04) ++ le32(ehdr.length) ++
      ehdr ++ (le32(16) ++ salt ++ encBoth.take(16) ++
        le32(20) ++ encBoth.drop(16))
    val b = buildStreams(pieces, "", header, 0x0100, prcJunk = false)
    wrap(Built(encStream(b.wd, blockKey, 0x44),
      encStream(b.table, blockKey, b.lKey), b.lKey), whichTbl1 = false)
  }
}

class DocExtractorSpec extends AnyFunSuite {
  import DocFixtures._

  private val am = "የፌዴራል ጠቅላይ ፍርድ ቤት ውሳኔ 2015"

  test("mixed CP-1252 and UTF-16 pieces decode in CP order; paragraph marks become newlines") {
    val d = doc(Seq(
      ("Federal Supreme Court\r", true), // compressed: fc/2 addressing
      (am + "\r", false), // Ethiopic needs the UTF-16 form
      ("Cassation File No. 12345\r", true)))
    assert(DocExtractor.looksLikeDoc(d))
    assert(DocExtractor.extractPages(d) ===
      Seq(s"Federal Supreme Court\n$am\nCassation File No. 12345"))
  }

  test("windows-1252 high range decodes via the MS-DOC special byte mapping (smart quotes, dashes)") {
    val t = "“quoted” – em—dash …"
    val d = doc(Seq((t + "\r", true)))
    assert(DocExtractor.extractPages(d) === Seq(t))
  }

  test("page breaks (0x0C) split pages with the DOCX blank-page rules") {
    val d = doc(Seq(("page one\r\fpage two\r\f\fpage four\r", false)))
    // explicit blank page survives as ""; trailing text forms the last page
    assert(DocExtractor.extractPages(d) ===
      Seq("page one", "page two", "", "page four"))
    // a trailing break creates no page; an all-blank body is Nil
    assert(DocExtractor.extractPages(doc(Seq(("tail\r\f", false)))) ===
      Seq("tail"))
    assert(DocExtractor.extractPages(doc(Seq(("\r\f\r\f", false)))) === Nil)
    assert(DocExtractor.diagnose(doc(Seq(("\r\f\r\f", false)))) === "empty-text")
  }

  test("field instructions drop, field results keep, nesting honored") {
    // { HYPERLINK "http://x" { PAGE } -> shown text } — instruction
    // spans (0x13..0x14) vanish, the result (0x14..0x15) stays
    val t = "see \u0013 HYPERLINK \"http://x\" \u0013 PAGE \u0014 9 \u0015 " +
      "\u0014the statute\u0015 here\r"
    val d = doc(Seq((t, false)))
    assert(DocExtractor.extractPages(d) === Seq("see the statute here"))
  }

  test("control characters: tab kept, cell/line marks newline, hyphen family, specials dropped") {
    val t = "a\tb\u0007c\u000Bd\u001Ee\u001Ff\u0001g\r"
    val d = doc(Seq((t, true)))
    assert(DocExtractor.extractPages(d) === Seq("a\tb\nc\nd-efg"))
  }

  test("fWhichTblStm routes to 1Table") {
    val d = doc(Seq(("one-table text\r", false)), whichTbl1 = true)
    assert(DocExtractor.extractPages(d) === Seq("one-table text"))
  }

  test("leading Prc blocks in the Clx are skipped to reach the Pcdt") {
    val d = doc(Seq(("after prc\r", false)), prcJunk = true)
    assert(DocExtractor.extractPages(d) === Seq("after prc"))
  }

  test("footnotes are opt-in and append to the last page (the DOCX placement)") {
    val d = doc(Seq(("body text\r", false)), ftn = "see Proc. No. 25/1988\r")
    assert(DocExtractor.extractPages(d) === Seq("body text")) // default: body only
    assert(DocWithFootnotesExtractor.extractPages(d) ===
      Seq("body text\nsee Proc. No. 25/1988"))
    // a no-text body whose notes carry the content emits them as ONE page
    val notesOnly = doc(Seq(("\r", false)), ftn = "only notes\r")
    assert(DocExtractor.extractPages(notesOnly) === Nil)
    assert(DocWithFootnotesExtractor.extractPages(notesOnly) === Seq("only notes"))
  }

  test("sniffing router: .doc routes to the DOC codec; reasons flow through") {
    val sniff = SniffingExtractor()
    val d = doc(Seq((am + "\r", false)))
    assert(sniff.extractPages(d) === Seq(am))
    // non-doc bytes keep the router's own verdict
    assert(sniff.diagnose("plain text".getBytes(StandardCharsets.UTF_8))
      === "not-pdf-or-docx")
    // an encrypted OOXML container still routes to the DOCX codec
    val ooxml = OoxmlFixtures.agileDoc("p", OoxmlFixtures.docx("t"),
      spinCount = 50)
    assert(sniff.diagnose(ooxml) === "encrypted")
    assert(sniff.extractPages(ooxml) === Nil)
  }

  test("Word 6/95 (wIdent 0xA5DC) is declared out with its own reason") {
    val d = doc(Seq(("text\r", false)))
    // rewrite wIdent inside the WordDocument stream: it rides regular
    // sectors after the ministream — find it via the known magic
    val idx = indexOfWd(d)
    val old = d.clone()
    old(idx) = 0xDC.toByte // 0xA5EC -> 0xA5DC
    assert(DocExtractor.extractPages(old) === Nil)
    assert(DocExtractor.diagnose(old) === "doc-unsupported-version")
    assert(SniffingExtractor().diagnose(old) === "doc-unsupported-version")
  }

  test("XOR obfuscation (fObfuscated) quarantines even with a password — no verifier, no silent garbage") {
    val d = doc(Seq(("text\r", false)), extraFlags = 0x8100) // fObfuscated|fEncrypted
    assert(DocExtractor.extractPages(d) === Nil)
    assert(DocExtractor.diagnose(d) === "doc-xor-obfuscated")
    val keyed = DocExtractor.withPassword("pw")
    assert(keyed.extractPages(d) === Nil)
    assert(keyed.diagnose(d) === "doc-xor-obfuscated")
  }

  test("a stray fObfuscated bit WITHOUT fEncrypted is ignored — the spec's MUST, and Word opens such files (r17 review)") {
    // MS-DOC: fObfuscation "MUST be ignored" when fEncrypted is 0; a
    // plain document with a stray bit 15 extracts normally, with or
    // without a password in hand
    val d = doc(Seq(("plain enough\r", true)), extraFlags = 0x8000)
    assert(DocExtractor.extractPages(d) === Seq("plain enough"))
    assert(DocExtractor.withPassword("pw").extractPages(d)
      === Seq("plain enough"))
    assert(DocExtractor.diagnose(d) !== "doc-xor-obfuscated")
  }

  test("footnote-range coverage failure diagnoses as truncated, not empty-text — diagnosis decodes what extraction decoded (r17 review round 2)") {
    // patch ccpFtn so the footnote CP range extends past the piece
    // table: the footnote-including extractor must quarantine WITH the
    // structural reason, while the body-only base codec still extracts
    val d = doc(Seq(("body stands alone\r", false)))
    val bad = d.clone()
    val wdOff = indexOfWd(bad)
    System.arraycopy(OoxmlFixtures.le32(5), 0, bad, wdOff + 80, 4) // ccpFtn
    assert(DocExtractor.extractPages(bad) === Seq("body stands alone"))
    assert(DocWithFootnotesExtractor.extractPages(bad) === Nil)
    assert(DocWithFootnotesExtractor.diagnose(bad)
      === "doc-truncated-or-corrupt")
    val keyed = PasswordedDocExtractor("pw", includeFootnotes = true)
    assert(keyed.extractPages(bad) === Nil)
    assert(keyed.diagnose(bad) === "doc-truncated-or-corrupt")
  }

  test("a piece table that stops short of ccpText quarantines — partial text must not pass as a clean document (r17 review)") {
    // grow the FIB's ccpText past the PlcPcd's last CP: the decode
    // covers fewer chars than requested and the coverage check refuses
    // to emit the truncated text as a good document
    val d = doc(Seq(("body text here\r", false)))
    val bad = d.clone()
    val wdOff = indexOfWd(bad)
    System.arraycopy(OoxmlFixtures.le32("body text here\r".length + 5),
      0, bad, wdOff + 76, 4)
    assert(DocExtractor.extractPages(bad) === Nil)
    assert(DocExtractor.diagnose(bad) === "doc-truncated-or-corrupt")
  }

  test("RC4 v1.1 (Word 97/2000 default): right password extracts, wrong stays encrypted") {
    val d = rc4Doc("የይለፍ-ቃል", Seq(("secret body\r", true), (am + "\r", false)))
    assert(DocExtractor.extractPages(d) === Nil) // bare: no password
    assert(DocExtractor.diagnose(d) === "encrypted")
    val keyed = DocExtractor.withPassword("የይለፍ-ቃል")
    assert(keyed.extractPages(d) === Seq(s"secret body\n$am"))
    val wrong = DocExtractor.withPassword("not-it")
    assert(wrong.extractPages(d) === Nil)
    assert(wrong.diagnose(d) === "encrypted")
  }

  test("RC4 v1.1 multi-block streams re-key every 512 bytes and re-patch the plaintext prefixes") {
    // text long enough that the WordDocument stream spans many blocks —
    // a block-counter slip or a missed FIB re-patch garbles the FIB or
    // the tail pieces
    val long = (1 to 120).map(i => s"paragraph $i of the decision\r")
    val d = rc4Doc("blocks", long.map(t => (t, true)))
    val pages = DocExtractor.withPassword("blocks").extractPages(d)
    assert(pages.size === 1)
    assert(pages.head.startsWith("paragraph 1 of"))
    assert(pages.head.contains("paragraph 120 of"))
  }

  test("RC4 CryptoAPI .doc (Word 2002/2003): 128/40-bit and the KeySize-0 alias all round-trip") {
    for ((kb, zero) <- Seq((128, false), (40, false), (40, true))) {
      val d = rc4CryptoApiDoc97("w2003-pass", Seq((s"capi $kb $am\r", false)),
        keyBits = kb, keySizeZero = zero)
      assert(DocExtractor.extractPages(d) === Nil)
      assert(DocExtractor.diagnose(d) === "encrypted")
      assert(DocExtractor.withPassword("w2003-pass").extractPages(d)
        === Seq(s"capi $kb $am"), s"capi/$kb (zero=$zero) failed to open")
      assert(DocExtractor.withPassword("no").extractPages(d) === Nil)
    }
  }

  test("NFC password normalization covers .doc like the other codecs") {
    val nfc = "ፍርድ-ቤት-é"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    assert(nfc != nfd)
    for (d <- Seq(rc4Doc(nfc, Seq(("t\r", true))),
                  rc4CryptoApiDoc97(nfc, Seq(("t\r", true))))) {
      assert(DocExtractor.withPassword(nfc).extractPages(d) === Seq("t"))
      assert(DocExtractor.withPassword(nfd).extractPages(d) === Seq("t"))
      assert(DocExtractor.withPassword("ፍርድ-ቤት-e").extractPages(d) === Nil)
    }
  }

  test("right password, empty body: diagnosis moves past `encrypted` to the real reason") {
    val d = rc4Doc("open-me", Seq(("\r", true)))
    val keyed = DocExtractor.withPassword("open-me")
    assert(keyed.extractPages(d) === Nil)
    assert(keyed.diagnose(d) === "empty-text")
  }

  test("withPassword semantics: empty is a no-op, plain docs ignore the password") {
    val keyed = DocExtractor.withPassword("k")
    assert(keyed.withPassword("") eq keyed)
    assert(DocExtractor.withPassword("") eq DocExtractor)
    val plain = doc(Seq(("open text\r", false)))
    assert(keyed.extractPages(plain) === Seq("open text"))
    assert(SniffingExtractor().withPassword("k").extractPages(plain)
      === Seq("open text"))
  }

  test("hardening: truncation, corrupt Clx, oversize ccpText — quarantine reasons, never throws") {
    val d = doc(Seq(("text\r", false)))
    for (n <- Seq(4, 8, 100, 512, 700, 1200, 2048))
      assert(DocExtractor.extractPages(java.util.Arrays.copyOf(d, n)) === Nil)
    // a tail-truncated .doc still DETECTS (entry-existence probe) and
    // earns a structural reason, not not-pdf-or-docx
    val tailCut = java.util.Arrays.copyOf(d, 2048)
    assert(DocExtractor.looksLikeDoc(tailCut))
    assert(DocExtractor.diagnose(tailCut) === "doc-truncated-or-corrupt")
    // oversize ccpText: patch the FIB field to 100M
    val big = d.clone()
    val wdOff = indexOfWd(big)
    System.arraycopy(OoxmlFixtures.le32(100 * (1 << 20)), 0, big, wdOff + 76, 4)
    assert(DocExtractor.extractPages(big) === Nil)
    assert(DocExtractor.diagnose(big) === "doc-oversize-text")
    // non-doc bytes keep the standalone verdict (structural mutations
    // are swept broadly by the fuzzer below)
    assert(DocExtractor.diagnose(Array.emptyByteArray) === "not-a-doc")
  }

  test("structural fuzzer: random CFB/FIB/Clx mutations extract correctly or quarantine — never throw") {
    import org.scalacheck.{Gen, Prop}
    val corpus = Vector(
      doc(Seq(("fuzz body\r", true), (am + "\r", false))),
      rc4Doc("fz", Seq(("enc body\r", true))),
      rc4CryptoApiDoc97("fz", Seq(("capi body\r", true))))
    val expect = Vector(Seq(s"fuzz body\n$am"), Seq("enc body"), Seq("capi body"))
    val values = Gen.oneOf(0, 1, 2, 7, 0x80, 0xFFFF, 0x00800000,
      0x40000000, 0x7FFFFFF0, 0xFFFFFFF9, 0xFFFFFFFE, 0xFFFFFFFF)
    def spliceLe32(docBytes: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val m = docBytes.clone()
      if (off + 4 <= m.length) System.arraycopy(OoxmlFixtures.le32(v), 0, m, off, 4)
      m
    }
    // STRICT want-or-Nil for structural mutations (CFB header/FAT
    // splices, truncations): a mangled container must either read
    // perfectly (mutation landed in slack) or quarantine. Single-byte
    // POKES get the weaker never-throw / extract-or-quarantine
    // contract, because MS-DOC carries NO integrity check anywhere —
    // no zip CRC-32, no zlib adler32 — so a poke landing in the text
    // region (or, through RC4's bit-locality, in encrypted text) IS a
    // different well-formed document, and "the text changed" is the
    // correct read of it, for this codec and for Word itself. The
    // honest contract for a checksum-less format (the codec scaladoc
    // documents the property).
    val genStructural: Gen[(String, Int, Array[Byte])] = for {
      idx <- Gen.choose(0, corpus.length - 1)
      d = corpus(idx)
      mutant <- Gen.oneOf(
        for (off <- Gen.oneOf(30, 32, 44, 48, 56, 60, 64, 68, 76, 80);
             v <- values) yield (s"header@$off", spliceLe32(d, off, v)),
        for (i <- Gen.choose(0, 127); v <- values)
          yield (s"fat[$i]", spliceLe32(d, 512 + i * 4, v)),
        for (e <- Gen.choose(0, 3); f <- Gen.oneOf(64, 66, 116, 120, 124);
             v <- values)
          yield (s"dir[$e]+$f", spliceLe32(d, 2 * 512 + e * 128 + f, v)),
        for (n <- Gen.choose(0, d.length - 1))
          yield (s"trunc@$n", java.util.Arrays.copyOf(d, n)))
    } yield (mutant._1, idx, mutant._2)
    val keyed = DocExtractor.withPassword("fz")
    val strict = Prop.forAllNoShrink(genStructural) { case (label, idx, mutant) =>
      try {
        val pages = keyed.extractPages(mutant)
        val ok = pages == expect(idx) ||
          (pages == Nil && keyed.diagnose(mutant).nonEmpty)
        if (!ok) println(s"doc fuzzer: unexpected outcome for $label: $pages " +
          s"(mutant: ${FuzzHarness.dumpMutant("doc", label, mutant)})")
        ok
      } catch { case e: Throwable =>
        println(s"doc fuzzer: THREW for $label: $e " +
          s"(mutant: ${FuzzHarness.dumpMutant("doc", label, mutant)})")
        false
      }
    }
    val genPoke: Gen[(String, Array[Byte])] = for {
      idx <- Gen.choose(0, corpus.length - 1)
      d = corpus(idx)
      off <- Gen.choose(0, d.length - 1)
      b <- Gen.choose(0, 255)
    } yield (s"poke@$off", { val m = d.clone(); m(off) = b.toByte; m })
    val lax = Prop.forAllNoShrink(genPoke) { case (label, mutant) =>
      try {
        val pages = keyed.extractPages(mutant)
        // never throws; a quarantined mutant must carry a reason, and
        // an extracted one must honor the no-all-blank page contract
        if (pages == Nil) keyed.diagnose(mutant).nonEmpty
        else pages.exists(_.trim.nonEmpty)
      } catch { case e: Throwable =>
        println(s"doc fuzzer: THREW for $label: $e " +
          s"(mutant: ${FuzzHarness.dumpMutant("doc", label, mutant)})")
        false
      }
    }
    // rotating seeds (r17, VERDICT r16 #3): 3 × 50 per property keeps
    // the r16-style 150-case budget while each day's run explores fresh
    // mutation space — born-rotated, unlike the r16 codecs' fuzzers
    // which were retrofitted after the seed-5 CRC find
    for (prop <- Seq(strict, lax))
      FuzzHarness.checkRotating(1717L, 50, prop)
  }

  /** Locate the WordDocument stream's start inside the container: it is
    * the only regular-FAT stream in these fixtures, laid out after the
    * ministream sectors, and it begins with the wIdent magic EC A5.
    */
  private def indexOfWd(container: Array[Byte]): Int = {
    var i = 512
    while (i + 1 < container.length &&
           !((container(i) & 0xff) == 0xEC && (container(i + 1) & 0xff) == 0xA5))
      i += 512 // stream starts are sector-aligned
    i
  }
}
