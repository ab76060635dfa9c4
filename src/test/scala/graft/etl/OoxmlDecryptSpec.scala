package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Encrypted-OOXML support (r15): fixtures are built ENCRYPT-SIDE here
  * — the ECMA-376 agile and MS-OFFCRYPTO standard writer algorithms
  * plus a minimal MS-CFB compound-file writer, transcribed
  * independently from the specs — so a transcription error in the
  * decoder's key schedule fails the round trip instead of cancelling
  * out (the PdfDecryptSpec discipline). The CFB writer deliberately
  * places EncryptionInfo in the MINI stream (it is < 4096 bytes, the
  * cutoff rule real Word files obey) so the reader's miniFAT path is
  * exercised, while EncryptedPackage rides regular FAT sectors.
  */
/** Writer-side fixtures shared test-wide (IngestServerSpec drives the
  * REST route end-to-end with the same independently-transcribed
  * encryptors).
  */
private[etl] object OoxmlFixtures {

  // ---- tiny OPC zip (the plaintext package) ---------------------------

  def docx(paragraphs: String*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    val body = paragraphs
      .map(p => s"<w:p><w:r><w:t>$p</w:t></w:r></w:p>").mkString
    z.write(
      s"""<?xml version="1.0"?><w:document><w:body>$body</w:body></w:document>"""
        .getBytes(StandardCharsets.UTF_8))
    z.closeEntry()
    // high-entropy filler entry the extractor never reads: keeps the
    // OPC zip ≥ 4096 bytes so EncryptedPackage lands in REGULAR FAT
    // sectors (a conformant CFB writer routes sub-cutoff streams
    // through the ministream — real Word packages are ≥ 4 KiB, and the
    // ministream path is exercised by EncryptionInfo)
    z.putNextEntry(new java.util.zip.ZipEntry("docProps/pad.bin"))
    var s = 0x2545F491L
    val pad = Array.fill(5000) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte
    }
    z.write(pad)
    z.closeEntry(); z.close()
    out.toByteArray
  }

  // ---- minimal CFB writer (v3, 512-byte sectors) -----------------------

  val Free = 0xFFFFFFFF
  val Eoc = 0xFFFFFFFE

  def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
  def le32(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
    (v >>> 16).toByte, (v >>> 24).toByte)
  def le64(v: Long) = le32(v.toInt) ++ le32((v >>> 32).toInt)

  def dirEntry(name: String, objType: Int, start: Int,
                       size: Long): Array[Byte] = {
    val e = new Array[Byte](128)
    val n = name.getBytes(StandardCharsets.UTF_16LE)
    System.arraycopy(n, 0, e, 0, n.length)
    System.arraycopy(le16(n.length + 2), 0, e, 64, 2)
    e(66) = objType.toByte
    e(67) = 1 // color: black — the reader scans linearly, tree unused
    // left/right/child siblings: NOSTREAM
    for (off <- Seq(68, 72, 76))
      System.arraycopy(le32(Free), 0, e, off, 4)
    System.arraycopy(le32(start), 0, e, 116, 4)
    System.arraycopy(le64(size), 0, e, 120, 8)
    e
  }

  /** Wrap (EncryptionInfo, EncryptedPackage) into a compound file:
    * sector 0 = FAT, 1 = directory, 2 = miniFAT, 3.. = ministream
    * (EncryptionInfo in 64-byte mini sectors), then the package chain.
    */
  def cfb(info: Array[Byte], pkg: Array[Byte],
          infoName: String = "EncryptionInfo",
          pkgName: String = "EncryptedPackage"): Array[Byte] = {
    require(info.length < 4096, "fixture keeps EncryptionInfo in the ministream")
    val miniSectors = (info.length + 63) / 64
    val miniBytes = miniSectors * 64
    val miniStreamSectors = (miniBytes + 511) / 512
    val pkgSectors = (pkg.length + 511) / 512
    val firstMini = 3
    val firstPkg = firstMini + miniStreamSectors
    val totalSectors = firstPkg + pkgSectors
    require(totalSectors <= 128, "fixture fits one FAT sector")

    val fat = new Array[Int](128)
    java.util.Arrays.fill(fat, Free)
    fat(0) = 0xFFFFFFFD // FATSECT
    fat(1) = Eoc // directory
    fat(2) = Eoc // miniFAT
    for (i <- 0 until miniStreamSectors)
      fat(firstMini + i) =
        if (i == miniStreamSectors - 1) Eoc else firstMini + i + 1
    for (i <- 0 until pkgSectors)
      fat(firstPkg + i) = if (i == pkgSectors - 1) Eoc else firstPkg + i + 1

    val miniFat = new Array[Int](128)
    java.util.Arrays.fill(miniFat, Free)
    for (i <- 0 until miniSectors)
      miniFat(i) = if (i == miniSectors - 1) Eoc else i + 1

    val header = new java.io.ByteArrayOutputStream()
    header.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    header.write(new Array[Byte](16)) // clsid
    header.write(le16(0x3E)); header.write(le16(3)) // minor, major v3
    header.write(le16(0xFFFE)) // byte order
    header.write(le16(9)); header.write(le16(6)) // sector/mini shifts
    header.write(new Array[Byte](6)) // reserved
    header.write(le32(0)) // dir sector count (v4 only)
    header.write(le32(1)) // FAT sector count
    header.write(le32(1)) // first directory sector
    header.write(le32(0)) // transaction
    header.write(le32(4096)) // mini stream cutoff
    header.write(le32(2)); header.write(le32(1)) // miniFAT start/count
    header.write(le32(Eoc)); header.write(le32(0)) // DIFAT start/count
    header.write(le32(0)) // DIFAT[0] = FAT sector 0
    for (_ <- 1 until 109) header.write(le32(Free))

    val out = new java.io.ByteArrayOutputStream()
    out.write(header.toByteArray)
    fat.foreach(v => out.write(le32(v))) // sector 0
    // sector 1: directory — root's chain holds the ministream
    out.write(dirEntry("Root Entry", 5, firstMini, miniBytes.toLong))
    out.write(dirEntry(infoName, 2, 0, info.length.toLong))
    out.write(dirEntry(pkgName, 2, firstPkg, pkg.length.toLong))
    out.write(new Array[Byte](128)) // unused entry
    miniFat.foreach(v => out.write(le32(v))) // sector 2
    out.write(java.util.Arrays.copyOf(info, miniStreamSectors * 512))
    out.write(java.util.Arrays.copyOf(pkg, pkgSectors * 512))
    out.toByteArray
  }

  // ---- writer-side crypto (independent transcription) ------------------

  def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update); d.digest()
  }

  def spin(alg: String, salt: Array[Byte], pwd: String,
                   n: Int): Array[Byte] = {
    var h = sha(alg, salt, pwd.getBytes(StandardCharsets.UTF_16LE))
    for (i <- 0 until n) h = sha(alg, le32(i), h)
    h
  }

  def fit36(b: Array[Byte], n: Int): Array[Byte] =
    if (b.length >= n) java.util.Arrays.copyOf(b, n)
    else b ++ Array.fill(n - b.length)(0x36.toByte)

  def aesEnc(key: Array[Byte], iv: Option[Array[Byte]],
                     data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance(
      if (iv.isDefined) "AES/CBC/NoPadding" else "AES/ECB/NoPadding")
    iv match {
      case Some(v) => c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(key, "AES"), new IvParameterSpec(v))
      case None => c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    }
    c.doFinal(data)
  }

  def pad16(b: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOf(b, ((b.length + 15) / 16) * 16)

  def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  /** ECMA-376 agile encryption of `plain` under `password`. */
  def agileDoc(password: String, plain: Array[Byte],
               spinCount: Int = 1000, hashAlg: String = "SHA512",
               keyBits: Int = 256): Array[Byte] = {
    val jdk = hashAlg match {
      case "SHA1" => "SHA-1"; case "SHA256" => "SHA-256"
      case "SHA384" => "SHA-384"; case _ => "SHA-512"
    }
    val keyBytes = keyBits / 8
    val salt = (1 to 16).map(_.toByte).toArray
    val kdSalt = (21 to 36).map(_.toByte).toArray
    val pkgKey = (101 to 132).map(_.toByte).toArray.take(keyBytes)
    val bk1 = Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b, 0x9e, 0x79).map(_.toByte)
    val bk2 = Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61, 0x34, 0x4e).map(_.toByte)
    val bk3 = Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0, 0xd6).map(_.toByte)
    val h = spin(jdk, salt, password, spinCount)
    def key(bk: Array[Byte]) = fit36(sha(jdk, h, bk), keyBytes)
    val iv = fit36(salt, 16)
    val verifierInput = (51 to 66).map(_.toByte).toArray
    val encInput = aesEnc(key(bk1), Some(iv), verifierInput)
    val encValue = aesEnc(key(bk2), Some(iv), pad16(sha(jdk, verifierInput)))
    // the wrapped key pads to a whole AES block (AES-192's 24-byte
    // key is not block-aligned); the decoder fits the decrypted value
    // back to keyBits/8
    val encKeyValue = aesEnc(key(bk3), Some(iv), pad16(pkgKey))
    val segs = plain.grouped(4096).zipWithIndex.map { case (seg, i) =>
      val segIv = fit36(sha(jdk, kdSalt, le32(i)), 16)
      aesEnc(pkgKey, Some(segIv), pad16(seg))
    }
    val pkg = le64(plain.length.toLong) ++ segs.reduce(_ ++ _)
    val xml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption" xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
         |<keyData saltSize="16" blockSize="16" keyBits="$keyBits" hashSize="64" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="$hashAlg" saltValue="${b64(kdSalt)}"/>
         |<keyEncryptors><keyEncryptor uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password">
         |<p:encryptedKey spinCount="$spinCount" saltSize="16" blockSize="16" keyBits="$keyBits" hashSize="64" cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" hashAlgorithm="$hashAlg" saltValue="${b64(salt)}" encryptedVerifierHashInput="${b64(encInput)}" encryptedVerifierHashValue="${b64(encValue)}" encryptedKeyValue="${b64(encKeyValue)}"/>
         |</keyEncryptor></keyEncryptors></encryption>""".stripMargin
    val info = le16(4) ++ le16(4) ++ le32(0x40) ++
      xml.getBytes(StandardCharsets.UTF_8)
    cfb(info, pkg)
  }

  /** MS-OFFCRYPTO standard (Word 2007) encryption: SHA-1 50 000-spin
    * KDF + CryptDeriveKey expansion, AES-128-ECB.
    */
  def standardDoc(password: String, plain: Array[Byte],
                  keyBits: Int = 128): Array[Byte] = {
    val algId = keyBits match {
      case 192 => 0x660F; case 256 => 0x6610; case _ => 0x660E
    }
    val salt = (61 to 76).map(_.toByte).toArray
    val hFinal = sha("SHA-1", spin("SHA-1", salt, password, 50000), le32(0))
    def expand(pad: Byte): Array[Byte] = {
      val buf = Array.fill(64)(pad)
      for (i <- hFinal.indices) buf(i) = (buf(i) ^ hFinal(i)).toByte
      sha("SHA-1", buf)
    }
    val key = java.util.Arrays.copyOf(
      expand(0x36) ++ expand(0x5C.toByte), keyBits / 8)
    val verifier = (81 to 96).map(_.toByte).toArray
    val encVerifier = aesEnc(key, None, verifier)
    val encVerifierHash = aesEnc(key, None,
      java.util.Arrays.copyOf(sha("SHA-1", verifier), 32))
    val csp = ("Microsoft Enhanced RSA and AES Cryptographic Provider\u0000")
      .getBytes(StandardCharsets.UTF_16LE)
    val header = le32(0x24) ++ le32(0) ++ le32(algId) ++ le32(0x8004) ++
      le32(keyBits) ++ le32(0x18) ++ le32(0) ++ le32(0) ++ csp
    val info = le16(4) ++ le16(2) ++ le32(0x24) ++ le32(header.length) ++
      header ++
      (le32(16) ++ salt ++ encVerifier ++ le32(20) ++ encVerifierHash)
    val pkg = le64(plain.length.toLong) ++ aesEnc(key, None, pad16(plain))
    cfb(info, pkg)
  }

  /** MS-OFFCRYPTO RC4 CryptoAPI encryption (r16): standard-family
    * binary header with AlgID 0x6801. Key schedule transcribed from
    * 2.3.5.2 — H0 = SHA-1(salt ++ UTF-16LE(password)), block-b key =
    * SHA-1(H0 ++ LE32(b)) truncated to keyBits/8 (40-bit: 5 bytes
    * zero-padded to 16); verifier + hash encrypted as ONE continuous
    * block-0 keystream; package body re-keyed every 512 bytes with the
    * counter starting at 1 (r17 — block 0 is the verifier's; numbering
    * the predictable zip prefix 0 would leak the verifier keystream).
    * The RC4 primitive is PdfDecrypt's, which PdfDecryptSpec pins
    * against the published known-answer vector first. `keySizeZero`
    * writes the header's KeySize field as 0 — the spec's 40-bit alias.
    */
  def rc4CryptoApiDoc(password: String, plain: Array[Byte],
                      keyBits: Int = 128,
                      keySizeZero: Boolean = false): Array[Byte] = {
    val salt = (131 to 146).map(_.toByte).toArray
    val h0 = sha("SHA-1", salt, password.getBytes(StandardCharsets.UTF_16LE))
    def blockKey(b: Int): Array[Byte] = {
      val hb = sha("SHA-1", h0, le32(b))
      if (keyBits == 40)
        java.util.Arrays.copyOf(java.util.Arrays.copyOf(hb, 5), 16)
      else java.util.Arrays.copyOf(hb, keyBits / 8)
    }
    val verifier = (141 to 156).map(_.toByte).toArray
    val vHash = sha("SHA-1", verifier) // 20 raw bytes: stream cipher
    val encBoth = PdfDecrypt.rc4(blockKey(0), verifier ++ vHash)
    val csp = ("Microsoft Base Cryptographic Provider v1.0 ")
      .getBytes(StandardCharsets.UTF_16LE)
    // Flags = fCryptoAPI only (no fAES); ProviderType = PROV_RSA_FULL
    val header = le32(0x04) ++ le32(0) ++ le32(0x6801) ++ le32(0x8004) ++
      le32(if (keySizeZero) 0 else keyBits) ++ le32(0x01) ++
      le32(0) ++ le32(0) ++ csp
    val info = le16(3) ++ le16(2) ++ le32(0x04) ++ le32(header.length) ++
      header ++
      (le32(16) ++ salt ++ encBoth.take(16) ++ le32(20) ++ encBoth.drop(16))
    val enc = plain.grouped(512).zipWithIndex.map { case (blk, i) =>
      PdfDecrypt.rc4(blockKey(i + 1), blk) // package blocks start at 1
    }.reduce(_ ++ _)
    cfb(info, le64(plain.length.toLong) ++ enc)
  }
}

class OoxmlDecryptSpec extends AnyFunSuite {
  import OoxmlFixtures._

  // ---- tests ------------------------------------------------------------

  private val text = "የፌዴራል ጠቅላይ ፍርድ ቤት ውሳኔ 2015"

  test("agile (4.4, SHA-512/AES-256): right password extracts, wrong stays encrypted") {
    val doc = agileDoc("መክፈቻ-ቁልፍ", docx(text))
    assert(DocxExtractor.looksLikeEncryptedOoxml(doc))
    assert(DocxExtractor.extractPages(doc) === Nil)
    assert(DocxExtractor.diagnose(doc) === "encrypted")
    val right = DocxExtractor.withPassword("መክፈቻ-ቁልፍ")
    assert(right.extractPages(doc) === Seq(text))
    val wrong = DocxExtractor.withPassword("not-it")
    assert(wrong.extractPages(doc) === Nil)
    assert(wrong.diagnose(doc) === "encrypted")
  }

  test("agile: multi-segment package (> 4096 bytes) round-trips across segment IVs") {
    // enough paragraphs that the zip exceeds one 4096-byte segment —
    // each segment gets its own hashed IV, so an indexing slip garbles
    // everything past the first segment
    val paras = (1 to 400).map(i => s"paragraph $i with some words")
    val doc = agileDoc("seg-pwd", docx(paras: _*))
    val pages = DocxExtractor.withPassword("seg-pwd").extractPages(doc)
    assert(pages.size === 1)
    assert(pages.head.contains("paragraph 1 with some words"))
    assert(pages.head.contains("paragraph 400 with some words"))
  }

  test("standard (4.2, SHA-1/AES-128-ECB): right password extracts, wrong stays encrypted") {
    val doc = standardDoc("w2007-pass", docx(text))
    assert(DocxExtractor.withPassword("w2007-pass")
      .extractPages(doc) === Seq(text))
    assert(DocxExtractor.withPassword("nope").extractPages(doc) === Nil)
    assert(DocxExtractor.withPassword("nope").diagnose(doc) === "encrypted")
    assert(DocxExtractor.extractPages(doc) === Nil)
  }

  test("sniffing router: CFB routes to the DOCX codec — passworded decrypts, bare quarantines") {
    val doc = agileDoc("route-pwd", docx(text))
    val bare = SniffingExtractor()
    assert(bare.extractPages(doc) === Nil)
    assert(bare.diagnose(doc) === "encrypted")
    val keyed = SniffingExtractor().withPassword("route-pwd")
    assert(keyed.extractPages(doc) === Seq(text))
    // the same keyed router still refuses a DIFFERENT password's doc
    assert(keyed.extractPages(agileDoc("other", docx(text))) === Nil)
  }

  test("right password, empty body: diagnosis moves past `encrypted` to the real reason") {
    val doc = agileDoc("empty-pwd", docx()) // zero paragraphs
    val keyed = DocxExtractor.withPassword("empty-pwd")
    assert(keyed.extractPages(doc) === Nil)
    assert(keyed.diagnose(doc) === "empty-text")
  }

  test("withPassword semantics match the PDF side: empty is a no-op, plain zips ignore the password") {
    val keyed = DocxExtractor.withPassword("k")
    assert(keyed.withPassword("") eq keyed)
    assert(DocxExtractor.withPassword("") eq DocxExtractor)
    val plain = docx(text)
    assert(keyed.extractPages(plain) === Seq(text))
  }

  test("hardening: truncated CFB, cyclic FAT chains and absent streams all return None, never throw") {
    val good = agileDoc("p", docx(text))
    // truncations at every boundary class
    for (n <- Seq(4, 8, 100, 512, 700, 1200))
      assert(OoxmlDecrypt.decryptPackage(
        java.util.Arrays.copyOf(good, n), "p").isEmpty)
    // cyclic FAT: point the package chain's first sector at itself
    val cyclic = good.clone()
    // FAT lives in sector 0 (file offset 512); find the package start
    // sector from the directory (entry 2, start field at 116)
    val dirOff = 2 * 512 // sector 1
    val pkgStart = (cyclic(dirOff + 256 + 116) & 0xff) |
      ((cyclic(dirOff + 256 + 117) & 0xff) << 8)
    val fatOff = 512 + pkgStart * 4
    cyclic(fatOff) = pkgStart.toByte
    cyclic(fatOff + 1) = (pkgStart >>> 8).toByte
    cyclic(fatOff + 2) = 0; cyclic(fatOff + 3) = 0
    assert(OoxmlDecrypt.decryptPackage(cyclic, "p").isEmpty)
    // a CFB with neither stream
    val empty = cfb("<x/>".getBytes(StandardCharsets.UTF_8),
      new Array[Byte](16))
    assert(OoxmlDecrypt.decryptPackage(
      empty.patch(512 + 512 + 128, new Array[Byte](256), 256).toArray,
      "p").isEmpty)
    // a TAIL-truncated encrypted upload (directory intact, streams cut)
    // still DETECTS as encrypted — the probe is entry-existence only
    // (review r15 round 4: requiring a readable stream regressed the
    // reason to not-a-docx) — while decryption correctly refuses
    val tailCut = java.util.Arrays.copyOf(good, 2048)
    assert(DocxExtractor.looksLikeEncryptedOoxml(tailCut))
    assert(OoxmlDecrypt.decryptPackage(tailCut, "p").isEmpty)
    assert(DocxExtractor.diagnose(tailCut) === "encrypted")
    assert(DocxExtractor.withPassword("p").diagnose(tailCut) === "encrypted")
  }

  test("unsupported schemes quarantine: extensible (4.3) and RC4 CryptoAPI algIds") {
    val good = agileDoc("p", docx(text))
    // rewrite the EncryptionInfo version to 4.3 (extensible) in place:
    // the info stream's first mini sector starts at sector 3
    val ext = good.clone()
    val infoOff = (3 + 1) * 512
    ext(infoOff) = 4; ext(infoOff + 1) = 0 // major 4
    ext(infoOff + 2) = 3; ext(infoOff + 3) = 0 // minor 3
    assert(OoxmlDecrypt.decryptPackage(ext, "p").isEmpty)
    assert(DocxExtractor.withPassword("p").diagnose(ext) === "encrypted")
  }

  test("agile hash x key matrix — SHA1/256/384/512 x AES-128/192/256 all round-trip (the Office 2010+ writer population)") {
    // Office 2010 wrote agile with SHA-1; 2013+ with SHA-512; keyBits
    // follow the writer's policy — the decoder must take every legal
    // combination through the same attribute-driven path
    for (h <- Seq("SHA1", "SHA256", "SHA384", "SHA512");
         kb <- Seq(128, 192, 256)) {
      val txt = s"matrix $h $kb"
      val doc = agileDoc("mx-pwd", docx(txt), hashAlg = h, keyBits = kb)
      assert(DocxExtractor.withPassword("mx-pwd").extractPages(doc)
        === Seq(txt), s"$h/$kb failed to open")
      assert(DocxExtractor.withPassword("wrong").extractPages(doc)
        === Nil, s"$h/$kb opened with a wrong password")
    }
  }

  test("standard AES-192/256 AlgIDs (0x660F/0x6610) round-trip through the CryptDeriveKey expansion") {
    // keyBytes > 20 exercises the X1++X2 concatenation (SHA-1 yields
    // 20 bytes, so AES-192/256 keys must span both expansion halves)
    for (kb <- Seq(192, 256)) {
      val txt = s"std $kb"
      val doc = standardDoc("std-pwd", docx(txt), keyBits = kb)
      assert(DocxExtractor.withPassword("std-pwd").extractPages(doc)
        === Seq(txt), s"std/$kb failed to open")
      assert(DocxExtractor.withPassword("no").extractPages(doc) === Nil)
    }
  }

  test("RC4 CryptoAPI (AlgID 0x6801, r16 VERDICT #3): 128/56-bit round-trip; wrong password keeps `encrypted`") {
    for (kb <- Seq(128, 56)) {
      val txt = s"rc4 $kb-bit $text"
      val doc = rc4CryptoApiDoc("w2003-pass", docx(txt), keyBits = kb)
      assert(DocxExtractor.looksLikeEncryptedOoxml(doc))
      assert(DocxExtractor.extractPages(doc) === Nil) // bare: no password
      assert(DocxExtractor.diagnose(doc) === "encrypted")
      assert(DocxExtractor.withPassword("w2003-pass").extractPages(doc)
        === Seq(txt), s"rc4/$kb failed to open")
      val wrong = DocxExtractor.withPassword("not-it")
      assert(wrong.extractPages(doc) === Nil)
      assert(wrong.diagnose(doc) === "encrypted")
    }
  }

  test("RC4 CryptoAPI 40-bit: 5 hash bytes zero-padded to a 128-bit key; header KeySize 0 is the 40-bit alias") {
    for (zero <- Seq(false, true)) {
      val doc = rc4CryptoApiDoc("forty", docx(text), keyBits = 40,
        keySizeZero = zero)
      assert(DocxExtractor.withPassword("forty").extractPages(doc)
        === Seq(text), s"40-bit (keySizeZero=$zero) failed to open")
      assert(DocxExtractor.withPassword("no").extractPages(doc) === Nil)
    }
  }

  test("RC4 CryptoAPI multi-block package (> 512 bytes) re-keys every block") {
    // a block-counter slip keys block 1+ wrongly and garbles the zip's
    // central directory, so the round trip pins the 512-byte re-key
    val paras = (1 to 300).map(i => s"rc4 paragraph $i")
    val doc = rc4CryptoApiDoc("blocks", docx(paras: _*))
    val pages = DocxExtractor.withPassword("blocks").extractPages(doc)
    assert(pages.size === 1)
    assert(pages.head.contains("rc4 paragraph 1"))
    assert(pages.head.contains("rc4 paragraph 300"))
  }

  test("NFC password normalization (r16 VERDICT #2): NFD-typed input opens an NFC-hashed document, both schemes") {
    // Ethiopic has NO canonical decompositions (NFD == NFC for pure
    // Amharic), so the composed/decomposed split enters through the
    // Latin accent: é (U+00E9) vs e + COMBINING ACUTE (U+0301)
    val nfc = "ፍርድ-ቤት-é"
    val nfd = java.text.Normalizer.normalize(nfc,
      java.text.Normalizer.Form.NFD)
    assert(nfc != nfd)
    // Word hashes the keyboard's NFC form — "encrypted with NFD input"
    // therefore stores NFC-derived values (the writer here receives
    // the already-normalized string, representing Word's behavior)
    for (doc <- Seq(agileDoc(nfc, docx(text), spinCount = 200),
                    standardDoc(nfc, docx(text)),
                    rc4CryptoApiDoc(nfc, docx(text)))) {
      assert(DocxExtractor.withPassword(nfc).extractPages(doc) === Seq(text))
      assert(DocxExtractor.withPassword(nfd).extractPages(doc) === Seq(text))
      assert(DocxExtractor.withPassword("ፍርድ-ቤት-e").extractPages(doc) === Nil)
    }
    // back-compat: a document hashed from the RAW NFD bytes (a
    // writer that does not normalize — the r15 shape) keeps opening
    // with the exact NFD string, because the as-typed form is tried
    // FIRST; the NFC spelling cannot recover it (documented limit)
    val rawNfd = agileDoc(nfd, docx(text), spinCount = 200)
    assert(DocxExtractor.withPassword(nfd).extractPages(rawNfd) === Seq(text))
    assert(DocxExtractor.withPassword(nfc).extractPages(rawNfd) === Nil)
  }

  test("agile password round-trip property over a non-ASCII alphabet (ScalaCheck, r16)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // Amharic + accented-Latin + combining marks + ASCII — swept
    // through the writer (NFC, as Word hashes) and opened with both
    // the NFC and NFD spellings
    val alphabet = Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++
      "ፍርድቤትመንግስትአዋጅ" ++ "éàüñç" :+ '́' :+ ' ')
    val genPwd = Gen.nonEmptyListOf(alphabet).map(_.mkString.take(24))
    val plain = docx(text)
    val prop = Prop.forAll(genPwd) { raw =>
      val nfc = java.text.Normalizer.normalize(raw,
        java.text.Normalizer.Form.NFC)
      val nfd = java.text.Normalizer.normalize(raw,
        java.text.Normalizer.Form.NFD)
      val doc = agileDoc(nfc, plain, spinCount = 50)
      val keyedNfc = DocxExtractor.withPassword(nfc)
      val keyedNfd = DocxExtractor.withPassword(nfd)
      val wrong = DocxExtractor.withPassword(nfc + "x")
      keyedNfc.extractPages(doc) == Seq(text) &&
        keyedNfd.extractPages(doc) == Seq(text) &&
        wrong.extractPages(doc) == Nil && wrong.diagnose(doc) == "encrypted"
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(org.scalacheck.rng.Seed(16L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("sector numbers near 2^31 cannot wrap into in-bounds offsets (r15 ADVICE: Long sector arithmetic)") {
    // start sector 0x00800000: (n+1)*512 = 2^32 + 512 — Int arithmetic
    // wraps that to 512 (the FAT sector, IN bounds), so the pre-fix
    // reader would silently consume FAT bytes as ciphertext; Long
    // arithmetic fails the bounds check and quarantines
    val good = agileDoc("p", docx(text), spinCount = 100)
    val evil = good.clone()
    val pkgEntryStart = 2 * 512 + 2 * 128 + 116 // dir sector, entry 2
    evil(pkgEntryStart) = 0; evil(pkgEntryStart + 1) = 0
    evil(pkgEntryStart + 2) = 0x80.toByte; evil(pkgEntryStart + 3) = 0
    assert(OoxmlDecrypt.decryptPackage(evil, "p").isEmpty)
    assert(DocxExtractor.withPassword("p").diagnose(evil) === "encrypted")
    // same hazard through a FAT entry: splice 0x00800000 into the
    // package chain so the SECOND sector's offset wraps
    val evil2 = good.clone()
    val pkgStart = (evil2(2 * 512 + 2 * 128 + 116) & 0xff) |
      ((evil2(2 * 512 + 2 * 128 + 117) & 0xff) << 8)
    val fatOff = 512 + pkgStart * 4
    evil2(fatOff) = 0; evil2(fatOff + 1) = 0
    evil2(fatOff + 2) = 0x80.toByte; evil2(fatOff + 3) = 0
    assert(OoxmlDecrypt.decryptPackage(evil2, "p").isEmpty)
  }

  test("RC4 ciphertext bit-flip cannot land corrupted text in the GOOD channel (r16 seed-sweep find)") {
    // RC4 is a stream cipher: one flipped ciphertext byte flips exactly
    // one plaintext byte, and raw deflate has no integrity check — so a
    // flip landing in a deflate LITERAL inflated "successfully" into
    // text with one damaged character (seed-5 fuzzing found U+120D →
    // U+FFFD+0x19 extracted as a GOOD document). The zip-entry CRC-32
    // verification now quarantines every such mutant. Scan
    // deterministically for flips that reach the CRC check and pin the
    // outcome; every OTHER flip must keep the original text or Nil.
    val doc = rc4CryptoApiDoc("bits", docx(text))
    val keyed = DocxExtractor.withPassword("bits")
    assert(keyed.extractPages(doc) === Seq(text))
    var crcCaught = 0
    var wrongText = 0
    // the EncryptedPackage rides regular sectors after the ministream;
    // scan a stride through the whole file so pkg ciphertext is covered
    (0 until doc.length by 7).foreach { off =>
      val m = doc.clone(); m(off) = (m(off) ^ 0x01).toByte
      val pages = keyed.extractPages(m)
      if (pages != Seq(text) && pages != Nil) wrongText += 1
      if (pages == Nil && keyed.diagnose(m) == "docx-crc-mismatch")
        crcCaught += 1
    }
    assert(wrongText === 0, s"$wrongText flips extracted corrupted text")
    assert(crcCaught > 0,
      "no flip reached the CRC check — the pin lost its subject")
  }

  test("structural fuzzer (r16 VERDICT #7): random CFB mutations decrypt correctly or quarantine — never throw") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val pwd = "fuzz-pwd"
    val plainPages = Seq(text)
    val corpus = Vector(
      agileDoc(pwd, docx(text), spinCount = 100),
      standardDoc(pwd, docx(text)),
      rc4CryptoApiDoc(pwd, docx(text)))
    // interesting 32-bit values: chain terminators, out-of-range
    // sectors, and Int-overflow bait (the r15 ADVICE class)
    val values = Gen.oneOf(0, 1, 2, 7, 0x80, 0xFFFF, 0x00800000,
      0x40000000, 0x7FFFFFF0, 0xFFFFFFF9, 0xFFFFFFFE, 0xFFFFFFFF)
    def spliceLe32(doc: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val m = doc.clone()
      if (off + 4 <= m.length) System.arraycopy(le32(v), 0, m, off, 4)
      m
    }
    val genMutant: Gen[(String, Array[Byte])] = for {
      doc <- Gen.oneOf(corpus)
      mutant <- Gen.oneOf(
        // header field splice (shifts, cutoff, dir/miniFAT/DIFAT starts)
        for (off <- Gen.oneOf(30, 32, 44, 48, 56, 60, 64, 68, 76, 80);
             v <- values) yield (s"header@$off", spliceLe32(doc, off, v)),
        // FAT entry splice (sector 0)
        for (i <- Gen.choose(0, 127); v <- values)
          yield (s"fat[$i]", spliceLe32(doc, 512 + i * 4, v)),
        // miniFAT entry splice (sector 2)
        for (i <- Gen.choose(0, 127); v <- values)
          yield (s"minifat[$i]", spliceLe32(doc, 3 * 512 + i * 4, v)),
        // directory-entry field flips (4 entries × name-len/type/start/size)
        for (e <- Gen.choose(0, 3); f <- Gen.oneOf(64, 66, 116, 120, 124);
             v <- values)
          yield (s"dir[$e]+$f", spliceLe32(doc, 2 * 512 + e * 128 + f, v)),
        // truncation at any boundary
        for (n <- Gen.choose(0, doc.length - 1))
          yield (s"trunc@$n", java.util.Arrays.copyOf(doc, n)),
        // single-byte pokes anywhere (stream content included)
        for (off <- Gen.choose(0, doc.length - 1); b <- Gen.choose(0, 255))
          yield (s"poke@$off", { val m = doc.clone(); m(off) = b.toByte; m }))
    } yield mutant
    val keyed = DocxExtractor.withPassword(pwd)
    // forAllNoShrink + mutant dump (r17, VERDICT r16 #3): shrinking an
    // Array[Byte] counterexample runs tens of minutes and loses the
    // structural label; the dumped file replays the exact bytes instead
    val prop = Prop.forAllNoShrink(genMutant) { case (label, mutant) =>
      try {
        val pages = keyed.extractPages(mutant)
        val ok = pages == plainPages ||
          (pages == Nil && keyed.diagnose(mutant).nonEmpty)
        if (!ok) println(s"fuzzer: unexpected outcome for $label: $pages " +
          s"(mutant: ${FuzzHarness.dumpMutant("cfb", label, mutant)})")
        ok
      } catch { case e: Throwable =>
        println(s"fuzzer: THREW for $label: $e " +
          s"(mutant: ${FuzzHarness.dumpMutant("cfb", label, mutant)})")
        false
      }
    }
    // 3 rotating seeds × 50 cases = the r16 single-seed budget, but the
    // seed-5 lesson institutionalized: each day's run explores fresh
    // mutation space; the pinned base stays as the regression anchor
    FuzzHarness.checkRotating(1616L, 50, prop)
  }
}
