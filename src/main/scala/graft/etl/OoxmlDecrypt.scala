package graft.etl

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** ECMA-376 / MS-OFFCRYPTO document decryption, DECRYPT side — the DOCX
  * twin of [[PdfDecrypt]] (r15). A password-protected `.docx` is an
  * OLE/CFB compound file holding two streams: `EncryptionInfo` (the
  * key-derivation parameters) and `EncryptedPackage` (the AES-encrypted
  * OPC zip). Given the caller's password this module validates it
  * against the verifier and returns the decrypted zip bytes, which feed
  * straight into [[DocxExtractor]]'s existing central-directory walk.
  *
  * Covered (the real-world population):
  *   - **Agile encryption** (version 4.4 — Word 2010+): XML descriptor,
  *     SHA-1/256/384/512 spin-count KDF, AES-CBC verifier + key wrap,
  *     per-4096-byte-segment package IVs hashed from the keyData salt;
  *   - **Standard encryption** (versions 3.2/4.2 — Word 2007): binary
  *     header, SHA-1 50 000-iteration KDF + the CryptDeriveKey 0x36/0x5C
  *     expansion, AES-ECB verifier and package;
  *   - **RC4 CryptoAPI** (r16 — AlgID 0x6801 inside a standard-family
  *     header, the Word-2003-compat-mode population): SHA-1 block-keyed
  *     derivation, 512-byte re-keyed package, 40-bit zero-pad rule.
  * Declared out: the deprecated "extensible" providers (x.3) and any
  * other AlgID inside a standard-family header — those carry an
  * `EncryptionInfo` stream, so they quarantine as `encrypted`. Legacy
  * binary `.doc` encryption (RC4 inside the Table stream) has NO
  * EncryptionInfo entry and is not detected here at all — as of r17 it
  * routes to [[DocExtractor]]/[[DocDecrypt]], which share this module's
  * CFB reader and CryptoAPI key schedule.
  *
  * This capability is BEYOND the reference (python-docx cannot open
  * encrypted documents at all); it exists because the engine's
  * password surface (`PageExtractor.withPassword`, `POST
  * /ingest?password=`) would otherwise silently cover only one of the
  * two formats the ingest gate admits.
  *
  * All parsing is bounds-checked and cycle-capped — the bytes are
  * network-admitted attacker input (the r12 codec-hardening rule).
  * Everything is JDK crypto; no provider dependence.
  */
private[etl] object OoxmlDecrypt {

  // ---- minimal CFB (MS-CFB) reader ------------------------------------

  private val EndOfChain = 0xFFFFFFFEL
  private val MaxStreamBytes: Int = Fetch.MaxBodyBytes // decrypt ≤ upload bound
  // EncryptionInfo is 1-2 KB in real files (the XML/binary descriptor);
  // 1 MiB is generous headroom for certificate keyEncryptors while
  // keeping the hot-path existence probe allocation-bounded
  private val MaxInfoBytes: Int = 1 << 20

  /** Structural probe for the detector ([[DocxExtractor
    * .looksLikeEncryptedOoxml]]): CFB magic + an `EncryptionInfo`
    * DIRECTORY entry — never a content byte-scan, which false-positived
    * on documents whose text mentions the name (review r15 round 3).
    * ENTRY EXISTENCE only (review round 4): the probe must not read —
    * or even size-check — the stream, (a) so the boolean costs one
    * directory walk, never a ministream copy a crafted root chain
    * could inflate to the upload bound, and (b) so a TAIL-truncated or
    * size-corrupted encrypted upload still earns the actionable
    * `encrypted` reason instead of regressing to `not-a-docx` (the
    * decrypt path re-validates everything it actually reads).
    * Non-CFB bytes exit on the 8-byte magic.
    */
  private[etl] def hasEncryptionInfo(bytes: Array[Byte]): Boolean =
    readCfbStream(bytes, "EncryptionInfo", probeOnly = true).isDefined

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  private def le64(b: Array[Byte], p: Int): Long =
    le32(b, p) | (le32(b, p + 4) << 32)

  /** The named stream's bytes, or None — walks header DIFAT → FAT →
    * directory, routing small streams through the mini stream / miniFAT
    * exactly as the spec's cutoff demands. Every chain walk is capped at
    * the sector population (a crafted cyclic FAT must not spin).
    */
  private[etl] def readCfbStream(bytes: Array[Byte], name: String,
                                 cap: Int = Int.MaxValue,
                                 probeOnly: Boolean = false)
      : Option[Array[Byte]] = {
    try {
      if (!isCfb(bytes) || bytes.length < 512) return None
      val sizeCap = math.min(cap.toLong, MaxStreamBytes.toLong)
      val sectorShift = le16(bytes, 30)
      if (sectorShift < 7 || sectorShift > 20) return None
      val sectorSize = 1 << sectorShift
      val miniShift = le16(bytes, 32)
      if (miniShift < 4 || miniShift > sectorShift) return None
      val miniSize = 1 << miniShift
      val miniCutoff = le32(bytes, 56)
      val nSectors = math.max(0, (bytes.length - sectorSize) / sectorSize)
      // Long arithmetic throughout (r15 ADVICE): FAT/DIFAT/directory
      // entries carry 32-bit sector numbers up to 0xFFFFFFF9, so
      // (n+1)*sectorSize overflows Int and can wrap into a small
      // positive IN-BOUNDS offset — the off<0/off+size>length guards
      // would pass and the reader would consume wrong bytes. Offsets
      // are computed and bounds-checked in Long, narrowed only after.
      def sectorOff(n: Long): Long = (n + 1) * sectorSize

      // FAT sector list: 109 DIFAT slots in the header, then the DIFAT
      // sector chain (last 4 bytes of each DIFAT sector point onward)
      val fatSectors = {
        val b = Vector.newBuilder[Long]
        var i = 0
        while (i < 109) {
          val v = le32(bytes, 76 + i * 4)
          if (v < 0xFFFFFFFAL) b += v
          i += 1
        }
        var difat = le32(bytes, 68)
        var hops = 0
        val perSector = sectorSize / 4 - 1
        while (difat < 0xFFFFFFFAL && hops <= nSectors) {
          val off = sectorOff(difat)
          if (off < 0 || off + sectorSize > bytes.length) return None
          val o = off.toInt
          var j = 0
          while (j < perSector) {
            val v = le32(bytes, o + j * 4)
            if (v < 0xFFFFFFFAL) b += v
            j += 1
          }
          difat = le32(bytes, o + perSector * 4)
          hops += 1
        }
        b.result()
      }
      val entriesPerFat = sectorSize / 4
      def fatEntry(sector: Long): Long = {
        if (sector < 0) return EndOfChain
        val idx = sector / entriesPerFat
        if (idx >= fatSectors.length) return EndOfChain
        val off = sectorOff(fatSectors(idx.toInt)) + (sector % entriesPerFat) * 4
        if (off < 0 || off + 4 > bytes.length) EndOfChain
        else le32(bytes, off.toInt)
      }
      /** Concatenate a regular-sector chain, clipped to `size` bytes. A
        * REVISITED sector fails the read outright — a crafted cyclic
        * FAT would otherwise self-feed the declared size with repeated
        * sector content (bounded, but silently wrong bytes).
        */
      def readChain(start: Long, size: Long): Option[Array[Byte]] = {
        if (size < 0 || size > MaxStreamBytes) return None
        val out = new java.io.ByteArrayOutputStream(math.min(size, 1 << 20).toInt)
        val seen = new java.util.HashSet[Long]()
        var s = start
        while (s < 0xFFFFFFFAL && out.size < size) {
          if (!seen.add(s)) return None // cyclic chain
          val off = sectorOff(s)
          if (off < 0 || off + sectorSize > bytes.length) return None
          out.write(bytes, off.toInt,
            math.min(sectorSize.toLong, size - out.size).toInt)
          s = fatEntry(s)
        }
        if (out.size < size) None else Some(out.toByteArray)
      }

      // directory entries (128 bytes each) across the directory chain
      val dirBytes = {
        // directory stream size is unrecorded in v3 — walk the chain
        val out = new java.io.ByteArrayOutputStream()
        var s = le32(bytes, 48)
        var hops = 0
        while (s < 0xFFFFFFFAL) {
          if (hops > nSectors) return None
          val off = sectorOff(s)
          if (off < 0 || off + sectorSize > bytes.length) return None
          out.write(bytes, off.toInt, sectorSize)
          s = fatEntry(s)
          hops += 1
        }
        out.toByteArray
      }
      final case class Entry(name: String, objType: Int, start: Long, size: Long)
      val entries = (0 until dirBytes.length / 128).map { i =>
        val p = i * 128
        val nameLen = le16(dirBytes, p + 64) // bytes incl. terminator
        val nm =
          if (nameLen < 2 || nameLen > 64) ""
          else new String(dirBytes, p, nameLen - 2, StandardCharsets.UTF_16LE)
        Entry(nm, dirBytes(p + 66) & 0xff, le32(dirBytes, p + 116),
          le64(dirBytes, p + 120))
      }
      val root = entries.find(_.objType == 5).getOrElse(return None)
      val e = entries.find(en => en.objType == 2 && en.name == name)
        .getOrElse(return None)
      // probe mode answers on entry EXISTENCE — no size gate, no
      // content read (the detector contract above)
      if (probeOnly) return Some(Array.emptyByteArray)
      if (e.size > sizeCap) return None
      if (e.size >= miniCutoff) readChain(e.start, e.size)
      else {
        // mini stream: the root entry's chain holds the backing bytes;
        // miniFAT (its own regular chain) maps 64-byte mini sectors
        val mini = readChain(root.start, root.size).getOrElse(return None)
        val miniFat = readChain(le32(bytes, 60),
          le32(bytes, 64) * sectorSize).getOrElse(return None)
        def miniFatEntry(s: Long): Long = {
          val off = s * 4 // Long: a 32-bit mini-sector number must not wrap
          if (off < 0 || off + 4 > miniFat.length) EndOfChain
          else le32(miniFat, off.toInt)
        }
        val out = new java.io.ByteArrayOutputStream(e.size.toInt)
        val seen = new java.util.HashSet[Long]()
        var s = e.start
        while (s < 0xFFFFFFFAL && out.size < e.size) {
          if (!seen.add(s)) return None // cyclic mini chain
          val off = s * miniSize // Long, same wrap hazard as sectorOff
          if (off < 0 || off + miniSize > mini.length) return None
          out.write(mini, off.toInt,
            math.min(miniSize.toLong, e.size - out.size).toInt)
          s = miniFatEntry(s)
        }
        if (out.size < e.size) None else Some(out.toByteArray)
      }
    } catch { case _: Exception => None }
  }

  private def isCfb(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      bytes(0) == 0xD0.toByte && bytes(1) == 0xCF.toByte &&
      bytes(2) == 0x11.toByte && bytes(3) == 0xE0.toByte &&
      bytes(4) == 0xA1.toByte && bytes(5) == 0xB1.toByte &&
      bytes(6) == 0x1A.toByte && bytes(7) == 0xE1.toByte

  // ---- crypto primitives ----------------------------------------------

  private def digest(alg: String): Option[MessageDigest] =
    alg.toUpperCase match {
      case "SHA1" | "SHA-1" => Some(MessageDigest.getInstance("SHA-1"))
      case "SHA256" | "SHA-256" => Some(MessageDigest.getInstance("SHA-256"))
      case "SHA384" | "SHA-384" => Some(MessageDigest.getInstance("SHA-384"))
      case "SHA512" | "SHA-512" => Some(MessageDigest.getInstance("SHA-512"))
      case "MD5" => Some(MessageDigest.getInstance("MD5"))
      case _ => None
    }

  private def hash(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = digest(alg).get
    parts.foreach(d.update)
    d.digest()
  }

  private def le32b(v: Int): Array[Byte] =
    Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  /** Truncate, or extend with 0x36 bytes, to exactly n (MS-OFFCRYPTO's
    * key/IV sizing rule).
    */
  private def fit(b: Array[Byte], n: Int): Array[Byte] =
    if (b.length == n) b
    else if (b.length > n) java.util.Arrays.copyOf(b, n)
    else b ++ Array.fill(n - b.length)(0x36.toByte)

  private def aes(mode: Int, key: Array[Byte], iv: Option[Array[Byte]],
                  data: Array[Byte]): Array[Byte] = {
    val transform = if (iv.isDefined) "AES/CBC/NoPadding" else "AES/ECB/NoPadding"
    val c = Cipher.getInstance(transform)
    iv match {
      case Some(v) => c.init(mode, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(v))
      case None => c.init(mode, new SecretKeySpec(key, "AES"))
    }
    c.doFinal(data)
  }

  /** The iterated password hash shared by both schemes: H0 = H(salt ++
    * UTF-16LE(password)); Hi = H(LE32(i) ++ Hi−1), i < spinCount.
    */
  private def spinHash(alg: String, salt: Array[Byte], pwd16: Array[Byte],
                       spinCount: Int): Array[Byte] = {
    var h = hash(alg, salt, pwd16)
    var i = 0
    while (i < spinCount) { h = hash(alg, le32b(i), h); i += 1 }
    h
  }

  // ---- agile (4.4) -----------------------------------------------------

  // the spec's fixed block keys for the three password-derived operations
  private val BkVerifierInput = Array(0xfe, 0xa7, 0xd2, 0x76, 0x3b, 0x4b,
    0x9e, 0x79).map(_.toByte)
  private val BkVerifierValue = Array(0xd7, 0xaa, 0x0f, 0x6d, 0x30, 0x61,
    0x34, 0x4e).map(_.toByte)
  private val BkKeyValue = Array(0x14, 0x6e, 0x0b, 0xe7, 0xab, 0xac, 0xd0,
    0xd6).map(_.toByte)

  /** One XML element's attribute, anchored and linear ([^"]* never
    * backtracks catastrophically); `scope` is the element's own tag text.
    */
  private def attr(scope: String, name: String): Option[String] = {
    val re = (java.util.regex.Pattern.quote(name) + "=\"([^\"]*)\"").r
    re.findFirstMatchIn(scope).map(_.group(1))
  }

  private def elementTag(xml: String, localName: String): Option[String] = {
    // matches <keyData …> and <p:encryptedKey …> spellings alike: find
    // the name token, then clip at the tag close
    var p = xml.indexOf(localName)
    while (p >= 0) {
      val before = if (p == 0) ' ' else xml.charAt(p - 1)
      if (before == '<' || before == ':') {
        val e = xml.indexOf('>', p)
        if (e < 0) return None
        return Some(xml.substring(p, e))
      }
      p = xml.indexOf(localName, p + 1)
    }
    None
  }

  private def b64(s: String): Option[Array[Byte]] =
    try Some(java.util.Base64.getDecoder.decode(s))
    catch { case _: IllegalArgumentException => None }

  private def decryptAgile(info: Array[Byte], pkg: Array[Byte],
                           pwd16: Array[Byte]): Option[Array[Byte]] = {
    val xml = new String(info, 8, info.length - 8, StandardCharsets.UTF_8)
    val keyData = elementTag(xml, "keyData").getOrElse(return None)
    // the password key element is the encryptedKey INSIDE the
    // password-keyEncryptor; certificate keyEncryptors carry no
    // spinCount attribute, so anchor on that
    val pk = {
      var tag = Option.empty[String]
      var from = 0
      while (tag.isEmpty) {
        val p = xml.indexOf("encryptedKey", from)
        if (p < 0) return None
        val e = xml.indexOf('>', p)
        if (e < 0) return None
        val t = xml.substring(p, e)
        if (t.contains("spinCount=")) tag = Some(t) else from = e
      }
      tag.get
    }
    val kdAlg = attr(keyData, "hashAlgorithm").getOrElse(return None)
    val kdSalt = attr(keyData, "saltValue").flatMap(b64).getOrElse(return None)
    val kdBlock = attr(keyData, "blockSize").flatMap(_.toIntOption)
      .getOrElse(16)
    val kdKeyBytes = attr(keyData, "keyBits").flatMap(_.toIntOption)
      .getOrElse(256) / 8
    val alg = attr(pk, "hashAlgorithm").getOrElse(return None)
    val salt = attr(pk, "saltValue").flatMap(b64).getOrElse(return None)
    val spin = attr(pk, "spinCount").flatMap(_.toIntOption).getOrElse(return None)
    // attacker-shaped CPU bound (review r15 round 3, CONSIDERED AND
    // KEPT in round 4): 10M — MS-OFFCRYPTO's own "should be less
    // than" ceiling — let one crafted upload burn ~10 s of
    // single-threaded KDF. 2M keeps a 20× margin over the 100 000
    // every real Word writer emits and bounds the burn to the ~1-2 s
    // class. The documented tradeoff: a spec-legal document written
    // with spinCount in (2M, 10M] quarantines `encrypted` even with
    // the right password — that population is, in practice, crafted.
    if (spin < 0 || spin > 2000000) return None
    val keyBytes = attr(pk, "keyBits").flatMap(_.toIntOption)
      .getOrElse(return None) / 8
    val block = attr(pk, "blockSize").flatMap(_.toIntOption).getOrElse(16)
    if (block != 16 || kdBlock != 16) return None // AES only
    val evInput = attr(pk, "encryptedVerifierHashInput").flatMap(b64)
      .getOrElse(return None)
    val evValue = attr(pk, "encryptedVerifierHashValue").flatMap(b64)
      .getOrElse(return None)
    val ekValue = attr(pk, "encryptedKeyValue").flatMap(b64)
      .getOrElse(return None)
    if (digest(alg).isEmpty || digest(kdAlg).isEmpty) return None

    val h = spinHash(alg, salt, pwd16, spin)
    def key(blockKey: Array[Byte]): Array[Byte] =
      fit(hash(alg, h, blockKey), keyBytes)
    val iv = fit(salt, block)
    if (evInput.length % 16 != 0 || evValue.length % 16 != 0 ||
        ekValue.length % 16 != 0) return None
    val verifierInput = aes(Cipher.DECRYPT_MODE, key(BkVerifierInput),
      Some(iv), evInput).take(salt.length)
    val verifierValue = aes(Cipher.DECRYPT_MODE, key(BkVerifierValue),
      Some(iv), evValue)
    val expect = hash(alg, verifierInput)
    if (!java.util.Arrays.equals(expect,
        verifierValue.take(expect.length))) return None // wrong password
    val pkgKey = fit(aes(Cipher.DECRYPT_MODE, key(BkKeyValue), Some(iv),
      ekValue), kdKeyBytes)

    // EncryptedPackage: LE64 plaintext size, then 4096-byte segments,
    // each CBC'd under IV = H_kd(kdSalt ++ LE32(segment)) fitted to the
    // key-data block size
    if (pkg.length < 8) return None
    val size = le64(pkg, 0)
    if (size < 0 || size > pkg.length.toLong * 2 || size > MaxStreamBytes)
      return None
    val out = new java.io.ByteArrayOutputStream(math.min(size, 1L << 20).toInt)
    var off = 8
    var seg = 0
    while (off < pkg.length && out.size < size) {
      val n0 = math.min(4096, pkg.length - off)
      val n = n0 - (n0 % 16) // ciphertext is block-aligned per segment
      if (n <= 0) return None
      val segIv = fit(hash(kdAlg, kdSalt, le32b(seg)), kdBlock)
      out.write(aes(Cipher.DECRYPT_MODE, pkgKey, Some(segIv),
        java.util.Arrays.copyOfRange(pkg, off, off + n)))
      off += n0
      seg += 1
    }
    if (out.size < size) None
    else Some(java.util.Arrays.copyOf(out.toByteArray, size.toInt))
  }

  // ---- standard (3.2 / 4.2) --------------------------------------------

  private def decryptStandard(info: Array[Byte], pkg: Array[Byte],
                              pwd16: Array[Byte]): Option[Array[Byte]] = {
    if (info.length < 12) return None
    val headerSize = le32(info, 8).toInt
    if (headerSize < 32 || 12 + headerSize + 40 > info.length) return None
    val hdr = 12
    val algId = le32(info, hdr + 8)
    val keyBits0 = le32(info, hdr + 16).toInt
    // AES standard family (0x660E/0x660F/0x6610) or RC4 CryptoAPI
    // (0x6801 — r16, the one previously-declared-out scheme whose
    // machinery was already in-tree via PdfDecrypt's RC4); the
    // extensible providers and every other AlgID stay out
    val isRc4 = algId == 0x6801
    if (!isRc4 && algId != 0x660E && algId != 0x660F && algId != 0x6610)
      return None
    // CryptoAPI keySize 0 means 40-bit (MS-OFFCRYPTO 2.3.5.1)
    val keyBits = if (isRc4 && keyBits0 == 0) 40 else keyBits0
    val keyBytes = keyBits / 8
    if (isRc4) {
      if (keyBits < 40 || keyBits > 128 || keyBits % 8 != 0) return None
    } else if (keyBytes < 16 || keyBytes > 32) return None
    var p = 12 + headerSize
    val saltSize = le32(info, p).toInt
    if (saltSize != 16) return None
    val salt = java.util.Arrays.copyOfRange(info, p + 4, p + 4 + 16)
    val encVerifier = java.util.Arrays.copyOfRange(info, p + 20, p + 36)
    val verifierHashSize = le32(info, p + 36).toInt
    if (verifierHashSize <= 0 || verifierHashSize > 64) return None
    // the stored hash field: SHA-1 padded to a whole AES block for the
    // AES family, the raw 20 SHA-1 bytes for the RC4 stream cipher
    val hashFieldLen = if (isRc4) 20 else 32
    if (p + 40 + hashFieldLen > info.length) return None
    val encVerifierHash =
      java.util.Arrays.copyOfRange(info, p + 40, p + 40 + hashFieldLen)

    if (isRc4) return decryptStandardRc4(salt, encVerifier, encVerifierHash,
      pkg, pwd16, keyBits)

    // SHA-1 spin (50 000), the trailing block-0 hash, then the
    // CryptDeriveKey 0x36/0x5C expansion
    val hFinal = hash("SHA1", spinHash("SHA1", salt, pwd16, 50000), le32b(0))
    def expand(pad: Byte): Array[Byte] = {
      val buf = Array.fill(64)(pad)
      var i = 0
      while (i < hFinal.length) { buf(i) = (buf(i) ^ hFinal(i)).toByte; i += 1 }
      hash("SHA1", buf)
    }
    val keyMaterial = expand(0x36) ++ expand(0x5C.toByte)
    val key = java.util.Arrays.copyOf(keyMaterial, keyBytes)

    val verifier = aes(Cipher.DECRYPT_MODE, key, None, encVerifier)
    val vHash = aes(Cipher.DECRYPT_MODE, key, None, encVerifierHash)
    val expect = hash("SHA1", verifier)
    if (!java.util.Arrays.equals(expect, vHash.take(expect.length)))
      return None // wrong password

    if (pkg.length < 8) return None
    val size = le64(pkg, 0)
    if (size < 0 || size > pkg.length.toLong || size > MaxStreamBytes)
      return None
    val body = java.util.Arrays.copyOfRange(pkg, 8,
      8 + ((pkg.length - 8) / 16) * 16)
    val plain = aes(Cipher.DECRYPT_MODE, key, None, body)
    if (plain.length < size) None
    else Some(java.util.Arrays.copyOf(plain, size.toInt))
  }

  /** Block-b RC4 key for the CryptoAPI KDF (MS-OFFCRYPTO 2.3.5.2):
    * SHA-1(H0 ++ LE32(b)) truncated to keyBits/8 — except 40-bit keys,
    * which the spec mandates be the first 5 hash bytes plus 11 zero
    * bytes (a 128-bit RC4 key). Shared with the legacy binary `.doc`
    * decryptor ([[DocDecrypt]], r17) — Word 2002/2003's optional `.doc`
    * encryption uses this exact schedule with H0 from the Table-stream
    * header's salt.
    */
  private[etl] def rc4CryptoApiKey(h0: Array[Byte], keyBits: Int,
                                   block: Int): Array[Byte] = {
    val hb = hash("SHA1", h0, le32b(block))
    if (keyBits == 40) // 5 hash bytes zero-padded to a 128-bit key
      java.util.Arrays.copyOf(java.util.Arrays.copyOf(hb, 5), 16)
    else java.util.Arrays.copyOf(hb, keyBits / 8)
  }

  /** Verify `pwd16` against an RC4 CryptoAPI verifier pair; Some(H0) on
    * a match (H0 = SHA-1(salt ++ password), the block-key seed), None on
    * a wrong password. The pair decrypts as ONE continuous block-0
    * keystream — the fields are adjacent; re-keying per field would
    * reuse the stream. Shared by the OOXML standard-header path and the
    * binary `.doc` path ([[DocDecrypt]]), whose verifier structures are
    * byte-identical (MS-OFFCRYPTO 2.3.5.1 / 2.3.6.3).
    */
  private[etl] def rc4CryptoApiVerify(salt: Array[Byte],
                                      encVerifier: Array[Byte],
                                      encVerifierHash: Array[Byte],
                                      pwd16: Array[Byte],
                                      keyBits: Int): Option[Array[Byte]] = {
    val h0 = hash("SHA1", salt, pwd16)
    val both = PdfDecrypt.rc4(rc4CryptoApiKey(h0, keyBits, 0),
      encVerifier ++ encVerifierHash)
    val verifier = java.util.Arrays.copyOfRange(both, 0, 16)
    val vHash = java.util.Arrays.copyOfRange(both, 16, both.length)
    if (java.util.Arrays.equals(hash("SHA1", verifier), vHash)) Some(h0)
    else None
  }

  /** RC4 CryptoAPI key derivation + decrypt (MS-OFFCRYPTO 2.3.5.2) —
    * the Word-2003-compat population inside a standard-family header
    * (AlgID 0x6801). No spin count, no CryptDeriveKey expansion; see
    * [[rc4CryptoApiKey]]/[[rc4CryptoApiVerify]] for the schedule. The
    * package body re-keys every 512 bytes with the block counter
    * STARTING AT 1 (r17, from r16 advice): block 0 is the verifier
    * pair's, and since a zip's first ~30 plaintext bytes are
    * predictable, numbering the first package block 0 would let
    * ciphertext XOR leak the verifier keystream. No real Word writer
    * emits RC4 OOXML packages — this container is self-defined, and the
    * encrypt-side spec transcription in OoxmlDecryptSpec is the ground
    * truth (the binary `.doc` format avoids the reuse differently: its
    * block-0 keystream positions 0..36 fall in the plaintext-patched
    * header region, so they never meet ciphertext).
    */
  private def decryptStandardRc4(salt: Array[Byte], encVerifier: Array[Byte],
                                 encVerifierHash: Array[Byte],
                                 pkg: Array[Byte], pwd16: Array[Byte],
                                 keyBits: Int): Option[Array[Byte]] = {
    val h0 = rc4CryptoApiVerify(salt, encVerifier, encVerifierHash, pwd16,
      keyBits).getOrElse(return None) // wrong password

    if (pkg.length < 8) return None
    val size = le64(pkg, 0)
    if (size < 0 || size > pkg.length.toLong - 8 || size > MaxStreamBytes)
      return None
    val out = new Array[Byte](size.toInt)
    var off = 8
    var block = 1 // 0 is the verifier's — see scaladoc
    var written = 0
    while (written < size) {
      val n = math.min(512, pkg.length - off)
      if (n <= 0) return None
      val plain = PdfDecrypt.rc4(rc4CryptoApiKey(h0, keyBits, block),
        java.util.Arrays.copyOfRange(pkg, off, off + n))
      val take = math.min(n.toLong, size - written).toInt
      System.arraycopy(plain, 0, out, written, take)
      written += take
      off += n
      block += 1
    }
    Some(out)
  }

  // ---- entry point ------------------------------------------------------

  /** Decrypt a password-protected OOXML container to its OPC zip bytes.
    * None ⇔ wrong password, an unsupported scheme, or bytes that are not
    * an encrypted package at all — the caller keeps its `encrypted`
    * quarantine either way.
    */
  private[etl] def decryptPackage(bytes: Array[Byte],
                                  password: String): Option[Array[Byte]] = {
    try {
      if (!isCfb(bytes)) return None
      val info = readCfbStream(bytes, "EncryptionInfo", cap = MaxInfoBytes)
        .getOrElse(return None)
      val pkg = readCfbStream(bytes, "EncryptedPackage").getOrElse(return None)
      if (info.length < 8) return None
      val major = le16(info, 0)
      val minor = le16(info, 2)
      // try the password as typed, then NFC-normalized (r16, VERDICT
      // #2): Word hashes the keyboard's UTF-16, which is NFC on every
      // real input method — a caller pasting the NFD form of the same
      // Amharic password must still open the document. The raw form
      // stays FIRST so a document hashed from un-normalized bytes (our
      // own r15 behavior) keeps opening with the exact string. Each
      // form attempts INDEPENDENTLY (r17, from r16 advice): an
      // exception inside one candidate's attempt must not abort the
      // remaining forms — exceptions here are structure-driven today,
      // but a per-form failure silently coupling the candidates is the
      // kind of divergence that only shows up when it matters.
      PdfDecrypt.pwdForms(password).iterator.map { form =>
        try {
          val pwd16 = form.getBytes(StandardCharsets.UTF_16LE)
          (major, minor) match {
            case (4, 4) => decryptAgile(info, pkg, pwd16)
            case (2 | 3 | 4, 2) => decryptStandard(info, pkg, pwd16)
            case _ => None // extensible (x.3) and anything newer: declared out
          }
        } catch { case _: Exception => None }
      }.collectFirst { case Some(zip) => zip }
    } catch { case _: Exception => None }
  }
}
