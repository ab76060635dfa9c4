package graft.etl

import java.nio.charset.StandardCharsets
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Test-scope builder for a password-locked AESV3/R6 PDF, for specs
  * OUTSIDE package graft.etl (PdfDecrypt is private[etl]). Crypto key
  * schedules are pinned independently in PdfDecryptSpec; consumers of
  * this fixture (MultimodalSpec) pin the Spark-side plumbing only.
  */
object EncryptedPdfFixture {

  /** A one-stream PDF whose USER password is `password` (UTF-8). */
  def r6UserLocked(password: String, pageText: String): Array[Byte] = {
    val pwd = password.getBytes(StandardCharsets.UTF_8).take(127)
    val vSalt = (31 to 38).map(_.toByte).toArray
    val kSalt = (41 to 48).map(_.toByte).toArray
    val fileKey32 = (201 to 232).map(_.toByte).toArray
    val u = PdfDecrypt.hash2b(pwd, vSalt, 6) ++ vSalt ++ kSalt
    val ue = {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(PdfDecrypt.hash2b(pwd, kSalt, 6), "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      c.doFinal(fileKey32)
    }
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(s"BT ($pageText) Tj ET".getBytes(StandardCharsets.ISO_8859_1))
      d.finish()
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val enc = {
      val iv = (61 to 76).map(_.toByte).toArray
      val padLen = 16 - (deflated.length % 16)
      val padded = deflated ++ Array.fill(padLen)(padLen.toByte)
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(fileKey32, "AES"),
        new IvParameterSpec(iv))
      iv ++ c.doFinal(padded)
    }
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
    ("%PDF-1.6\n1 0 obj\n<< /Filter /Standard /V 5 /R 6 " +
      "/Length 256 /P -3904 " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF " +
      s"/O <${hex(new Array[Byte](48))}> /OE <${hex(new Array[Byte](32))}> " +
      s"/U <${hex(u)}> /UE <${hex(ue)}> >>\nendobj\n" +
      s"2 0 obj\n<< /Length ${enc.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes(StandardCharsets.ISO_8859_1) ++ enc ++
      ("\nendstream\nendobj\ntrailer << /Encrypt 1 0 R " +
        s"/ID [ <${hex((1 to 16).map(_.toByte).toArray)}> <00> ] >>\n%%EOF\n")
        .getBytes(StandardCharsets.ISO_8859_1)
  }
}
