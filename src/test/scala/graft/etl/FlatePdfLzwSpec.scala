package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Test-side LZW ENCODER (PDF variant) used to build non-Flate fixtures.
  * Width bookkeeping mirrors the decoder exactly: it tracks the DECODER's
  * table length (which lags the encoder's dict by one add) and widens the
  * code at the same emission boundary, so encoder and decoder stay
  * bit-synchronized through 9→12-bit growth under any EarlyChange.
  */
object LzwTestSupport {
  /** `emitEod = false` builds the EOD-less stream shape sloppy real-world
    * encoders produce (the decoder's ran-out-of-input path): with EOD
    * present the bitstream tail is 1-followed-by-zeros, so the final byte
    * always has exactly one 1-bit and can never collide with an EOL byte —
    * only EOD-less streams can legitimately end in 0x0A/0x0D. */
  def lzwEncode(data: Array[Byte], earlyChange: Int = 1,
                emitEod: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var bitBuf = 0L; var nBits = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; nBits += width
      while (nBits >= 8) { out.write(((bitBuf >>> (nBits - 8)) & 0xff).toInt); nBits -= 8 }
    }
    val dict = scala.collection.mutable.HashMap[collection.immutable.ArraySeq[Byte], Int]()
    def seq(bs: Array[Byte]) = collection.immutable.ArraySeq.unsafeWrapArray(bs)
    def reset(): Unit = {
      dict.clear()
      (0 until 256).foreach(i => dict(seq(Array(i.toByte))) = i)
    }
    reset()
    emit(256)
    var next = 258
    var decLen = 258 // the decoder's table length after it reads each code
    var emitted = 0
    def emitData(code: Int): Unit = {
      emit(code); emitted += 1
      if (emitted >= 2) decLen += 1 // decoder adds an entry on every code after its first
      if (decLen >= (1 << width) - earlyChange && width < 12) width += 1
    }
    var cur = Array.empty[Byte]
    data.foreach { b =>
      val ext = cur :+ b
      if (dict.contains(seq(ext))) cur = ext
      else {
        emitData(dict(seq(cur)))
        dict(seq(ext)) = next; next += 1
        cur = Array(b)
      }
    }
    if (cur.nonEmpty) emitData(dict(seq(cur)))
    if (emitEod) emit(257)
    if (nBits > 0) out.write(((bitBuf << (8 - nBits)) & 0xff).toInt)
    out.toByteArray
  }

  /** Minimal single-page PDF whose content stream is LZW-compressed —
    * the non-Flate fixture shape (MultimodalSpec ingests one via
    * binaryFile + the real codec).
    */
  def lzwPdf(pageText: String): Array[Byte] = {
    val content = s"BT /F1 12 Tf ($pageText) Tj ET"
    val comp = lzwEncode(content.getBytes(StandardCharsets.ISO_8859_1))
    val out = new java.io.ByteArrayOutputStream
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w(s"1 0 obj\n<< /Length ${comp.length} /Filter /LZWDecode >>\nstream\n")
    out.write(comp)
    w("\nendstream\nendobj\n")
    w("2 0 obj\n<< /Type /Page /Contents 1 0 R >>\nendobj\n")
    w("%%EOF\n")
    out.toByteArray
  }
}

/** Decoder-side pins for the round-7 codec increment (VERDICT r6 #6):
  * LZWDecode (against the PDF spec's own worked example, byte-exact),
  * PNG/TIFF predictors, ASCIIHexDecode, and chained filters — all
  * through the same `decodeStream` path the extractor uses.
  */
class FlatePdfLzwSpec extends AnyFunSuite {
  import LzwTestSupport._

  private def bytes(is: Int*): Array[Byte] = is.map(_.toByte).toArray

  test("lzwDecode — PDF spec worked example, byte-exact") {
    // ISO 32000-1 §7.4.4.2 sample: 45×5 65 45×3 66 encodes (9-bit codes
    // 256,45,258,258,65,259,66,257) to 80 0B 60 50 22 0C 0C 85 01
    val encoded = bytes(0x80, 0x0B, 0x60, 0x50, 0x22, 0x0C, 0x0C, 0x85, 0x01)
    val expected = bytes(45, 45, 45, 45, 45, 65, 45, 45, 45, 66)
    assert(FlatePdfExtractor.lzwDecode(encoded).map(_.toSeq) === Some(expected.toSeq))
    // and the test encoder reproduces the spec's exact bytes
    assert(lzwEncode(expected).toSeq === encoded.toSeq)
  }

  test("lzwDecode — round-trip through 9→10-bit width growth") {
    // >254 distinct phrases forces the first width bump; repetitive tail
    // exercises long dictionary hits and the KwKwK case
    val text = (0 until 300).map(i => s"tok${i % 97} ").mkString +
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa" + ("ab" * 50)
    val data = text.getBytes(StandardCharsets.ISO_8859_1)
    assert(FlatePdfExtractor.lzwDecode(lzwEncode(data)).map(_.toSeq) === Some(data.toSeq))
    // EarlyChange=0 shifts the widen boundary by one code on both sides
    assert(FlatePdfExtractor.lzwDecode(lzwEncode(data, 0), 0).map(_.toSeq) ===
      Some(data.toSeq))
  }

  test("lzwDecode — garbage never throws") {
    assert(FlatePdfExtractor.lzwDecode(bytes(0xFF, 0xFF, 0xFF)).isEmpty ||
      FlatePdfExtractor.lzwDecode(bytes(0xFF, 0xFF, 0xFF)).nonEmpty) // no exception
    assert(FlatePdfExtractor.lzwDecode(Array.empty[Byte]).map(_.length) === Some(0))
  }

  test("unpredict — PNG Up (12) and Paeth rows restore the original") {
    val rows = Seq(bytes(10, 20, 30, 40, 50), bytes(13, 22, 35, 41, 58))
    // Up filter: each byte stored minus the byte above (row 0's "above" = 0)
    val upEncoded = rows.zipWithIndex.flatMap { case (r, i) =>
      2.toByte +: r.indices.map { j =>
        val up = if (i == 0) 0 else rows(i - 1)(j) & 0xff
        (((r(j) & 0xff) - up) & 0xff).toByte
      }
    }.toArray
    val up = FlatePdfExtractor.unpredict("/Predictor 12 /Columns 5", upEncoded)
    assert(up.toSeq === rows.flatten)
    // Paeth on row 0 degenerates to Sub (left predictor)
    val r0 = bytes(7, 9, 200, 201, 3)
    val paeth = 4.toByte +: r0.indices.map { j =>
      val left = if (j == 0) 0 else r0(j - 1) & 0xff
      (((r0(j) & 0xff) - left) & 0xff).toByte
    }.toArray
    assert(FlatePdfExtractor.unpredict("/Predictor 15 /Columns 5", paeth).toSeq
      === r0.toSeq)
  }

  test("unpredict — TIFF predictor 2 and identity cases") {
    val row = bytes(5, 3, 254, 10) // horizontal deltas of 5, 8, 6, 16
    assert(FlatePdfExtractor.unpredict("/Predictor 2 /Columns 4", row).toSeq
      === bytes(5, 8, 6, 16).toSeq)
    val raw = bytes(1, 2, 3)
    assert(FlatePdfExtractor.unpredict("", raw).toSeq === raw.toSeq)
    assert(FlatePdfExtractor.unpredict("/Predictor 1", raw).toSeq === raw.toSeq)
  }

  test("decodeStream — filter chain [ASCIIHexDecode LZWDecode] and unknown filters") {
    val payload = "chained filters decode in order".getBytes(StandardCharsets.ISO_8859_1)
    val hex = lzwEncode(payload).map(b => f"${b & 0xff}%02X").mkString + ">"
    val chained = FlatePdfExtractor.decodeStream(
      "<< /Filter [ /ASCIIHexDecode /LZWDecode ] >>",
      hex.getBytes(StandardCharsets.ISO_8859_1))
    assert(chained.map(_.toSeq) === Some(payload.toSeq))
    // unknown filter → skipped (None), not mis-decoded
    assert(FlatePdfExtractor.decodeStream("<< /Filter /DCTDecode >>", payload).isEmpty)
    // no filter → raw passthrough
    assert(FlatePdfExtractor.decodeStream("<< /Length 5 >>", payload).map(_.toSeq)
      === Some(payload.toSeq))
  }

  test("decodeStream — FlateDecode with a PNG-predictor DecodeParms (xref-stream shape)") {
    val rows = Seq(bytes(1, 0, 0, 9), bytes(1, 0, 1, 44), bytes(1, 0, 2, 17))
    val predicted = rows.zipWithIndex.flatMap { case (r, i) =>
      2.toByte +: r.indices.map { j =>
        val up = if (i == 0) 0 else rows(i - 1)(j) & 0xff
        (((r(j) & 0xff) - up) & 0xff).toByte
      }
    }.toArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(predicted); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf)
    deflater.end()
    val decoded = FlatePdfExtractor.decodeStream(
      "<< /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >> >>",
      buf.take(n))
    assert(decoded.map(_.toSeq) === Some(rows.flatten))
  }

  test("extractPages — end-to-end LZW-compressed content stream") {
    val pdf = LzwTestSupport.lzwPdf("Hello LZW world")
    val pages = FlatePdfExtractor.extractPages(pdf)
    assert(pages.length === 1)
    assert(pages.head.contains("Hello LZW world"))
  }

  test("decodeStream — RunLengthDecode and ASCII85Decode") {
    // RunLength: literal run (L<128 → next L+1 bytes), repeat run
    // (L>128 → next byte 257-L times), 128 = EOD; bytes after EOD ignored
    val rle = bytes(2, 'a', 'b', 'c', 0xFE, 'x', 0, 'y', 128, 'Z')
    assert(FlatePdfExtractor.decodeStream("<< /Filter /RunLengthDecode >>", rle)
      .map(new String(_, StandardCharsets.ISO_8859_1)) === Some("abcxxxy"))
    // truncated runs are corrupt, not best-effort
    assert(FlatePdfExtractor.decodeStream(
      "<< /Filter /RunLengthDecode >>", bytes(5, 'a')).isEmpty)
    // ASCII85: the canonical "Man " → 9jqo^; z shortcut; partial final
    // group (2 chars → 1 byte); ~> EOD; whitespace ignored
    def a85(s: String) = FlatePdfExtractor.decodeStream(
      "<< /Filter /ASCII85Decode >>", s.getBytes(StandardCharsets.ISO_8859_1))
    assert(a85("9jqo^~>").map(new String(_, StandardCharsets.ISO_8859_1))
      === Some("Man "))
    assert(a85("z~>").map(_.toSeq) === Some(Seq[Byte](0, 0, 0, 0)))
    // whitespace is ignored anywhere between chars
    assert(a85("9j qo\n^~>").map(new String(_, StandardCharsets.ISO_8859_1))
      === Some("Man "))
    // group value above 2^32 ('uuuuu' overflows) and a lone leftover char
    // are both malformed
    assert(a85("uuuuu~>").isEmpty)
    assert(a85("9jqo^5~>").isEmpty)
    // round-trip on arbitrary bytes via a test-side encoder, incl. a
    // PARTIAL final group (258 bytes = 64 full groups + 2 bytes → 3 chars)
    val payload = (0 until 258).map(_.toByte).toArray
    val enc = {
      val sb = new StringBuilder
      payload.grouped(4).foreach { g =>
        val full = g.padTo(4, 0.toByte)
        var v = 0L
        full.foreach(b => v = (v << 8) | (b & 0xff))
        val cs = new Array[Char](5)
        var k = 4
        while (k >= 0) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
        sb.appendAll(cs, 0, g.length + 1)
      }
      sb.append("~>").toString
    }
    assert(a85(enc).map(_.toSeq) === Some(payload.toSeq))
  }

  test("lzwDecode — EOD-less stream ending in an EOL byte is not truncated") {
    // EOL handling belongs to stream FRAMING (stripped once at extraction);
    // a decoder-side strip would delete real bitstream bytes. An
    // EOD-terminated stream's final byte always has exactly one 1-bit
    // (EOD = 1 then zero padding), so the colliding shape is the EOD-LESS
    // stream sloppy encoders emit: find a payload whose encoding ends in
    // 0x0A/0x0D (deterministic search) and require the exact round-trip
    // through decodeStream, which must not strip anything.
    val found = (for {
      len <- (0 until 64).iterator
      last <- (0 until 256).iterator
    } yield {
      val payload = ("x" * len).getBytes(StandardCharsets.ISO_8859_1) :+ last.toByte
      (payload, lzwEncode(payload, emitEod = false))
    }).find { case (_, enc) => enc.last == 0x0A || enc.last == 0x0D }
    assert(found.nonEmpty, "search space produced no EOL-final encoding")
    val (payload, enc) = found.get
    val decoded = FlatePdfExtractor.decodeStream("<< /Filter /LZWDecode >>", enc)
    assert(decoded.map(_.toSeq) === Some(payload.toSeq))
  }

  test("decodeStream — per-stage DecodeParms array in a two-decompressor chain") {
    // /DecodeParms [null <</Predictor 12>>] declares the predictor for the
    // FINAL stage only: un-filtering after the first stage would mangle
    // the intermediate deflate bytes. Chain: LZW(deflate(predicted)).
    val rows = Seq(bytes(1, 0, 0, 9), bytes(1, 0, 1, 44), bytes(1, 0, 2, 17))
    val predicted = rows.zipWithIndex.flatMap { case (r, i) =>
      2.toByte +: r.indices.map { j =>
        val up = if (i == 0) 0 else rows(i - 1)(j) & 0xff
        (((r(j) & 0xff) - up) & 0xff).toByte
      }
    }.toArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(predicted); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf)
    deflater.end()
    val chained = lzwEncode(buf.take(n))
    val decoded = FlatePdfExtractor.decodeStream(
      "<< /Filter [ /LZWDecode /FlateDecode ] " +
        "/DecodeParms [ null << /Predictor 12 /Columns 4 >> ] >>",
      chained)
    assert(decoded.map(_.toSeq) === Some(rows.flatten))
    // a lone parms dict paired with a chain aligns to the decompressor,
    // not to whatever filter happens to sit at index 0
    val hex = buf.take(n).map(b => f"${b & 0xff}%02X").mkString + ">"
    val hexChained = FlatePdfExtractor.decodeStream(
      "<< /Filter [ /ASCIIHexDecode /FlateDecode ] " +
        "/DecodeParms << /Predictor 12 /Columns 4 >> >>",
      hex.getBytes(StandardCharsets.ISO_8859_1))
    assert(hexChained.map(_.toSeq) === Some(rows.flatten))
  }
}
