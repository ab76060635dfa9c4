package graft.etl

import java.nio.charset.StandardCharsets
import scala.util.matching.Regex

/** Best-effort pure-JVM PDF text extractor (no external deps — the
  * zero-egress answer to SURVEY §7.4). Handles the dominant
  * machine-generated-PDF shape:
  *   - FlateDecode (zlib) content streams (java.util.zip.Inflater),
  *   - per-font /ToUnicode CMaps (bfchar + bfrange) mapping 2-byte CIDs to
  *     Unicode — which is how the reference corpus encodes Amharic,
  *   - `(…) Tj` literal and `[ <hex> (lit) … ] TJ` array show-text
  *     operators, with the current font tracked via `/Fn … Tf`.
  * One page per content stream containing a text block (matches the
  * reference volumes). Never throws on garbage — returns Nil.
  * Extracts the real Ethiopic text of /root/reference/vol01.pdf (asserted
  * in PipelineSpec).
  */
object FlatePdfExtractor extends PageExtractor {

  private val StreamRe: Regex = """(?s)stream\r?\n(.*?)endstream""".r
  private val ObjRe: Regex = """(?s)(\d+)\s+0\s+obj\s*(.*?)(?:stream\r?\n|endobj)""".r
  private val TfRe: Regex = """/(\w+)\s+[\d.]+\s+Tf""".r
  private val TjRe: Regex = """\(((?:[^()\\]++|\\.)*+)\)\s*Tj""".r
  private val TJRe: Regex = """(?s)\[(.*?)\]\s*TJ""".r
  private val HexRe: Regex = """<([0-9A-Fa-f]+)>""".r
  private val LitRe: Regex = """\(((?:[^()\\]++|\\.)*+)\)""".r
  private val BfCharRe: Regex = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRangeRe: Regex = """(?s)beginbfrange(.*?)endbfrange""".r
  private val HexPairRe: Regex = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
  private val RangeTripleRe: Regex =
    """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r

  def extractPages(bytes: Array[Byte]): Seq[String] = {
    try extract(bytes)
    catch { case _: Exception => Nil }
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val inf = new java.util.zip.Inflater()
      // strip trailing EOL that sits between stream data and "endstream"
      var end = data.length
      while (end > 0 && (data(end - 1) == '\n' || data(end - 1) == '\r')) end -= 1
      inf.setInput(data, 0, end)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return Some(out.toByteArray) // stalled
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  private def extract(bytes: Array[Byte]): Seq[String] = {
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!raw.startsWith("%PDF")) return Nil

    // object number → (header dict text, decoded stream body if any)
    val objs: Map[Int, (String, Option[String])] =
      ObjRe.findAllMatchIn(raw).map { m =>
        val num = m.group(1).toInt
        val dict = m.group(2)
        val body =
          if (m.matched.endsWith("endobj")) None
          else {
            val from = m.end
            StreamRe.findFirstMatchIn(raw.substring(m.start)) match {
              case Some(sm) =>
                val data = raw.substring(m.start + sm.start(1), m.start + sm.end(1))
                  .getBytes(StandardCharsets.ISO_8859_1)
                val decoded =
                  if (dict.contains("/FlateDecode")) inflate(data)
                  else Some(data)
                decoded.map(new String(_, StandardCharsets.ISO_8859_1))
              case None => None
            }
          }
        num -> (dict, body)
      }.toMap

    // ToUnicode CMaps: font object number → cid → unicode string
    def parseCMap(s: String): Map[Int, String] = {
      val out = scala.collection.mutable.Map[Int, String]()
      BfCharRe.findAllMatchIn(s).foreach { m =>
        HexPairRe.findAllMatchIn(m.group(1)).foreach { p =>
          out(Integer.parseInt(p.group(1), 16)) = hexToUnicode(p.group(2))
        }
      }
      BfRangeRe.findAllMatchIn(s).foreach { m =>
        RangeTripleRe.findAllMatchIn(m.group(1)).foreach { t =>
          val lo = Integer.parseInt(t.group(1), 16)
          val hi = Integer.parseInt(t.group(2), 16)
          val dst = Integer.parseInt(t.group(3), 16)
          var c = lo
          while (c <= hi) { out(c) = new String(Character.toChars(dst + (c - lo))); c += 1 }
        }
      }
      out.toMap
    }
    val toUnicodeRe = """/ToUnicode\s+(\d+)\s+0\s+R""".r
    val fontCmaps: Map[Int, Map[Int, String]] = objs.flatMap { case (num, (dict, _)) =>
      toUnicodeRe.findFirstMatchIn(dict).flatMap { m =>
        objs.get(m.group(1).toInt).flatMap(_._2).map(s => num -> parseCMap(s))
      }
    }
    // font resource name (F1, F2, …) → cmap, scraped from /Font <<…>> dicts
    val fontNameRe = """/(\w+)\s+(\d+)\s+0\s+R""".r
    val nameToCmap: Map[String, Map[Int, String]] = objs.values.flatMap { case (dict, _) =>
      val fontIdx = dict.indexOf("/Font")
      if (fontIdx < 0) Nil
      else fontNameRe.findAllMatchIn(dict.substring(fontIdx)).flatMap { m =>
        fontCmaps.get(m.group(2).toInt).map(m.group(1) -> _)
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

  private def decodePage(content: String, fonts: Map[String, Map[Int, String]]): String = {
    // walk the stream once, tracking the current font across Tf/Tj/TJ in order
    val events = (
      TfRe.findAllMatchIn(content).map(m => (m.start, "Tf", m.group(1))) ++
      TjRe.findAllMatchIn(content).map(m => (m.start, "Tj", m.group(1))) ++
      TJRe.findAllMatchIn(content).map(m => (m.start, "TJ", m.group(1)))
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
