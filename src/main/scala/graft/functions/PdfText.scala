package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Minimal pure-JVM PDF text extraction (reference capability F8:
  * dags/utils/crawl_web.py:41-47 routes `application/pdf` through
  * `UnstructuredPDFLoader`; this container has no PDF library on the
  * classpath, so the engine carries its own extractor for the common
  * case instead of a fixture stub).
  *
  * Honest scope, documented + spec-tested (PdfSpec):
  *  - unencrypted PDFs, content streams stored plain or FlateDecode
  *    (inflated via `java.util.zip` — no external dependency);
  *  - text via `Tj` / `'` / `"` / `TJ` show operators with literal
  *    `(…)` strings (full escape + octal handling) and `<…>` hex
  *    strings, for simple single-byte-encoded fonts;
  *  - TJ kerning adjustments below -100/1000 em render as a space
  *    (the standard text-extraction heuristic); Td, TD, T* and ET
  *    break lines.
  *  Out of scope (returns whatever text is recoverable): CID/Type0
  *  composite fonts, encryption, object streams (/ObjStm), LZW.
  *
  * The byte→string bridge uses ISO-8859-1 throughout so string offsets
  * equal byte offsets and round-trip losslessly.
  */
object PdfText {

  /** Extract text from PDF bytes. Null-safe; returns "" when no text
    * operators are recoverable (never throws on malformed input). */
  def extract(bytes: Array[Byte]): String = {
    if (bytes == null) return null
    val s = new String(bytes, ISO_8859_1)
    val out = new StringBuilder
    var idx = s.indexOf("stream")
    while (idx >= 0) {
      try {
        val objStart = math.max(s.lastIndexOf("obj", idx), 0)
        val dict = s.substring(objStart, idx)
        var dataStart = idx + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        if (end >= 0) {
          var dataEnd = end
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
          if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
          val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          val decoded =
            if (dict.contains("/FlateDecode")) inflate(raw) else Some(raw)
          decoded.map(new String(_, ISO_8859_1)).foreach { cs =>
            if (cs.contains("BT")) {
              val t = extractContent(cs)
              if (t.nonEmpty) {
                if (out.nonEmpty) out += '\n'
                out ++= t
              }
            }
          }
          // skip the whole "endstream" token: searching from `end` would
          // re-match the "stream" inside it and mis-bound every later
          // stream in a multi-stream (i.e. any multi-page) document
          idx = s.indexOf("stream", end + "endstream".length)
        } else idx = -1
      } catch { case _: Exception => idx = s.indexOf("stream", idx + 6) }
    }
    TextFunctions.normalizeWs(out.result())
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream()
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return Some(out.toByteArray) // truncated
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end() // release native zlib memory even on early return
  }

  /** Walk one content stream, emitting the arguments of text-show
    * operators in document order. */
  private[functions] def extractContent(cs: String): String = {
    val out = new StringBuilder
    var lastString = ""
    var inArray = false
    val arrayItems = collection.mutable.ListBuffer.empty[Either[Double, String]]
    var i = 0
    val n = cs.length

    def parseLiteral(start: Int): (String, Int) = {
      val sb = new StringBuilder
      var j = start + 1
      var depth = 1
      while (j < n && depth > 0) {
        cs.charAt(j) match {
          case '\\' if j + 1 < n =>
            cs.charAt(j + 1) match {
              case 'n' => sb += '\n'; j += 2
              case 'r' => sb += '\r'; j += 2
              case 't' => sb += '\t'; j += 2
              case 'b' => sb += '\b'; j += 2
              case 'f' => sb += '\f'; j += 2
              case '(' => sb += '('; j += 2
              case ')' => sb += ')'; j += 2
              case '\\' => sb += '\\'; j += 2
              case '\n' => j += 2 // line continuation
              case '\r' => j += (if (j + 2 < n && cs.charAt(j + 2) == '\n') 3 else 2)
              case d if d >= '0' && d <= '7' =>
                var k = j + 1; var v = 0; var cnt = 0
                while (k < n && cnt < 3 && cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
                  v = v * 8 + (cs.charAt(k) - '0'); k += 1; cnt += 1
                }
                sb += v.toChar; j = k
              case other => sb += other; j += 2
            }
          case '(' => depth += 1; sb += '('; j += 1
          case ')' =>
            depth -= 1
            if (depth > 0) sb += ')'
            j += 1
          case c => sb += c; j += 1
        }
      }
      (sb.result(), j)
    }

    def parseHex(start: Int): (String, Int) = {
      var j = start + 1
      val hex = new StringBuilder
      while (j < n && cs.charAt(j) != '>') {
        val c = cs.charAt(j)
        if (Character.digit(c, 16) >= 0) hex += c
        j += 1
      }
      if (hex.length % 2 == 1) hex += '0'
      val sb = new StringBuilder
      var k = 0
      while (k + 1 < hex.length + 1 && k + 2 <= hex.length) {
        sb += Integer.parseInt(hex.substring(k, k + 2), 16).toChar
        k += 2
      }
      (sb.result(), math.min(j + 1, n))
    }

    def onString(str: String): Unit =
      if (inArray) arrayItems += Right(str) else lastString = str

    while (i < n) {
      val c = cs.charAt(i)
      c match {
        case '(' =>
          val (str, j) = parseLiteral(i); onString(str); i = j
        case '<' if i + 1 < n && cs.charAt(i + 1) == '<' => i += 2
        case '<' =>
          val (str, j) = parseHex(i); onString(str); i = j
        case '[' => inArray = true; arrayItems.clear(); i += 1
        case ']' => inArray = false; i += 1
        case '%' => // comment to end of line
          while (i < n && cs.charAt(i) != '\n' && cs.charAt(i) != '\r') i += 1
        case d if d == '-' || d == '+' || d == '.' || (d >= '0' && d <= '9') =>
          val start = i
          i += 1
          while (i < n && (cs.charAt(i) == '.' || (cs.charAt(i) >= '0' && cs.charAt(i) <= '9'))) i += 1
          if (inArray)
            try arrayItems += Left(cs.substring(start, i).toDouble)
            catch { case _: Exception => () }
        case a if Character.isLetter(a) || a == '\'' || a == '"' || a == '*' =>
          val start = i
          i += 1
          while (i < n && (Character.isLetterOrDigit(cs.charAt(i)) || cs.charAt(i) == '*')) i += 1
          cs.substring(start, i) match {
            case "Tj" => out ++= lastString
            case "TJ" =>
              arrayItems.foreach {
                case Right(str) => out ++= str
                case Left(adj) => if (adj < -100.0) out += ' '
              }
              arrayItems.clear()
            case "'" | "\"" => out += '\n'; out ++= lastString
            case "Td" | "TD" | "T*" => if (out.nonEmpty && out.last != '\n') out += '\n'
            case "ET" => if (out.nonEmpty && out.last != '\n') out += '\n'
            case _ => ()
          }
        case _ => i += 1
      }
    }
    out.result()
  }

  /** UDF over a binary column (e.g. `binaryFile`'s `content`). */
  val pdfToTextUdf: UserDefinedFunction = udf((b: Array[Byte]) => extract(b))
}
