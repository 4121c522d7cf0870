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
  *    break lines;
  *  - CID/Type0 composite fonts WITH an embedded /ToUnicode CMap
  *    (the overwhelmingly common case for real-world CJK/Vietnamese
  *    PDFs — writers emit ToUnicode precisely so text extraction
  *    works): bfchar/bfrange mappings are parsed (plain or
  *    FlateDecode'd), the content walk tracks the active font via
  *    `/Name … Tf`, and show-string bytes are decoded as 2-byte codes
  *    through the map (UTF-16BE destinations, surrogates included).
  *  - PDF 1.5 compressed object streams (/ObjStm) are expanded, so
  *    font/page/resource dicts parked there (every modern writer) are
  *    seen by the font scan; content and ToUnicode streams cannot live
  *    inside an ObjStm per spec and are found by the linear stream walk.
  *  - LZWDecode streams decode via the spec's variable-width early-change
  *    algorithm (§7.4.4) — content, CMap, and ObjStm streams alike;
  *  - encrypted documents using the STANDARD security handler with an
  *    empty user password (R2-R4: RC4 40-128 bit and AES-128/AESV2 —
  *    the common crawled "protected but opens without prompting" case):
  *    Algorithm-2 key derivation, per-object keys, streams decrypted
  *    before filters.
  *  Out of scope (returns whatever text is recoverable; the caller's
  *  `extract_status` column counts these as quarantined): Type0 fonts
  *  WITHOUT ToUnicode (Identity-H with external CIDSystemInfo only),
  *  documents requiring a real user password (decrypt to garbage →
  *  quarantined), R5/R6 AES-256, and non-Standard security handlers.
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
    // Modern writers park font/page/resource DICTS inside compressed
    // object streams; expand those into appended plain objects so the
    // font scan sees them. (Streams themselves — content, ToUnicode —
    // cannot live inside an ObjStm per spec, so their absolute offsets
    // in the original bytes stay valid; appending keeps all offsets
    // aligned between expandedS and expandedBytes.)
    // Encrypted documents (standard handler, empty user password): every
    // stream decrypts with its owning object's key BEFORE filters apply.
    val dec = try decryptorOf(s) catch { case _: Exception => None }
    val expandedBytes =
      try bytes ++ expandObjStm(s, bytes, dec).getBytes(ISO_8859_1)
      catch { case _: Exception => bytes }
    val expandedS =
      if (expandedBytes eq bytes) s else new String(expandedBytes, ISO_8859_1)
    val fonts = try fontCMaps(expandedS, expandedBytes, dec)
      catch { case _: Exception => Map.empty[String, CMap] }
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
          val dataEnd = streamDataEnd(dict, dataStart, end, s)
          val raw0 = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
          // cross-reference streams are never encrypted (§7.5.8.2)
          val raw = dec match {
            case Some(d) if !dict.contains("/XRef") =>
              val (num, gen) = objNumGenBefore(s, objStart)
              d.decrypt(num, gen, raw0)
            case _ => raw0
          }
          val decoded =
            decodeStream(dict, raw)
          decoded.map(new String(_, ISO_8859_1)).foreach { cs =>
            if (cs.contains("BT")) {
              val t = extractContent(cs, fonts)
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

  /** CID→Unicode mapping from a /ToUnicode CMap: 2-byte source codes
    * (the Identity-H norm) to UTF-16BE destination strings. */
  private[functions] final case class CMap(codes: Map[Int, String]) {
    /** Decode a show-string whose chars are raw bytes: group into 2-byte
      * big-endian codes, map each; unmapped codes contribute nothing
      * (conservative — a partial map yields partial text, never mojibake). */
    def decode(raw: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i + 1 < raw.length) {
        val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
        codes.get(code).foreach(sb ++= _)
        i += 2
      }
      sb.result()
    }
  }

  /** Total bfchar/bfrange entries honoured per document — a malformed
    * range like <0000> <FFFF> must not allocate unbounded memory. */
  private val MaxCMapEntries = 65536

  /** Parse the bfchar/bfrange sections of a ToUnicode CMap stream. */
  private[functions] def parseCMap(text: String): CMap = {
    val codes = collection.mutable.HashMap.empty[Int, String]
    def hex(h: String): Int = Integer.parseInt(h, 16)
    def utf16(h: String): String = {
      // destination hex is UTF-16BE code units, 4 hex digits each
      val sb = new StringBuilder
      var i = 0
      while (i + 4 <= h.length) { sb += hex(h.substring(i, i + 4)).toChar; i += 4 }
      sb.result()
    }
    val hexTok = "<([0-9A-Fa-f]+)>".r
    // bfchar: pairs <src> <dst>
    for (sec <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(text)) {
      val toks = hexTok.findAllMatchIn(sec.group(1)).map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) if codes.size < MaxCMapEntries =>
          codes(hex(src)) = utf16(dst)
        case _ => ()
      }
    }
    // bfrange: <lo> <hi> <dstStart>  |  <lo> <hi> [<d0> <d1> …]
    for (sec <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(text)) {
      val body = sec.group(1)
      val entry = "(?s)<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s*(<[0-9A-Fa-f]+>|\\[[^\\]]*\\])".r
      for (m <- entry.findAllMatchIn(body)) {
        val lo = hex(m.group(1)); val hi = hex(m.group(2))
        m.group(3) match {
          case arr if arr.startsWith("[") =>
            val dsts = hexTok.findAllMatchIn(arr).map(g => utf16(g.group(1))).toSeq
            dsts.zipWithIndex.foreach { case (d, i) =>
              if (lo + i <= hi && codes.size < MaxCMapEntries) codes(lo + i) = d
            }
          case single =>
            val h = single.stripPrefix("<").stripSuffix(">")
            val base = utf16(h)
            var c = lo
            while (c <= hi && codes.size < MaxCMapEntries) {
              // per spec the offset increments the LAST code unit only
              val d =
                if (base.isEmpty) ""
                else base.dropRight(1) + (base.last + (c - lo)).toChar
              codes(c) = d
              c += 1
            }
        }
      }
    }
    CMap(codes.toMap)
  }

  /** Expand every /Type /ObjStm stream into plain `n 0 obj …\nendobj`
    * text (PDF 1.5 compressed object streams: the dict's /N pair-count
    * and /First byte offset frame a header of `objNum relOffset` integer
    * pairs, then the objects back-to-back). Returns the expansion text
    * to APPEND to the document — appended objects are dict-only (the
    * spec forbids streams inside an ObjStm), so no byte-offset slicing
    * ever lands in the appended region. */
  private[functions] def expandObjStm(s: String, bytes: Array[Byte],
                                      dec: Option[Decryptor] = None): String = {
    val out = new StringBuilder
    var idx = s.indexOf("/ObjStm")
    while (idx >= 0) {
      try {
        val dictStart = math.max(s.lastIndexOf("obj", idx), 0)
        val streamAt = s.indexOf("stream", idx)
        if (streamAt > 0) {
          val dict = s.substring(dictStart, streamAt)
          val n = "/N\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
          val first = "/First\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
          var ds = streamAt + "stream".length
          if (ds < s.length && s.charAt(ds) == '\r') ds += 1
          if (ds < s.length && s.charAt(ds) == '\n') ds += 1
          val de0 = s.indexOf("endstream", ds)
          for (nObjs <- n; firstOff <- first; if de0 > ds) {
            val de = streamDataEnd(dict, ds, de0, s)
            val raw0 = java.util.Arrays.copyOfRange(bytes, ds, de)
            val raw = dec match {
              case Some(d) =>
                val (num, gen) = objNumGenBefore(s, dictStart)
                d.decrypt(num, gen, raw0)
              case None => raw0
            }
            val data =
              decodeStream(dict, raw).getOrElse(Array.empty[Byte])
            val txt = new String(data, ISO_8859_1)
            if (firstOff <= txt.length) {
              val header = txt.substring(0, firstOff).trim
                .split("\\s+").filter(_.nonEmpty).map(_.toLong)
              val pairs = header.grouped(2).collect {
                case Array(num, off) => (num, off)
              }.toSeq.take(nObjs)
              pairs.zipWithIndex.foreach { case ((num, off), i) =>
                val start = firstOff + off.toInt
                val end =
                  if (i + 1 < pairs.length) firstOff + pairs(i + 1)._2.toInt
                  else txt.length
                if (start >= firstOff && start <= end && end <= txt.length)
                  out ++= s"\n$num 0 obj ${txt.substring(start, end)}\nendobj\n"
              }
            }
          }
        }
      } catch { case _: Exception => () } // skip a malformed ObjStm, keep the rest
      idx = s.indexOf("/ObjStm", idx + 7)
    }
    out.result()
  }

  /** Document-wide font-resource-name → ToUnicode CMap. Three linked
    * scans over the raw object structure (no xref needed — robust to the
    * truncated/regenerated files a crawler lands):
    *   1. font dicts `N 0 obj << … /Type0 … /ToUnicode M 0 R … >>`
    *      give fontObj → cmapObj;
    *   2. resource dicts `/Font << /F1 N 0 R … >>` give name → fontObj
    *      (merged document-wide: same-name collisions across pages take
    *      the first definition — the common writer layout reuses one
    *      font object per name);
    *   3. cmap objects' streams (plain or Flate) parse via [[parseCMap]].
    * Simple (non-Type0) fonts get no entry, so their show strings pass
    * through byte-for-byte exactly as before. */
  private[functions] def fontCMaps(s: String, bytes: Array[Byte],
                                   dec: Option[Decryptor] = None): Map[String, CMap] = {
    val objRe = "(\\d+)\\s+0\\s+obj".r
    val objStarts = objRe.findAllMatchIn(s).map(m => (m.group(1).toInt, m.start, m.end)).toSeq
    if (objStarts.isEmpty) return Map.empty
    def objBody(i: Int): String = {
      val end = if (i + 1 < objStarts.length) objStarts(i + 1)._2 else s.length
      s.substring(objStarts(i)._3, end)
    }
    // 1. Type0 font objects → their ToUnicode object number (None when the
    // font has no ToUnicode at all — those map through an EMPTY CMap, so
    // their CID bytes yield no text instead of mojibake, and the document
    // lands in the caller's quarantined count rather than passing garbage)
    val toUni = "(?s)/ToUnicode\\s+(\\d+)\\s+0\\s+R".r
    val fontToCmapObj: Map[Int, Option[Int]] = objStarts.indices.flatMap { i =>
      val body = objBody(i)
      if (body.contains("/Type0"))
        Some(objStarts(i)._1 -> toUni.findFirstMatchIn(body).map(_.group(1).toInt))
      else None
    }.toMap
    if (fontToCmapObj.isEmpty) return Map.empty
    // 2. resource names → font object numbers
    val nameRef = "/([\\w.-]+)\\s+(\\d+)\\s+0\\s+R".r
    val fontDict = "(?s)/Font\\s*<<(.*?)>>".r
    val nameToFont = collection.mutable.HashMap.empty[String, Int]
    for (m <- fontDict.findAllMatchIn(s); r <- nameRef.findAllMatchIn(m.group(1)))
      if (!nameToFont.contains(r.group(1))) nameToFont(r.group(1)) = r.group(2).toInt
    // 3. parse each referenced cmap object's stream once
    val cmapByObj = collection.mutable.HashMap.empty[Int, Option[CMap]]
    def cmapFor(objNum: Int): Option[CMap] = cmapByObj.getOrElseUpdate(objNum, {
      objStarts.indexWhere(_._1 == objNum) match {
        case -1 => None
        case i =>
          val body = objBody(i)
          val streamAt = body.indexOf("stream")
          if (streamAt < 0) None
          else {
            val dict = body.substring(0, streamAt)
            var ds = streamAt + "stream".length
            if (ds < body.length && body.charAt(ds) == '\r') ds += 1
            if (ds < body.length && body.charAt(ds) == '\n') ds += 1
            val de0 = body.indexOf("endstream", ds)
            if (de0 < 0) None
            else {
              val de = streamDataEnd(dict, ds, de0, body)
              val absStart = objStarts(i)._3 + ds
              val raw0 = java.util.Arrays.copyOfRange(bytes, absStart,
                objStarts(i)._3 + de)
              val raw = dec.map(_.decrypt(objNum, 0, raw0)).getOrElse(raw0)
              val txt = decodeStream(dict, raw).map(new String(_, ISO_8859_1))
              txt.filter(_.contains("beginbf")).map(parseCMap)
                .filter(_.codes.nonEmpty)
            }
          }
      }
    })
    nameToFont.iterator.flatMap { case (name, fontObj) =>
      fontToCmapObj.get(fontObj).map { cmapObj =>
        name -> cmapObj.flatMap(cmapFor).getOrElse(CMap(Map.empty))
      }
    }.toMap
  }

  /** End of a stream's data: prefer the dict's direct /Length (spec-
    * authoritative — a ciphertext or flate byte that happens to be \r/\n
    * must NOT be trimmed), falling back to the EOL-before-endstream trim
    * when /Length is absent or an indirect reference. */
  private def streamDataEnd(dict: String, dataStart: Int, endstreamAt: Int,
                            s: String): Int = {
    // (?!\d) forbids backtracking into the number (else "/Length 1234 0 R"
    // matches with the capture shrunk to "123"); the second lookahead then
    // reliably rejects indirect references.
    val direct = "/Length\\s+(\\d+)(?!\\d)(?!\\s+\\d+\\s+R)".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt)
      .filter(n => n >= 0 && dataStart.toLong + n <= endstreamAt)
    direct.map(dataStart + _).getOrElse {
      var dataEnd = endstreamAt
      if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
      if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
      dataEnd
    }
  }

  /** Apply the stream dict's declared filter: Flate, LZW, or none. */
  private def decodeStream(dict: String, raw: Array[Byte]): Option[Array[Byte]] =
    if (dict.contains("/FlateDecode")) inflate(raw)
    else if (dict.contains("/LZWDecode")) lzwDecode(raw)
    else Some(raw)

  /** Plain RC4 (KSA + PRGA) — symmetric, ~15 lines, no provider needed.
    * Pinned against the classic "Key"/"Plaintext" vector in PdfSpec. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val S = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + S(i) + key(i % key.length)) & 0xff
      val t = S(i); S(i) = S(j); S(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + S(i)) & 0xff
      val t = S(i); S(i) = S(j); S(j) = t
      out(k) = (data(k) ^ S((S(i) + S(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** Standard-security-handler stream decryption (PDF 32000 §7.6.2/3)
    * with the EMPTY user password — the common crawled case: "protected"
    * PDFs every viewer opens without prompting. Per-object key =
    * MD5(fileKey ‖ objNum[3 LE] ‖ gen[2 LE] ‖ ("sAlT" for AES)),
    * truncated to min(len+5, 16); RC4, or AES-128-CBC with a 16-byte IV
    * prefix and PKCS#7 padding. A non-empty-user-password document
    * decrypts to garbage, extracts nothing, and lands in the counted
    * `extract_status` quarantine — same posture as the other scope
    * boundaries. */
  private[graft] final case class Decryptor(fileKey: Array[Byte], aes: Boolean) {
    def decrypt(objNum: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array[Byte]((objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
        ((objNum >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54))
      val okey = md.digest().take(math.min(fileKey.length + 5, 16))
      if (aes) {
        if (data.length < 32 || (data.length % 16) != 0) return Array.empty
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(okey, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        val plain = c.doFinal(data.drop(16))
        val pad = plain.last & 0xff
        if (pad >= 1 && pad <= 16 && pad <= plain.length) plain.dropRight(pad)
        else plain
      } else rc4(okey, data)
    }
  }

  /** The Algorithm-2 padding string (PDF 32000 Table 21 / §7.6.3.3). */
  private val PwPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Parse a PDF string (literal `(…)` with escapes/octal, or hex `<…>`)
    * starting at the first non-space after `from`. Returns raw bytes. */
  private def pdfStringAt(s: String, from: Int): Option[Array[Byte]] = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) return None
    s.charAt(i) match {
      case '(' =>
        val sb = new java.io.ByteArrayOutputStream()
        var j = i + 1; var depth = 1
        while (j < s.length && depth > 0) {
          s.charAt(j) match {
            case '\\' if j + 1 < s.length =>
              s.charAt(j + 1) match {
                case 'n' => sb.write('\n'); j += 2
                case 'r' => sb.write('\r'); j += 2
                case 't' => sb.write('\t'); j += 2
                case 'b' => sb.write('\b'); j += 2
                case 'f' => sb.write('\f'); j += 2
                case d if d >= '0' && d <= '7' =>
                  var k = j + 1; var v = 0; var c = 0
                  while (k < s.length && c < 3 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                    v = v * 8 + (s.charAt(k) - '0'); k += 1; c += 1
                  }
                  sb.write(v); j = k
                case other => sb.write(other); j += 2
              }
            case '(' => depth += 1; sb.write('('); j += 1
            case ')' => depth -= 1; if (depth > 0) sb.write(')'); j += 1
            case c => sb.write(c); j += 1
          }
        }
        Some(sb.toByteArray)
      case '<' =>
        val end = s.indexOf('>', i)
        if (end < 0) None
        else {
          val hex = s.substring(i + 1, end).filter(c => Character.digit(c, 16) >= 0)
          val h = if (hex.length % 2 == 1) hex + "0" else hex
          Some(h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        }
      case _ => None
    }
  }

  /** Build the standard-handler decryptor for an encrypted document
    * (Algorithm 2 with the empty user password). None when the document
    * is unencrypted, uses a non-Standard handler, or an unsupported
    * revision. */
  private[graft] def decryptorOf(s: String): Option[Decryptor] = {
    val encRef = "/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(s)
    if (encRef.isEmpty) return None
    val num = encRef.get.group(1).toInt
    val m = ("(?s)\\b" + num + "\\s+\\d+\\s+obj(.{0,2048})").r.findFirstMatchIn(s)
    val bodyAll = m.map(_.group(1)).getOrElse(return None)
    // cut at endobj so a following object's entries can't bleed in
    val body = bodyAll.indexOf("endobj") match {
      case -1 => bodyAll
      case e => bodyAll.substring(0, e)
    }
    if (!body.contains("/Standard")) return None
    def intOf(key: String, dflt: Int): Int =
      ("/" + key + "\\s+(-?\\d+)").r.findFirstMatchIn(body)
        .map(_.group(1).toInt).getOrElse(dflt)
    val r = intOf("R", 0)
    if (r < 2 || r > 4) return None
    val aes = body.contains("/AESV2")
    // the top-level /Length is in BITS (40-256); crypt-filter dicts carry
    // a /Length in BYTES (e.g. 16) that can appear FIRST in the dict —
    // take the first bit-ranged value, and AESV2 is 128-bit by definition
    val length =
      if (aes) 128
      else "/Length\\s+(\\d+)".r.findAllMatchIn(body).map(_.group(1).toInt)
        .find(_ >= 40).getOrElse(40)
    val p = intOf("P", -1)
    val oAt = body.indexOf("/O")
    if (oAt < 0) return None
    val o = pdfStringAt(body, oAt + 2).getOrElse(return None)
    if (o.length < 32) return None
    val idAt = s.lastIndexOf("/ID")
    val id: Array[Byte] =
      if (idAt < 0) Array.empty
      else {
        val br = s.indexOf('[', idAt)
        if (br < 0) Array.empty
        else pdfStringAt(s, br + 1).getOrElse(Array.empty)
      }
    val keyLen = if (r == 2) 5 else math.max(5, math.min(16, length / 8))
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(PwPad) // empty user password = pad alone
    md.update(o, 0, 32)
    md.update(Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte))
    md.update(id)
    if (r >= 4 && body.contains("/EncryptMetadata false"))
      md.update(Array[Byte](-1, -1, -1, -1))
    var key = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        key = java.security.MessageDigest.getInstance("MD5")
          .digest(key.take(keyLen))
        i += 1
      }
    }
    Some(Decryptor(key.take(keyLen), aes))
  }

  /** The `N G` pair immediately before an `obj` token at `objTokenStart`. */
  private def objNumGenBefore(s: String, objTokenStart: Int): (Int, Int) = {
    val head = s.substring(math.max(0, objTokenStart - 24), objTokenStart)
    "(\\d+)\\s+(\\d+)\\s*$".r.findFirstMatchIn(head)
      .map(m => (m.group(1).toInt, m.group(2).toInt)).getOrElse((0, 0))
  }

  /** PDF/TIFF LZWDecode (PDF 32000-1:2008 §7.4.4): variable code width
    * 9→12 bits, MSB-first bit packing, code 256 = clear table, 257 =
    * end of data, and the "early change" convention (the width bumps one
    * code EARLY — at table size 511/1023/2047, the PDF default
    * EarlyChange=1). Returns None on any malformed stream. */
  private[graft] def lzwDecode(data: Array[Byte]): Option[Array[Byte]] = {
    if (data == null || data.isEmpty) return None
    try {
      val out = new java.io.ByteArrayOutputStream()
      val dict = new Array[Array[Byte]](4096)
      var dictSize = 258
      def resetDict(): Unit = {
        var i = 0
        while (i < 256) { dict(i) = Array(i.toByte); i += 1 }
        dictSize = 258
      }
      resetDict()
      var width = 9
      var bitBuf = 0L
      var bitCnt = 0
      var pos = 0
      var prev: Array[Byte] = null
      while (pos < data.length || bitCnt >= width) {
        while (bitCnt < width && pos < data.length) {
          bitBuf = (bitBuf << 8) | (data(pos) & 0xff); bitCnt += 8; pos += 1
        }
        if (bitCnt < width) return Some(out.toByteArray) // trailing pad bits
        val code = ((bitBuf >>> (bitCnt - width)) & ((1 << width) - 1)).toInt
        bitCnt -= width
        if (code == 257) return Some(out.toByteArray) // EOD
        else if (code == 256) { resetDict(); width = 9; prev = null }
        else {
          val entry: Array[Byte] =
            if (code < dictSize && dict(code) != null) dict(code)
            else if (code == dictSize && prev != null) prev :+ prev(0) // KwKwK
            else return None // code beyond table = corrupt stream
          out.write(entry)
          if (prev != null && dictSize < 4096) {
            dict(dictSize) = prev :+ entry(0)
            dictSize += 1
          }
          prev = entry
          // early change: width grows one code before the table fills
          if (dictSize + 1 >= (1 << width) && width < 12) width += 1
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
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
    * operators in document order. `fonts` maps resource names with a
    * ToUnicode CMap (Type0 fonts); while one is active (set by `Tf`),
    * show strings decode as 2-byte CIDs through it — all other fonts
    * pass through byte-for-byte. */
  private[functions] def extractContent(
      cs: String, fonts: Map[String, CMap] = Map.empty): String = {
    val out = new StringBuilder
    var lastString = ""
    var lastName = ""
    var activeCMap: Option[CMap] = None
    def shown(str: String): String =
      activeCMap.map(_.decode(str)).getOrElse(str)
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
        case '/' =>
          val start = i + 1
          i += 1
          while (i < n && (Character.isLetterOrDigit(cs.charAt(i))
            || cs.charAt(i) == '.' || cs.charAt(i) == '-' || cs.charAt(i) == '_')) i += 1
          lastName = cs.substring(start, i)
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
            case "Tj" => out ++= shown(lastString)
            case "Tf" => activeCMap = fonts.get(lastName)
            case "TJ" =>
              arrayItems.foreach {
                case Right(str) => out ++= shown(str)
                case Left(adj) => if (adj < -100.0) out += ' '
              }
              arrayItems.clear()
            case "'" | "\"" => out += '\n'; out ++= shown(lastString)
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
