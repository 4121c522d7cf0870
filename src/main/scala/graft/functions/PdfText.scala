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
  *    Font names are scoped to their page's content streams when the
  *    page structure is recoverable (a later page reusing /F1 for a
  *    different font decodes through ITS font), with the document-wide
  *    first-wins map as the fallback for unclaimed streams.
  *  - Type0 fonts with a non-Identity /Encoding shipped as an embedded
  *    CMap STREAM decode through it: begincidchar/begincidrange map
  *    show codes to CIDs before the CID→unicode stage (Identity-H, the
  *    norm, keeps code == CID).
  *  - Type0 fonts WITHOUT ToUnicode (Identity-H with only an external
  *    CIDSystemInfo): decoded via the embedded CIDFontType2 program —
  *    the TrueType `cmap` table (formats 4/12) inverts to
  *    glyph→unicode and composes with /CIDToGIDMap (Identity or
  *    stream). Extraction then rests on the font's own glyph claims,
  *    so [[extractDetail]] flags it and the caller's `extract_status`
  *    counts these as `no_tounicode_decoded`, distinct from both `ok`
  *    and quarantine.
  *  - PDF 1.5 compressed object streams (/ObjStm) are expanded, so
  *    font/page/resource dicts parked there (every modern writer) are
  *    seen by the font scan; content and ToUnicode streams cannot live
  *    inside an ObjStm per spec and are found by the linear stream walk.
  *  - LZWDecode streams decode via the spec's variable-width early-change
  *    algorithm (§7.4.4) — content, CMap, and ObjStm streams alike;
  *  - encrypted documents using the STANDARD security handler with an
  *    empty user password (the common crawled "protected but opens
  *    without prompting" case): R2-R4 (RC4 40-128 bit and AES-128/AESV2,
  *    Algorithm-2 key derivation, per-object keys) AND R5/R6 AES-256
  *    (SHA-256 / hardened Algorithm-2.B password hash, /UE-wrapped file
  *    key, whole-file AES-256-CBC — no per-object derivation in V5).
  *    R5/R6 documents whose empty-password validation fails (a real
  *    user password AND a real owner password) are detected up front
  *    and left encrypted rather than decrypted to garbage. When the
  *    caller KNOWS a password, `extract(bytes, password)` threads it
  *    through both derivations (R2-R4 Algorithm-2 padding; R5/R6
  *    user-then-owner validation, so an owner password unlocks via
  *    /OE).
  *  Out of scope (returns whatever text is recoverable; the caller's
  *  `extract_status` column counts these as quarantined): Type0 fonts
  *  with NEITHER ToUnicode NOR a decodable embedded font program
  *  (CID-keyed CFFs carry CIDs where glyph names would be; TrueType
  *  subsets whose cmap was stripped), documents whose password is not
  *  supplied (R2-R4 decrypt to garbage, R5/R6 fail validation →
  *  quarantined), and non-Standard handlers. Non-CID bare-CFF
  *  (/FontFile3 /Type1C) embeddings DO decode via their charset glyph
  *  names (standard-strings ASCII + AGL uniXXXX forms).
  *
  * The byte→string bridge uses ISO-8859-1 throughout so string offsets
  * equal byte offsets and round-trip losslessly.
  */
object PdfText {

  /** Extract text from PDF bytes. Null-safe; returns "" when no text
    * operators are recoverable (never throws on malformed input).
    * `password` is the user (or owner) password for encrypted documents
    * — "" (the default) covers the common crawled case of documents
    * every viewer opens without prompting. */
  def extract(bytes: Array[Byte], password: String = ""): String =
    extractFull(bytes, password).text

  /** [[extract]] plus a flag: true when at least one Type0 font WITHOUT a
    * /ToUnicode CMap was decoded through its embedded font program's cmap
    * table — the caller's `extract_status` reports such documents as
    * `no_tounicode_decoded` rather than plain `ok`, because the decode
    * rests on the font's glyph→unicode claim instead of the writer's
    * explicit text mapping. */
  def extractDetail(bytes: Array[Byte], password: String = ""): (String, Boolean) = {
    val r = extractFull(bytes, password)
    (r.text, r.viaFontProgram)
  }

  /** The full extraction verdict: the text, the font-program-fallback
    * flag (see [[extractDetail]]), and `passwordRequired` — the document
    * is encrypted and THIS password cannot open it (validation against
    * /U or /UE failed, or the handler is unsupported), so the caller can
    * count `password_required` separately from ordinary quarantine and
    * route the asset to a credential lookup instead of the bin. */
  final case class ExtractResult(text: String, viaFontProgram: Boolean,
                                 passwordRequired: Boolean)

  def extractFull(bytes: Array[Byte], password: String = ""): ExtractResult = {
    if (bytes == null) return ExtractResult(null, viaFontProgram = false, passwordRequired = false)
    val s = new String(bytes, ISO_8859_1)
    // Modern writers park font/page/resource DICTS inside compressed
    // object streams; expand those into appended plain objects so the
    // font scan sees them. (Streams themselves — content, ToUnicode —
    // cannot live inside an ObjStm per spec, so their absolute offsets
    // in the original bytes stay valid; appending keeps all offsets
    // aligned between expandedS and expandedBytes.)
    // Encrypted documents (standard handler, empty user password): every
    // stream decrypts with its owning object's key BEFORE filters apply.
    val (dec, lockedOut) =
      try decryptorStatus(s, password) catch { case _: Exception => (None, true) }
    val expandedBytes =
      try bytes ++ expandObjStm(s, bytes, dec).getBytes(ISO_8859_1)
      catch { case _: Exception => bytes }
    val expandedS =
      if (expandedBytes eq bytes) s else new String(expandedBytes, ISO_8859_1)
    val scope = try fontScope(expandedS, expandedBytes, dec)
      catch { case _: Exception => FontScope(Map.empty, Map.empty, fontProgramFallback = false) }
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
          val (num, gen) = objNumGenBefore(s, objStart)
          // cross-reference streams are never encrypted (§7.5.8.2)
          val raw = dec match {
            case Some(d) if !dict.contains("/XRef") => d.decrypt(num, gen, raw0)
            case _ => raw0
          }
          val decoded =
            decodeStream(dict, raw)
          decoded.map(new String(_, ISO_8859_1)).foreach { cs =>
            if (cs.contains("BT")) {
              val t = extractContent(cs, scope.forStream(num))
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
    ExtractResult(TextFunctions.normalizeWs(out.result()),
      scope.fontProgramFallback, lockedOut)
  }

  /** CID→Unicode mapping from a /ToUnicode CMap: 2-byte source codes
    * (the Identity-H norm) to UTF-16BE destination strings.
    * `utf16Identity` marks a font whose /Encoding is one of the
    * PREDEFINED Unicode CMaps (`Uni*-UCS2-*` / `Uni*-UTF16-*`, PDF spec
    * 9.7.5.2 Table 118): those CMaps' code space IS Unicode — a show
    * string's 2-byte codes are UTF-16BE code units by definition — so
    * decode needs no per-code table at all (`codes` stays empty). */
  private[functions] final case class CMap(codes: Map[Int, String],
                                           utf16Identity: Boolean = false) {
    /** Decode a show-string whose chars are raw bytes: group into 2-byte
      * big-endian codes, map each; unmapped codes contribute nothing
      * (conservative — a partial map yields partial text, never mojibake).
      * When the map recognises NONE of the codes and the raw bytes are
      * all printable single-byte text, the string is almost certainly a
      * simple font mis-scoped under this CMap (a later page reusing the
      * resource name) — pass it through instead of dropping it. Raw CID
      * bytes of a genuinely unmapped composite font are not printable
      * ASCII, so quarantined documents still yield nothing. */
    def decode(raw: String): String = {
      if (utf16Identity) {
        // codes ARE UTF-16BE units: surrogate halves appended in order
        // pair up inside the JVM string; C0 controls (a writer never
        // shows them; a stray NUL would survive normalizeWs) drop
        val sb = new StringBuilder
        var i = 0
        while (i + 1 < raw.length) {
          val u = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
          if (u >= 0x20 || u == '\n' || u == '\r' || u == '\t') sb += u.toChar
          i += 2
        }
        return sb.result()
      }
      val sb = new StringBuilder
      var mapped = 0
      var i = 0
      while (i + 1 < raw.length) {
        val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
        codes.get(code).foreach { d => sb ++= d; mapped += 1 }
        i += 2
      }
      val dec = sb.result()
      if (mapped == 0 && raw.nonEmpty &&
        raw.forall(c => (c >= ' ' && c <= '~') || c == '\n' || c == '\r' || c == '\t'))
        raw
      else dec
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

  /** code→CID mapping from an embedded /Encoding CMap stream
    * (begincidchar/begincidrange — the non-Identity-H Type0 case, e.g.
    * a predefined-ordering font shipped with its own encoding CMap).
    * CIDs are decimal per the CMap grammar; first definition wins;
    * entry-capped like [[parseCMap]]. */
  private[graft] def parseCidCMap(text: String): Map[Int, Int] = {
    val out = collection.mutable.HashMap.empty[Int, Int]
    for (sec <- "(?s)begincidchar(.*?)endcidchar".r.findAllMatchIn(text);
         m <- "<([0-9A-Fa-f]+)>\\s+(\\d+)".r.findAllMatchIn(sec.group(1)))
      if (out.size < MaxCMapEntries)
        out.getOrElseUpdate(Integer.parseInt(m.group(1), 16), m.group(2).toInt)
    for (sec <- "(?s)begincidrange(.*?)endcidrange".r.findAllMatchIn(text);
         m <- "<([0-9A-Fa-f]+)>\\s*<([0-9A-Fa-f]+)>\\s+(\\d+)".r
           .findAllMatchIn(sec.group(1))) {
      val lo = Integer.parseInt(m.group(1), 16)
      val hi = Integer.parseInt(m.group(2), 16)
      val cid0 = m.group(3).toInt
      var c = lo
      while (c <= hi && out.size < MaxCMapEntries) {
        out.getOrElseUpdate(c, cid0 + (c - lo)); c += 1
      }
    }
    out.toMap
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

  /** Resolved font mappings for a document: `global` is the document-wide
    * first-definition-wins name→CMap map (the pre-round-12 behavior, used
    * for streams no page claims); `byContentObj` scopes names to the page
    * that owns each content stream, so a later page reusing /F1 for a
    * different font object decodes through ITS font, not the first page's.
    * `fontProgramFallback` is true when some Type0 font without ToUnicode
    * was decoded via its embedded font program. */
  private[functions] final case class FontScope(
      global: Map[String, CMap],
      byContentObj: Map[Int, Map[String, CMap]],
      fontProgramFallback: Boolean) {
    def forStream(objNum: Int): Map[String, CMap] =
      byContentObj.getOrElse(objNum, global)
  }

  /** Font-resource-name → CID-to-Unicode CMap, document-wide AND scoped
    * per content stream. Linked scans over the raw object structure (no
    * xref needed — robust to the truncated/regenerated files a crawler
    * lands):
    *   1. font dicts `N 0 obj << … /Type0 … >>`: with /ToUnicode M 0 R
    *      the CMap stream parses via [[parseCMap]]; WITHOUT ToUnicode the
    *      chain /DescendantFonts → /FontDescriptor → /FontFile2 yields
    *      the embedded TrueType program, whose `cmap` table inverts to
    *      glyph→unicode ([[ttfGidToUnicode]]) and composes with
    *      /CIDToGIDMap (Identity default, or the stream map) into
    *      CID→unicode. A Type0 font where neither path yields codes maps
    *      through an EMPTY CMap — its CID bytes produce no text instead
    *      of mojibake and the document lands in the caller's quarantined
    *      count.
    *   2. resource dicts `/Font << /F1 N 0 R … >>` give name → fontObj:
    *      globally (first definition wins) and per page — a page dict's
    *      /Contents refs bind ITS resource names to its content streams.
    * Simple (non-Type0) fonts get no entry, so their show strings pass
    * through byte-for-byte exactly as before. */
  private[functions] def fontScope(s: String, bytes: Array[Byte],
                                   dec: Option[Decryptor] = None): FontScope = {
    val objRe = "(\\d+)\\s+0\\s+obj".r
    val objStarts = objRe.findAllMatchIn(s).map(m => (m.group(1).toInt, m.start, m.end)).toSeq
    if (objStarts.isEmpty) return FontScope(Map.empty, Map.empty, fontProgramFallback = false)
    def objBody(i: Int): String = {
      val end = if (i + 1 < objStarts.length) objStarts(i + 1)._2 else s.length
      s.substring(objStarts(i)._3, end)
    }
    val objIndex: Map[Int, Int] =
      objStarts.indices.groupBy(i => objStarts(i)._1).map { case (n, is) => n -> is.min }
    def bodyOf(objNum: Int): Option[String] = objIndex.get(objNum).map(objBody)
    /** An object's stream data, decrypted and de-filtered. */
    def decodedStreamOf(objNum: Int): Option[Array[Byte]] =
      objIndex.get(objNum).flatMap { i =>
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
            decodeStream(dict, raw)
          }
        }
      }
    // 1. Type0 font objects and their decode path
    val toUni = "(?s)/ToUnicode\\s+(\\d+)\\s+0\\s+R".r
    val type0Bodies: Map[Int, String] = objStarts.indices.flatMap { i =>
      val body = objBody(i)
      if (body.contains("/Type0")) Some(objStarts(i)._1 -> body) else None
    }.toMap
    if (type0Bodies.isEmpty) return FontScope(Map.empty, Map.empty, fontProgramFallback = false)
    var fallbackUsed = false
    /** CID→unicode via the embedded font program (the no-ToUnicode path). */
    def fontProgramCMap(fontBody: String): Option[CMap] = {
      val descObj = "(?s)/DescendantFonts\\s*\\[\\s*(\\d+)\\s+0\\s+R".r
        .findFirstMatchIn(fontBody).map(_.group(1).toInt)
        .orElse( // /DescendantFonts as an indirect ref to a one-element array
          "(?s)/DescendantFonts\\s+(\\d+)\\s+0\\s+R".r.findFirstMatchIn(fontBody)
            .map(_.group(1).toInt).flatMap(bodyOf)
            .flatMap(b => "(\\d+)\\s+0\\s+R".r.findFirstMatchIn(b).map(_.group(1).toInt)))
      def progGidUni(fdBody: String, key: String,
                     f: Array[Byte] => Map[Int, String]): Option[Map[Int, String]] =
        (key + "\\s+(\\d+)\\s+0\\s+R").r.findFirstMatchIn(fdBody)
          .map(_.group(1).toInt).flatMap(decodedStreamOf)
          .map(f).filter(_.nonEmpty)
      for {
        dBody <- descObj.flatMap(bodyOf)
        fdNum <- "/FontDescriptor\\s+(\\d+)\\s+0\\s+R".r.findFirstMatchIn(dBody)
          .map(_.group(1).toInt)
        fdBody <- bodyOf(fdNum)
        // embedded TrueType (/FontFile2, cmap table) first; bare-CFF
        // (/FontFile3, charset glyph names) when that's what's embedded
        gidUni <- progGidUni(fdBody, "/FontFile2", ttfGidToUnicode)
          .orElse(progGidUni(fdBody, "/FontFile3", cffGidToUnicode))
      } yield {
        // /CIDToGIDMap: a stream of big-endian GIDs indexed by CID;
        // absent or /Identity means CID == GID (the Identity-H norm)
        val codes = "/CIDToGIDMap\\s+(\\d+)\\s+0\\s+R".r.findFirstMatchIn(dBody)
          .map(_.group(1).toInt).flatMap(decodedStreamOf) match {
          case Some(cidMap) =>
            (0 until math.min(cidMap.length / 2, MaxCMapEntries)).flatMap { cid =>
              val gid = ((cidMap(2 * cid) & 0xff) << 8) | (cidMap(2 * cid + 1) & 0xff)
              gidUni.get(gid).map(cid -> _)
            }.toMap
          case None => gidUni
        }
        // non-Identity /Encoding: an embedded CMap STREAM maps show
        // codes to CIDs (begincidchar/begincidrange) — compose it in
        // front of the CID→unicode map just built. /Encoding as a NAME
        // (/Identity-H, the norm) doesn't match the indirect-ref regex
        // and keeps code == CID.
        val composed =
          "(?s)/Encoding\\s+(\\d+)\\s+0\\s+R".r.findFirstMatchIn(fontBody)
            .map(_.group(1).toInt).flatMap(decodedStreamOf)
            .map(b => parseCidCMap(new String(b, ISO_8859_1)))
            .filter(_.nonEmpty) match {
            case Some(enc) =>
              enc.flatMap { case (code, cid) => codes.get(cid).map(code -> _) }
            case None => codes
          }
        CMap(composed)
      }
    }
    // resolve each Type0 font object's CMap once
    val cmapByFont = collection.mutable.HashMap.empty[Int, CMap]
    def cmapOfFont(fontObj: Int): Option[CMap] = type0Bodies.get(fontObj).map { body =>
      cmapByFont.getOrElseUpdate(fontObj, {
        toUni.findFirstMatchIn(body).map(_.group(1).toInt) match {
          case Some(cmapObj) =>
            decodedStreamOf(cmapObj).map(new String(_, ISO_8859_1))
              .filter(_.contains("beginbf")).map(parseCMap)
              .filter(_.codes.nonEmpty).getOrElse(CMap(Map.empty))
          case None =>
            fontProgramCMap(body).filter(_.codes.nonEmpty) match {
              case Some(cm) => fallbackUsed = true; cm
              case None => CMap(Map.empty)
            }
        }
      })
    }
    val nameRef = "/([\\w.-]+)\\s+(\\d+)\\s+0\\s+R".r
    val fontDict = "(?s)/Font\\s*<<(.*?)>>".r
    def namesIn(src: String): Seq[(String, Int)] =
      (for (m <- fontDict.findAllMatchIn(src); r <- nameRef.findAllMatchIn(m.group(1)))
        yield r.group(1) -> r.group(2).toInt).toSeq
    // 2a. document-wide map, first definition wins (pre-round-12 behavior)
    val global = collection.mutable.LinkedHashMap.empty[String, CMap]
    for ((name, fontObj) <- namesIn(s); cm <- cmapOfFont(fontObj))
      if (!global.contains(name)) global(name) = cm
    // 2b. per-page scope: a page dict's /Contents streams see THAT page's
    // /Font names (inline under /Resources, or via an indirect resource
    // object) — a name reused across pages stops colliding
    val contentsRe = "(?s)/Contents\\s*(\\[[^\\]]*\\]|\\d+\\s+0\\s+R)".r
    val refRe = "(\\d+)\\s+0\\s+R".r
    val byContent = collection.mutable.HashMap.empty[Int, Map[String, CMap]]
    objStarts.indices.foreach { i =>
      val body = objBody(i)
      if (body.contains("/Contents")) {
        val fontSrc: Option[String] =
          if (fontDict.findFirstMatchIn(body).isDefined) Some(body)
          else "/Resources\\s+(\\d+)\\s+0\\s+R".r.findFirstMatchIn(body)
            .map(_.group(1).toInt).flatMap(bodyOf)
        fontSrc.foreach { src =>
          val names = namesIn(src)
          val pageFonts = names
            .flatMap { case (name, fo) => cmapOfFont(fo).map(name -> _) }
            .groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }
          // register even when the resolved map is EMPTY: a page whose
          // fonts are all simple must shadow the global map, or its
          // strings would decode through another page's CMap
          if (names.nonEmpty)
            for {
              m <- contentsRe.findFirstMatchIn(body).iterator
              r <- refRe.findAllMatchIn(m.group(1))
            } byContent(r.group(1).toInt) = pageFonts
        }
      }
    }
    FontScope(global.toMap, byContent.toMap, fallbackUsed)
  }

  /** The CFF standard-strings prefix (Adobe TN #5176 Appendix A): SIDs
    * 1-95 are the glyph names of printable ASCII in order, except SID 8
    * `quoteright` (U+2019) and SID 65 `quoteleft` (U+2018) where Adobe's
    * StandardEncoding substitutes typographic quotes. */
  private def cffSidChar(sid: Int): String =
    if (sid == 8) "’" else if (sid == 65) "‘"
    else (31 + sid).toChar.toString

  private lazy val CffStdByName: Map[String, String] = {
    val names = Array("space", "exclam", "quotedbl", "numbersign", "dollar",
      "percent", "ampersand", "quoteright", "parenleft", "parenright",
      "asterisk", "plus", "comma", "hyphen", "period", "slash",
      "zero", "one", "two", "three", "four", "five", "six", "seven",
      "eight", "nine", "colon", "semicolon", "less", "equal", "greater",
      "question", "at") ++ ('A' to 'Z').map(_.toString) ++
      Array("bracketleft", "backslash", "bracketright", "asciicircum",
        "underscore", "quoteleft") ++ ('a' to 'z').map(_.toString) ++
      Array("braceleft", "bar", "braceright", "asciitilde")
    names.zipWithIndex.map { case (n, i) => n -> cffSidChar(i + 1) }.toMap
  }

  /** A charset glyph NAME → unicode: the AGL `uniXXXX`/`uXXXXXX` forms,
    * then the standard-strings names. */
  private def cffNameToUni(name: String): Option[String] = {
    def cp(hex: String): Option[String] =
      try {
        val c = Integer.parseInt(hex, 16)
        if (c >= 0 && c <= 0x10FFFF) Some(new String(Character.toChars(c)))
        else None
      } catch { case _: Exception => None }
    if (name.length >= 7 && name.startsWith("uni")) cp(name.substring(3, 7))
    else if (name.length >= 5 && name.length <= 7 && name.startsWith("u") &&
      name.drop(1).forall(c => Character.digit(c, 16) >= 0)) cp(name.drop(1))
    else CffStdByName.get(name)
  }

  /** Glyph-ID → unicode via a bare-CFF font program (/FontFile3,
    * /Subtype /Type1C): INDEX-walk to the Top DICT, read the charset
    * (formats 0/1/2 or the ISOAdobe predefined identity) mapping each
    * glyph to its SID, and resolve SIDs through the standard strings
    * (1-95 = printable ASCII) or the font's own String INDEX (`uniXXXX`
    * names and friends). CID-keyed CFFs (/ROS present — CIDFontType0C)
    * carry CIDs where names would be, so there is nothing to resolve:
    * return empty and let the caller quarantine. Returns empty on any
    * malformed input rather than throwing (reference behavior parity:
    * crawl_web.py:41-47 delegates these to poppler). */
  private[graft] def cffGidToUnicode(font: Array[Byte]): Map[Int, String] = {
    try {
      if (font == null || font.length < 4) return Map.empty
      val hdrSize = font(2) & 0xff
      // INDEX at `off` → (items, offset just past the INDEX)
      def index(off: Int): (Array[Array[Byte]], Int) = {
        if (off < 0 || off + 2 > font.length) return (Array.empty, font.length)
        val count = u16(font, off)
        if (count == 0) return (Array.empty, off + 2)
        val offSize = font(off + 2) & 0xff
        if (offSize < 1 || offSize > 4) return (Array.empty, font.length)
        def rd(p: Int): Int = {
          var v = 0; var i = 0
          while (i < offSize) { v = (v << 8) | (font(p + i) & 0xff); i += 1 }
          v
        }
        val offA = off + 3
        val dataStart = offA + (count + 1) * offSize - 1
        if (dataStart >= font.length) return (Array.empty, font.length)
        val items = Array.tabulate(count) { i =>
          val a = dataStart + rd(offA + i * offSize)
          val b = dataStart + rd(offA + (i + 1) * offSize)
          if (a >= 0 && a <= b && b <= font.length)
            java.util.Arrays.copyOfRange(font, a, b)
          else Array.empty[Byte]
        }
        (items, dataStart + rd(offA + count * offSize))
      }
      val (_, afterName) = index(hdrSize)
      val (topDicts, afterTop) = index(afterName)
      val (strings, _) = index(afterTop)
      if (topDicts.isEmpty) return Map.empty
      val td = topDicts(0)
      // Top DICT walk: integer operands accumulate, operators dispatch
      var charsetOff = 0 // 0 = ISOAdobe predefined → sid == gid
      var charStringsOff = -1
      var cidKeyed = false
      var i = 0
      val ops = collection.mutable.ArrayBuffer.empty[Long]
      while (i < td.length) {
        val b0 = td(i) & 0xff
        if (b0 <= 21) {
          val op = if (b0 == 12 && i + 1 < td.length) { i += 1; 1200 + (td(i) & 0xff) } else b0
          op match {
            case 15 => if (ops.nonEmpty) charsetOff = ops.last.toInt
            case 17 => if (ops.nonEmpty) charStringsOff = ops.last.toInt
            case 1230 => cidKeyed = true // ROS
            case _ => ()
          }
          ops.clear(); i += 1
        } else if (b0 == 28 && i + 2 < td.length) {
          ops += (((td(i + 1) & 0xff) << 8) | (td(i + 2) & 0xff)).toShort.toLong
          i += 3
        } else if (b0 == 29 && i + 4 < td.length) {
          ops += (((td(i + 1) & 0xff).toLong << 24) | ((td(i + 2) & 0xff) << 16) |
            ((td(i + 3) & 0xff) << 8) | (td(i + 4) & 0xff))
          i += 5
        } else if (b0 == 30) { // real number: nibbles to the 0xf terminator
          i += 1
          var done = false
          while (i < td.length && !done) {
            val b = td(i) & 0xff
            if ((b >> 4) == 0xf || (b & 0xf) == 0xf) done = true
            i += 1
          }
          ops += 0L
        } else if (b0 >= 32 && b0 <= 246) { ops += (b0 - 139).toLong; i += 1 }
        else if (b0 >= 247 && b0 <= 250 && i + 1 < td.length) {
          ops += ((b0 - 247) * 256 + (td(i + 1) & 0xff) + 108).toLong; i += 2
        } else if (b0 >= 251 && b0 <= 254 && i + 1 < td.length) {
          ops += (-(b0 - 251) * 256 - (td(i + 1) & 0xff) - 108).toLong; i += 2
        } else i += 1
      }
      if (cidKeyed || charStringsOff < 0) return Map.empty
      val (charStrings, _) = index(charStringsOff)
      val nGlyphs = math.min(charStrings.length, MaxCMapEntries)
      if (nGlyphs == 0) return Map.empty
      // gid → SID
      val sids = new Array[Int](nGlyphs)
      if (charsetOff == 0) {
        var g = 1; while (g < nGlyphs) { sids(g) = g; g += 1 }
      } else if (charsetOff == 1 || charsetOff == 2) {
        return Map.empty // Expert charsets: no text-relevant mapping
      } else {
        if (charsetOff >= font.length) return Map.empty
        val fmt = font(charsetOff) & 0xff
        fmt match {
          case 0 =>
            var g = 1
            while (g < nGlyphs && charsetOff + 1 + 2 * g <= font.length) {
              sids(g) = u16(font, charsetOff + 1 + 2 * (g - 1)); g += 1
            }
          case 1 | 2 =>
            val leftW = if (fmt == 1) 1 else 2
            var g = 1
            var p = charsetOff + 1
            while (g < nGlyphs && p + 2 + leftW <= font.length) {
              val first = u16(font, p)
              val nLeft = if (fmt == 1) font(p + 2) & 0xff else u16(font, p + 2)
              var k = 0
              while (k <= nLeft && g < nGlyphs) { sids(g) = first + k; g += 1; k += 1 }
              p += 2 + leftW
            }
          case _ => return Map.empty
        }
      }
      val out = collection.mutable.HashMap.empty[Int, String]
      var g = 1 // gid 0 = .notdef never maps
      while (g < nGlyphs) {
        val sid = sids(g)
        val uni: Option[String] =
          if (sid >= 1 && sid <= 95) Some(cffSidChar(sid))
          else if (sid >= 391 && sid - 391 < strings.length)
            cffNameToUni(new String(strings(sid - 391), ISO_8859_1))
          else None // other standard SIDs: non-ASCII names, out of scope
        uni.foreach(u => out(g) = u)
        g += 1
      }
      out.toMap
    } catch { case _: Exception => Map.empty }
  }

  /** Glyph-ID → unicode string, inverted from a TrueType font program's
    * `cmap` table (OpenType spec; formats 4 and 12 — the ones real
    * CIDFontType2 embeddings carry). Subtable preference: (3,10)
    * UCS-4 format 12, then (3,1) BMP format 4, then any platform-0
    * (Unicode) record. First gid wins on collisions; gid 0 (.notdef)
    * and the 0xFFFF sentinel never map. Returns empty on any
    * malformed/truncated table rather than throwing. */
  private[graft] def ttfGidToUnicode(font: Array[Byte]): Map[Int, String] = {
    try {
      if (font == null || font.length < 12) return Map.empty
      val numTables = u16(font, 4)
      var cmapOff = -1
      var t = 0
      while (t < numTables && cmapOff < 0) {
        val rec = 12 + 16 * t
        if (rec + 16 <= font.length &&
          new String(font, rec, 4, ISO_8859_1) == "cmap")
          cmapOff = u32(font, rec + 8).toInt
        t += 1
      }
      if (cmapOff < 0 || cmapOff + 4 > font.length) return Map.empty
      val nSub = u16(font, cmapOff + 2)
      var best = -1
      var bestScore = 0
      var j = 0
      while (j < nSub) {
        val rec = cmapOff + 4 + 8 * j
        if (rec + 8 <= font.length) {
          val plat = u16(font, rec)
          val enc = u16(font, rec + 2)
          val score =
            if (plat == 3 && enc == 10) 4
            else if (plat == 3 && enc == 1) 3
            else if (plat == 0) 2
            else 1
          if (score > bestScore) {
            bestScore = score
            best = cmapOff + u32(font, rec + 4).toInt
          }
        }
        j += 1
      }
      if (best < 0 || best + 2 > font.length) return Map.empty
      val out = collection.mutable.HashMap.empty[Int, String]
      def put(gid: Int, cp: Int): Unit =
        if (gid != 0 && out.size < MaxCMapEntries && !out.contains(gid))
          out(gid) = new String(Character.toChars(cp))
      u16(font, best) match {
        case 4 =>
          val segX2 = u16(font, best + 6)
          val endA = best + 14
          val startA = endA + segX2 + 2 // +2 skips reservedPad
          val deltaA = startA + segX2
          val rangeA = deltaA + segX2
          if (rangeA + segX2 > font.length) return Map.empty
          var k = 0
          while (k < segX2 / 2) {
            val end = u16(font, endA + 2 * k)
            val start = u16(font, startA + 2 * k)
            val delta = u16(font, deltaA + 2 * k)
            val ro = u16(font, rangeA + 2 * k)
            var c = start
            while (c <= end && c != 0xFFFF && out.size < MaxCMapEntries) {
              val gid =
                if (ro == 0) (c + delta) & 0xffff
                else {
                  // idRangeOffset is relative to its OWN array slot
                  val addr = rangeA + 2 * k + ro + 2 * (c - start)
                  if (addr + 2 <= font.length) {
                    val g = u16(font, addr)
                    if (g == 0) 0 else (g + delta) & 0xffff
                  } else 0
                }
              put(gid, c)
              c += 1
            }
            k += 1
          }
        case 12 =>
          if (best + 16 > font.length) return Map.empty
          val nGroups = u32(font, best + 12)
          var g = 0L
          while (g < nGroups && out.size < MaxCMapEntries) {
            val rec = best + 16 + 12 * g.toInt
            if (rec + 12 <= font.length) {
              val sc = u32(font, rec)
              val ec = u32(font, rec + 4)
              val sg = u32(font, rec + 8)
              var c = sc
              while (c <= ec && c <= 0x10FFFFL && out.size < MaxCMapEntries) {
                put((sg + (c - sc)).toInt, c.toInt)
                c += 1
              }
            }
            g += 1
          }
        case _ => ()
      }
      out.toMap
    } catch { case _: Exception => Map.empty }
  }

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

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
  private[graft] final case class Decryptor(fileKey: Array[Byte], aes: Boolean,
                                            v5: Boolean = false) {
    def decrypt(objNum: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      // V5 (R5/R6, /AESV3): the 256-bit file key encrypts every stream
      // directly — the MD5 per-object derivation is gone from the spec.
      if (v5) return aesCbcStrip(fileKey, data)
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(fileKey)
      md.update(Array[Byte]((objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
        ((objNum >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
      if (aes) md.update(Array[Byte](0x73, 0x41, 0x6c, 0x54))
      val okey = md.digest().take(math.min(fileKey.length + 5, 16))
      if (aes) aesCbcStrip(okey, data) else rc4(okey, data)
    }
  }

  /** AES-CBC decrypt with the PDF stream layout: 16-byte IV prefix,
    * PKCS#7 padding stripped when well-formed. */
  private def aesCbcStrip(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 32 || (data.length % 16) != 0) return Array.empty
    val plain = aesCbc(encrypt = false, key, data.take(16), data.drop(16))
    val pad = plain.last & 0xff
    if (pad >= 1 && pad <= 16 && pad <= plain.length) plain.dropRight(pad)
    else plain
  }

  /** Raw AES-CBC, no padding; key length selects AES-128/192/256. */
  private def aesCbc(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
                     data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE
           else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** The R6 hardened password hash (ISO 32000-2 Algorithm 2.B): iterate
    * SHA-256/384/512 selected by an AES-128-CBC encryption of the
    * 64-fold repeated (password ‖ K ‖ udata) block, at least 64 rounds,
    * stopping once the last cipher byte ≤ round − 32. */
  private[graft] def hash2B(password: Array[Byte], salt: Array[Byte],
                            udata: Array[Byte]): Array[Byte] = {
    def sha(bits: Int, d: Array[Byte]) =
      java.security.MessageDigest.getInstance("SHA-" + bits).digest(d)
    var k = sha(256, password ++ salt ++ udata)
    var round = 0
    var stop = false
    while (!stop) {
      val block = password ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var j = 0
      while (j < 64) { System.arraycopy(block, 0, k1, j * block.length, block.length); j += 1 }
      val e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1)
      val mod = e.take(16).foldLeft(0)((a, b) => a + (b & 0xff)) % 3
      k = sha(if (mod == 0) 256 else if (mod == 1) 384 else 512, e)
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) stop = true
    }
    k.take(32)
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
    * (Algorithm 2 with the given user password, "" by default). None
    * when the document is unencrypted, uses a non-Standard handler, or
    * an unsupported revision. R2-R4 use the password latin-1-padded per
    * Algorithm 2 (a wrong password yields a wrong key → garbage →
    * quarantine downstream); R5/R6 use the UTF-8 bytes (≤127) and
    * VALIDATE before decrypting. */
  private[graft] def decryptorOf(s: String, password: String = ""): Option[Decryptor] =
    decryptorStatus(s, password)._1

  /** [[decryptorOf]] plus the LOCKED signal: (decryptor, locked) where
    * `locked` is true when the document IS encrypted but this password
    * cannot open it — R5/R6 validation failure, an R2-R4 key whose
    * Algorithm-4/5 check against /U fails (wrong password), or a
    * non-Standard/unknown handler. Callers surface it as the counted
    * `password_required` status instead of a silent garbage-decrypt
    * quarantine. */
  private[graft] def decryptorStatus(s: String,
                                     password: String = ""): (Option[Decryptor], Boolean) = {
    val encRef = "/Encrypt\\s+(\\d+)\\s+(\\d+)\\s+R".r.findFirstMatchIn(s)
    if (encRef.isEmpty) return (None, false) // not encrypted
    def locked: (Option[Decryptor], Boolean) = (None, true)
    val num = encRef.get.group(1).toInt
    val m = ("(?s)\\b" + num + "\\s+\\d+\\s+obj(.{0,2048})").r.findFirstMatchIn(s)
    val bodyAll = m.map(_.group(1)).getOrElse(return locked)
    // cut at endobj so a following object's entries can't bleed in
    val body = bodyAll.indexOf("endobj") match {
      case -1 => bodyAll
      case e => bodyAll.substring(0, e)
    }
    if (!body.contains("/Standard")) return locked
    def intOf(key: String, dflt: Int): Int =
      ("/" + key + "\\s+(-?\\d+)").r.findFirstMatchIn(body)
        .map(_.group(1).toInt).getOrElse(dflt)
    val r = intOf("R", 0)
    if (r == 5 || r == 6) {
      val d = decryptorV5(body, r,
        password.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(127))
      return (d, d.isEmpty)
    }
    if (r < 2 || r > 4) return locked
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
    if (oAt < 0) return locked
    val o = pdfStringAt(body, oAt + 2).getOrElse(return locked)
    if (o.length < 32) return locked
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
    // Algorithm 2 step a: the password latin-1 bytes padded (or for the
    // empty password, the pad string alone)
    md.update((password.getBytes(ISO_8859_1) ++ PwPad).take(32))
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
    val fileKey = key.take(keyLen)
    // Algorithm 4/5 password check against the stored /U: a key derived
    // from the WRONG password must not silently decrypt to garbage. A
    // document with no /U entry (some hand-rolled writers) proceeds
    // unvalidated — the pre-round-12 behavior.
    val uStored = strEntry(body, "U")
    val valid = uStored match {
      case Some(u) if u.length >= 16 =>
        if (r == 2) {
          java.util.Arrays.equals(rc4(fileKey, PwPad), u.take(32))
        } else {
          val md2 = java.security.MessageDigest.getInstance("MD5")
          md2.update(PwPad); md2.update(id)
          var uc = rc4(fileKey, md2.digest())
          var i = 1
          while (i <= 19) {
            uc = rc4(fileKey.map(b => (b ^ i).toByte), uc)
            i += 1
          }
          java.util.Arrays.equals(uc.take(16), u.take(16))
        }
      case _ => true
    }
    if (!valid) locked else (Some(Decryptor(fileKey, aes)), false)
  }

  /** Dict string entry `/key (…)` or `/key <…>`, with a name-boundary
    * guard so `/O` never matches the prefix of `/OE`. */
  private def strEntry(body: String, key: String): Option[Array[Byte]] = {
    ("/" + key + "(?![A-Za-z])").r.findFirstMatchIn(body)
      .flatMap(m => pdfStringAt(body, m.end))
  }

  /** R5 (Adobe ext. 3, /AESV3) and R6 (ISO 32000-2) file-key recovery
    * with the empty password. /U and /O are 48 bytes: 32-byte password
    * hash ‖ 8-byte validation salt ‖ 8-byte key salt; the 256-bit file
    * key is AES-256-CBC-wrapped (zero IV) in /UE (user) or /OE (owner).
    * R5 hashes with one SHA-256 pass; R6 with Algorithm 2.B. The given
    * password is tried as the user password first, then as the owner
    * password; a document failing BOTH validations needs a different
    * password: return None so the caller quarantines instead of
    * decrypting to garbage. */
  private def decryptorV5(body: String, r: Int,
                          pw: Array[Byte]): Option[Decryptor] = {
    val u = strEntry(body, "U").getOrElse(return None)
    if (u.length < 48) return None
    val empty = Array.empty[Byte]
    def h(salt: Array[Byte], udata: Array[Byte]): Array[Byte] =
      if (r == 6) hash2B(pw, salt, udata)
      else java.security.MessageDigest.getInstance("SHA-256")
        .digest(pw ++ salt ++ udata)
    val fileKey: Array[Byte] =
      if (java.util.Arrays.equals(h(u.slice(32, 40), empty), u.take(32))) {
        val ue = strEntry(body, "UE").getOrElse(return None)
        if (ue.length < 32) return None
        aesCbc(encrypt = false, h(u.slice(40, 48), empty),
          new Array[Byte](16), ue.take(32))
      } else {
        // owner path: udata = the full 48-byte /U string (Algorithm 12)
        val o = strEntry(body, "O").getOrElse(return None)
        if (o.length < 48) return None
        val u48 = u.take(48)
        if (!java.util.Arrays.equals(h(o.slice(32, 40), u48), o.take(32)))
          return None // real user AND owner passwords → quarantine
        val oe = strEntry(body, "OE").getOrElse(return None)
        if (oe.length < 32) return None
        aesCbc(encrypt = false, h(o.slice(40, 48), u48),
          new Array[Byte](16), oe.take(32))
      }
    Some(Decryptor(fileKey, aes = true, v5 = true))
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
