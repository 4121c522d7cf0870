package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** One chunk plus how many of its leading chars repeat the previous
  * chunk's tail (the overlap carry) — the UDF-encodable row type of
  * [[TextFunctions.chunkWithCarry]]. */
case class ChunkCarry(chunk: String, carry: Int)

/** Text scalar functions re-expressing the reference's Python helpers
  * (SURVEY.md §2.3) as Spark columns/UDFs.
  *
  * Column-returning helpers stay inside whole-stage codegen; UDFs are
  * reserved for logic Spark has no builtin for (recursive chunking,
  * urljoin, HTML strip).
  */
object TextFunctions {

  // ---------------------------------------------------------------- chunker

  /** Recursive character text splitter (capability of reference
    * dags/utils/chunks_data.py:101-102, which configures LangChain's
    * RecursiveCharacterTextSplitter(5000, 500)).
    *
    * Spec (ours, documented per SURVEY §7.4 — capability, not port):
    *  - split `text` on the first separator in `seps` that occurs in it;
    *    pieces keep their separator suffix so concatenation loses nothing;
    *  - greedily pack pieces into chunks of ≤ `size` chars;
    *  - when a chunk closes, the next chunk starts with the trailing
    *    pieces of the previous one totalling ≤ `overlap` chars;
    *  - any piece longer than `size` is recursively split with the
    *    remaining separators ("" = hard character split, always fits).
    * Invariants (property-tested in ChunkerSpec): every chunk has length
    * in (0, size]; stripping each chunk's overlap prefix and concatenating
    * reproduces the input; short inputs round-trip unchanged.
    */
  def chunkText(text: String, size: Int, overlap: Int,
                seps: List[String] = List("\n\n", "\n", " ", "")): Vector[String] =
    chunkWithCarry(text, size, overlap, seps).map(_._1)

  /** Like [[chunkText]] but each chunk is paired with its carry length:
    * the number of leading chars repeated from the previous chunk's tail
    * (0 for the first chunk). `chunk.substring(carry)` concatenated over
    * all chunks reproduces the input exactly. */
  def chunkWithCarry(text: String, size: Int, overlap: Int,
                     seps: List[String] = List("\n\n", "\n", " ", "")): Vector[(String, Int)] = {
    require(size > 0 && overlap >= 0 && overlap < size, s"bad chunk config ($size,$overlap)")
    if (text.isEmpty) return Vector.empty
    if (text.length <= size) return Vector((text, 0))

    val sep = seps.find(s => s.nonEmpty && text.contains(s)).getOrElse("")
    val rest = seps.dropWhile(_ != sep) match { case _ :: t => t; case Nil => Nil }

    // split keeping the separator attached to the preceding piece
    val pieces: Vector[String] =
      if (sep.isEmpty) text.grouped(size).toVector
      else {
        val parts = text.split(java.util.regex.Pattern.quote(sep), -1)
        parts.iterator.zipWithIndex.map { case (p, i) =>
          if (i < parts.length - 1) p + sep else p
        }.filter(_.nonEmpty).toVector
      }

    // recursively shrink any piece that alone exceeds the chunk size;
    // strip the sub-chunks' carry so pieces stay disjoint (the packer
    // below reintroduces overlap at piece granularity)
    val sized: Vector[String] =
      pieces.flatMap { p =>
        if (p.length <= size) Vector(p)
        else chunkWithCarry(p, size, overlap, rest).map { case (c, k) => c.substring(k) }
      }

    // greedy pack with overlap carry-over
    val chunks = Vector.newBuilder[(String, Int)]
    var cur = Vector.empty[String]
    var curLen = 0
    var carryLen = 0 // how many chars at the head of `cur` repeat the previous chunk
    def flush(): Unit = if (curLen > 0) {
      chunks += ((cur.mkString, carryLen))
      // carry the longest contiguous suffix of pieces totalling <= overlap
      var keep = List.empty[String]
      var keepLen = 0
      val it = cur.reverseIterator
      var go = true
      while (go && it.hasNext) {
        val p = it.next()
        if (keepLen + p.length <= overlap) { keep = p :: keep; keepLen += p.length }
        else go = false
      }
      cur = keep.toVector; curLen = keepLen; carryLen = keepLen
    }
    for (p <- sized) {
      if (curLen + p.length > size) {
        flush()
        // if the carry leaves no room for this piece, drop the carry
        if (curLen + p.length > size) { cur = Vector.empty; curLen = 0; carryLen = 0 }
      }
      cur = cur :+ p; curLen += p.length
    }
    if (curLen > carryLen) chunks += ((cur.mkString, carryLen)) // skip pure-carry tail
    chunks.result()
  }

  /** UDF form: text → array of chunks, for `explode(chunk_text(text))`. */
  val chunkTextUdf: UserDefinedFunction =
    udf((text: String, size: Int, overlap: Int) =>
      if (text == null) Array.empty[String] else chunkText(text, size, overlap).toArray)

  /** UDF form of [[chunkWithCarry]]: text → array<struct<chunk,carry>>.
    * Exposes the carry so downstream SQL can strip the overlap prefix
    * (`substring(chunk, carry + 1)`) and verify the exact round-trip
    * invariant — the basis of q33's DuckDB oracle. */
  val chunkCarryUdf: UserDefinedFunction =
    udf((text: String, size: Int, overlap: Int) =>
      if (text == null) Array.empty[ChunkCarry]
      else chunkWithCarry(text, size, overlap)
        .map { case (c, k) => ChunkCarry(c, k) }.toArray)

  /** Distinct word n-gram shingles, single pass (the SQL-expressible
    * `transform(sequence(...), i -> array_join(slice(ws, i, n)))` form
    * re-evaluates the tokenizer inside the lambda — O(tokens²) per doc;
    * this UDF is the O(tokens) equivalent, output-identical).
    *
    * RETIRED from every hot path in round 15 (verdict task 4): the
    * near-dup family now uses the codegen-native byte-level
    * [[graft.plans.DistinctShingles]] expression (no encoder round-trip,
    * stays inside whole-stage codegen). This UDF remains as the
    * independent equality twin — ExpressionsSpec pins elementwise
    * identity between the two on the corpus and on adversarial cases. */
  def shingles(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    val seen = collection.mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i + n <= toks.length) {
      val sb = new StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen += sb.result()
      i += 1
    }
    seen.toArray
  }
  val shinglesUdf: UserDefinedFunction = udf(shingles _)

  // ------------------------------------------------------------ HTML / URL

  /** HTML → text (reference bs4_extractor, crawl_web.py:14-23): drop
    * comments/CDATA and script/style subtrees (including unclosed ones,
    * which swallow to end-of-document exactly as an HTML parser treats
    * raw-text elements), strip tags with a quote-aware tokenizer, decode
    * named + numeric character references, collapse blank runs. Pure-JVM
    * (no jsoup in this classpath); adversarial-input parity cases in
    * FunctionsSpec. */
  def htmlToText(html: String): String = {
    if (html == null) return null
    normalizeWs(decodeEntities(stripTags(stripRawRegions(html))))
  }
  val htmlToTextUdf: UserDefinedFunction = udf(htmlToText _)

  // CDATA deliberately case-sensitive (the HTML tokenizer requires the
  // exact token `<![CDATA[`; `<![cdata[` is a bogus comment the tag-strip
  // pass removes); script/style tag names are case-insensitive
  private val RawOpenRe = java.util.regex.Pattern.compile(
    "<!--|<!\\[CDATA\\[|(?i)<(script|style)[^>]*>")
  private val RawCloseRes: Map[String, java.util.regex.Pattern] =
    Seq("script", "style").map(t =>
      t -> java.util.regex.Pattern.compile("</" + t + "\\s*>",
        java.util.regex.Pattern.CASE_INSENSITIVE)).toMap

  /** Remove comments, CDATA sections and script/style subtrees in ONE
    * document-order pass — whichever construct opens first owns the text
    * up to its own terminator, exactly as an HTML parser tokenizes. (A
    * sequence of independent regex passes gets this wrong: a `<!--`
    * inside a script string would pair with a later real `-->` and
    * delete legitimate text between them.) An unterminated construct
    * swallows to end-of-document (the parser's raw-text rule). */
  private def stripRawRegions(s: String): String = {
    val m = RawOpenRe.matcher(s)
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos < s.length && m.find(pos)) {
      sb.append(s, pos, m.start).append(' ')
      val tok = m.group()
      pos =
        if (tok == "<!--") {
          val e = s.indexOf("-->", m.end())
          if (e < 0) s.length else e + 3
        } else if (tok == "<![CDATA[") {
          val e = s.indexOf("]]>", m.end())
          if (e < 0) s.length else e + 3
        } else {
          val close = RawCloseRes(m.group(1).toLowerCase).matcher(s)
          if (close.find(m.end())) close.end() else s.length
        }
    }
    if (pos < s.length) sb.append(s, pos, s.length)
    sb.toString
  }

  /** Quote-aware tag stripper (HTML5 tokenizer rules, simplified to what
    * tag REMOVAL needs — replaces the former `<[^>]*>` regex, which
    * terminated at the first `>` and so leaked `b">` from
    * `<a title="a>b">`):
    *  - `<` opens a tag only before an ASCII letter or `/`; before `!` or
    *    `?` it opens a bogus comment (consumed to the next `>`, quotes
    *    ignored — doctypes land here; real comments/CDATA were already
    *    removed by [[stripRawRegions]]); any other `<` is literal text;
    *  - inside a tag, `"`/`'` opens a quoted attribute value only when it
    *    follows `=` (plus optional whitespace) — a `>` inside the quoted
    *    value does not end the tag; a stray quote elsewhere (or inside an
    *    unquoted value) is an ordinary character, per the spec's
    *    attribute-name / unquoted-value states;
    *  - EOF inside a tag or quoted value discards the partial tag
    *    (HTML5 "EOF in tag" rule), so `<div class="x` at EOF leaks
    *    nothing. Each removed tag leaves one space, as before. */
  private[functions] def stripTags(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c != '<' || i + 1 >= n) { sb.append(c); i += 1 }
      else {
        val d = s.charAt(i + 1)
        if ((d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') || d == '/') {
          i = skipTag(s, i + 1); sb.append(' ')
        } else if (d == '!' || d == '?') {
          val e = s.indexOf('>', i + 2)
          i = if (e < 0) n else e + 1
          sb.append(' ')
        } else { sb.append(c); i += 1 }
      }
    }
    sb.toString
  }

  /** Consume a tag starting just after its `<`; return the index after the
    * closing `>`, or end-of-string for an unterminated tag. */
  private def skipTag(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    var afterEq = false // a quote opens a value only in this state
    while (i < n) {
      s.charAt(i) match {
        case '>' => return i + 1
        case '=' => afterEq = true; i += 1
        case q @ ('"' | '\'') if afterEq =>
          val e = s.indexOf(q, i + 1)
          if (e < 0) return n
          i = e + 1; afterEq = false
        case ' ' | '\t' | '\n' | '\r' | '\f' => i += 1 // `= "v"` stays armed
        case _ => afterEq = false; i += 1
      }
    }
    n
  }

  private val NamedEntities: Map[String, String] = Map(
    "nbsp" -> " ", "amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "middot" -> "·", "bull" -> "•",
    "laquo" -> "«", "raquo" -> "»",
    "times" -> "×", "divide" -> "÷",
    "aacute" -> "á", "agrave" -> "à", "acirc" -> "â",
    "eacute" -> "é", "egrave" -> "è", "ecirc" -> "ê",
    "iacute" -> "í", "oacute" -> "ó", "ocirc" -> "ô",
    "uacute" -> "ú", "ccedil" -> "ç",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "szlig" -> "ß")

  private val EntityRe = "&(#[xX]?[0-9A-Fa-f]+|[A-Za-z][A-Za-z0-9]{1,30});".r

  /** Decode named and numeric (`&#65;` / `&#x2019;`) character references
    * in a single left-to-right pass — so `&amp;lt;` yields the literal
    * text `&lt;` (parser parity), not `<`. Unknown or out-of-range
    * references are left verbatim. */
  def decodeEntities(s: String): String =
    if (s == null) null
    else EntityRe.replaceAllIn(s, m => {
      val e = m.group(1)
      val repl =
        try {
          if (e.startsWith("#x") || e.startsWith("#X"))
            new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
          else if (e.startsWith("#"))
            new String(Character.toChars(Integer.parseInt(e.substring(1))))
          else NamedEntities.getOrElse(e, m.matched)
        } catch { case _: Exception => m.matched }
      java.util.regex.Matcher.quoteReplacement(repl)
    })

  /** Whitespace normalization (reference crawl_web.py:23). */
  def normalizeWs(s: String): String =
    if (s == null) null else s.replaceAll("[ \\t]+", " ").replaceAll("\\n{2,}", "\n\n").trim

  /** RFC-3986-ish urljoin (reference crawl_web.py:91 `urljoin`): resolve a
    * possibly-relative href against a base URL. */
  def urljoin(base: String, href: String): String = {
    if (href == null || href.isEmpty) return base
    try new java.net.URI(base).resolve(href).toString
    catch { case _: Exception => href }
  }
  val urljoinUdf: UserDefinedFunction = udf(urljoin _)

  /** Object-name sanitization (reference bronze.py:79-81 +
    * chunks_data.py:7-26): host+path with '/'→'_', extension → suffix. */
  def sanitizeName(url: String, suffix: String): String = {
    val u = try new java.net.URI(url) catch { case _: Exception => null }
    val base = if (u == null || u.getHost == null) url else u.getHost + Option(u.getPath).getOrElse("")
    base.replaceAll("[/\\\\]+", "_").replaceAll("\\.[A-Za-z0-9]{1,5}$", "") + suffix
  }
  val sanitizeNameUdf: UserDefinedFunction = udf(sanitizeName _)

  // ------------------------------------------------------------- columns

  /** SHA-256 content hash column (reference get_content_hash,
    * crawl_web.py:51-59) — Spark builtin, identical hex output. */
  def contentHash(c: Column): Column = sha2(c, 256)

  /** Canonical-struct hash (reference bronze.py:13-22 canonical-JSON
    * SHA-256): field order is fixed by struct construction. */
  def canonicalHash(cols: Column*): Column = sha2(to_json(struct(cols: _*)), 256)

  /** Deterministic footer/contact cleaner (engine version of the LLM
    * cleaning agent, reference agent_clean_data.py:16-48): strips email,
    * phone-like runs, and footer markers onward. */
  def cleanContact(c: Column): Column = {
    val noEmail = regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "")
    val noPhone = regexp_replace(noEmail, "(\\+?\\d[\\d .-]{7,}\\d)", "")
    trim(regexp_replace(noPhone, "(?is)(lien he|contact us|hotline).*$", ""))
  }
}
