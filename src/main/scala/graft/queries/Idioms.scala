package graft.queries

/** The cross-engine oracle idioms shared by every query family — ONE
  * definition so the Spark expression and its DuckDB twin cannot drift
  * between files (TextOps, TrainingOps and their specs all build on
  * these):
  *
  *  - tokens = whitespace split with empties dropped;
  *  - 60-bit string hash = first 15 hex chars of sha256 parsed as a
  *    BIGINT — bit-identical across engines (pinned by every hash-keyed
  *    oracle since q20);
  *  - word n-grams = space-joined sliding windows, guarded on the Spark
  *    side because `sequence(1, 0)` yields [1, 0] (descending) where
  *    DuckDB's generate_series is empty.
  */
private[graft] object Idioms {

  val toksExpr = "filter(split(text, ' '), w -> w <> '')"
  val toksSql = "list_filter(string_split(text, ' '), w -> w <> '')"

  def hash60Expr(c: String): String =
    s"CAST(conv(substr(sha2($c, 256), 1, 15), 16, 10) AS BIGINT)"
  def hash60Sql(c: String): String =
    s"('0x'||substr(sha256($c),1,15))::bigint"

  /** Spark: all `n`-grams of the token-array column `toksCol`. */
  def ngramsExpr(toksCol: String, n: Int): String =
    s"""CASE WHEN size($toksCol) >= $n
       | THEN transform(sequence(1, size($toksCol) - ${n - 1}),
       |   i -> concat_ws(' ', slice($toksCol, i, $n)))
       | ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin

  /** DuckDB twin over the token-list column `tkCol` (slice bound is
    * inclusive, so [i : i+n-1] is n elements). */
  def ngramsSql(tkCol: String, n: Int): String =
    s"list_transform(generate_series(1, len($tkCol) - ${n - 1}), i -> array_to_string($tkCol[i:i+${n - 1}], ' '))"

  /** Codegen'd n-gram at the 1-based position column `iCol`: n
    * element_ats joined with single spaces through concat — every
    * operator stays inside whole-stage codegen. [[ngramsExpr]]'s
    * transform(sequence, concat_ws(slice)) form builds the SAME text
    * but evaluates as interpreted lambda expressions (measured ~30×
    * slower at 100× when the grams are exploded — q80's round-12 fix);
    * prefer `explode(sequence(1, size(toks) - n + 1))` + this for any
    * corpus-sized gram explode, and keep ngramsExpr for genuinely
    * array-valued uses. */
  def gramAtExpr(toksCol: String, iCol: String, n: Int): String =
    (0 until n).map(k => s"element_at($toksCol, $iCol + $k)")
      .mkString("concat(", ", ' ', ", ")")

  /** Integer piecewise-linear log2 of the positive BIGINT column `x`,
    * in units of 2⁻¹⁰ bits: floor(log2 x) from the binary digit count
    * plus a 10-bit linear mantissa — max error 0.0861 bits (chord at
    * x = 1/ln2) + 1/1024 (mantissa truncation), NO transcendentals, so
    * both engines agree bit-for-bit. Introduced for q74's CCNet
    * surprisal; reused by q75's BM25 idf. `x` should be a plain column
    * name (the expression evaluates it three times). */
  def pl2Expr(x: String): String =
    s"(length(bin($x)) - 1) * 1024 + " +
      s"($x * 1024 div shiftleft(CAST(1 AS BIGINT), length(bin($x)) - 1)) - 1024"

  /** DuckDB twin (`//` floors like Spark's `div` on positives; the
    * shift is spelled `<<`). */
  def pl2Sql(x: String): String =
    s"(length(bin($x)) - 1) * 1024 + " +
      s"($x * 1024 // (1::BIGINT << (length(bin($x)) - 1))) - 1024"
}
