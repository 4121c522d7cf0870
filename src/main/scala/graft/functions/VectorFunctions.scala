package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns
  * (reference capability A8, SURVEY.md §2.4: the Milvus gold store's
  * similarity search, dags/utils/seed_milvus.py:7-25; vectors at binlog
  * field 106).
  *
  * All math is built from Spark higher-order functions (`aggregate` /
  * `zip_with`) so it stays codegen-friendly and — critically for the
  * DuckDB oracle — accumulates in IEEE double, sequentially left-to-
  * right, exactly like DuckDB's `list_sum(list_transform(...))`.
  * Empirically verified bit-identical across engines (see tools/check.py
  * runs on q24/q25).
  */
object VectorFunctions {

  /** SQL fragment: dot product of two float-array columns in double. */
  def dotExpr(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"

  /** SQL fragment: sum of squares of a float-array column in double. */
  def sumsqExpr(a: String): String =
    s"aggregate($a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"

  /** SQL fragment: cosine similarity of two float-array columns. */
  def cosineExpr(a: String, b: String): String =
    s"${dotExpr(a, b)} / (sqrt(${sumsqExpr(a)}) * sqrt(${sumsqExpr(b)}))"

  def dot(a: String, b: String): Column = expr(dotExpr(a, b))

  /** Cosine column — delegates to the native codegen'd Catalyst
    * expression (graft.plans.CosineSim), which ExpressionsSpec proves
    * bit-equal to the HOF form [[cosineExpr]]; the HOF string remains the
    * documentation of the exact arithmetic and the oracle's twin. */
  def cosine(a: String, b: String): Column =
    graft.plans.GraftExpressions.cosineSimNative(col(a), col(b))

  /** Interpreted HOF form (kept for equality testing). */
  def cosineHof(a: String, b: String): Column = expr(cosineExpr(a, b))

  // DuckDB twins of the fragments above (for oracle SQL) ------------------

  def duckDotExpr(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  def duckSumsqExpr(a: String): String =
    s"list_sum(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  def duckCosineExpr(a: String, b: String): String =
    s"${duckDotExpr(a, b)} / (sqrt(${duckSumsqExpr(a)}) * sqrt(${duckSumsqExpr(b)}))"

  /** DuckDB twin of [[graft.operators.Similarity.guardedCosine]]: cosine
    * with NaN (zero-norm input → 0/0) mapped to -Infinity, so a ranking
    * over it never prefers a degenerate vector. DuckDB sorts NaN LARGEST
    * (above +inf) exactly like Spark, so wherever the Spark side applies
    * the guard the oracle twin must too or the two engines' argmax
    * would diverge on a zero-norm slice. */
  def duckGuardedCosineExpr(a: String, b: String): String = {
    val c = duckCosineExpr(a, b)
    s"(CASE WHEN isnan($c) THEN CAST('-infinity' AS DOUBLE) ELSE $c END)"
  }

  // ------------------------------------------------------- hash embedding

  /** Deterministic feature-hash embedding (engine substitute for the
    * reference's OpenAI `text-embedding-3-large` call, seed_milvus.py:19 —
    * an external service per SURVEY §7.4; substituted per §5 so the gold
    * pipeline is reproducible and testable offline). Tokens are hashed to
    * a dimension and a sign; the result is L2-normalized. */
  def hashEmbed(text: String, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      for (tok <- text.split("\\s+") if tok.nonEmpty) {
        val h = scala.util.hashing.MurmurHash3.stringHash(tok)
        val idx = math.floorMod(h, dim)
        v(idx) += (if (((h >>> 31) & 1) == 1) -1f else 1f)
      }
    }
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n > 0) { i = 0; while (i < dim) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }

  val hashEmbedUdf: UserDefinedFunction = udf((text: String, dim: Int) => hashEmbed(text, dim))
}
