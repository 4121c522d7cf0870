package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Row-level error isolation (reference semantic §2.8 / A4: per-URL
  * try/except so one failure never kills the run — bronze.py:102-104,
  * crawl_web.py:48-50 — and the `failed_urls` accumulator reported at the
  * end, bronze.py:56,104-108).
  *
  * Engine form: a risky scalar function becomes a struct-returning UDF
  * `(result, error)`; the pipeline then splits into a clean stream and a
  * quarantine stream with two filters — both distributed, no
  * driver-side accumulation of failures. */
object Reliability {

  /** Wrap a risky String=>String function into a (result, error) UDF. */
  def tryUdf(f: String => String): UserDefinedFunction =
    udf { (s: String) =>
      try (f(s), null: String)
      catch { case e: Exception => (null: String, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }

  /** Apply a wrapped function and split: (clean rows with `outCol`,
    * quarantined rows with `errorCol`).
    *
    * Both returned frames share the `applied` subtree, so acting on each
    * re-evaluates the wrapped UDF over all rows. For an expensive or
    * side-effecting `f`, persist or land `applied`'s parent first (the
    * bronze pattern: land, then split the landed table) — the split
    * itself is two cheap filters either way. */
  def applyWithQuarantine(df: DataFrame, in: Column, wrapped: UserDefinedFunction,
                          outCol: String, errorCol: String = "error"): (DataFrame, DataFrame) = {
    val applied = df.withColumn("_r", wrapped(in))
      .withColumn(outCol, col("_r._1"))
      .withColumn(errorCol, col("_r._2"))
      .drop("_r")
    (applied.filter(col(errorCol).isNull).drop(errorCol),
      applied.filter(col(errorCol).isNotNull))
  }
}
