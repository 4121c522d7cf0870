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
    * Both returned frames share the `applied` subtree. With
    * `persist = true` (the safe default for an expensive or
    * side-effecting `f`) the applied frame is cached before the split,
    * so the wrapped UDF runs once per row no matter how many of the two
    * streams are acted on — the caller should `unpersist()` either
    * returned frame's `queryExecution` input when done, or simply let it
    * age out. With `persist = false` the split is pure lineage: each
    * stream's action re-evaluates the UDF over all rows (the bronze
    * land-then-split pattern makes that harmless). */
  def applyWithQuarantine(df: DataFrame, in: Column, wrapped: UserDefinedFunction,
                          outCol: String, errorCol: String = "error",
                          persist: Boolean = true): (DataFrame, DataFrame) = {
    val applied0 = df.withColumn("_r", wrapped(in))
      .withColumn(outCol, col("_r._1"))
      .withColumn(errorCol, col("_r._2"))
      .drop("_r")
    val applied = if (persist) applied0.persist() else applied0
    (applied.filter(col(errorCol).isNull).drop(errorCol),
      applied.filter(col(errorCol).isNotNull))
  }
}
