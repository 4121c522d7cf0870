package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Vector/similarity operator demos (kNN, near-dup) — filled in
  * incrementally; see SURVEY.md §2.4 A8 and the training-data ops. */
object VectorOps {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
