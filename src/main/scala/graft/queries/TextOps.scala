package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-pipeline operator demos (chunking, dedup, analysis) — filled in
  * incrementally; see SURVEY.md §2.3/§2.5 and the training-data ops. */
object TextOps {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
