package graft.model

import org.apache.spark.sql.types._

/** Layer schemas recovered from the reference's live artifacts
  * (SURVEY.md §1.2; FIXTURES.md §A). Explicit StructTypes replace the
  * reference's schema-on-read dicts: permissive at the bronze edge
  * (open MapType metadata), fixed at gold. */
object Schemas {

  /** Bronze record (reference crawl_web.py:86,97 HTML / :47 PDF):
    * `links` is null for PDF-like records. */
  val bronze: StructType = StructType(Seq(
    StructField("page_content", StringType, nullable = true),
    StructField("metadata", MapType(StringType, StringType), nullable = true),
    StructField("links", ArrayType(StringType), nullable = true)))

  /** Silver chunk (reference chunks_data.py:107-110). */
  val silver: StructType = StructType(Seq(
    StructField("split_content", StringType, nullable = false),
    StructField("metadata", MapType(StringType, StringType), nullable = true)))

  /** Gold vector row (reference seed_milvus.py:52-60,81; Milvus binlog
    * fields 100-106 — vector dim is configurable here, 64 for tests
    * in place of the reference's 3072). */
  val gold: StructType = StructType(Seq(
    StructField("pk", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("content_type", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("vector", ArrayType(FloatType), nullable = false)))
}
