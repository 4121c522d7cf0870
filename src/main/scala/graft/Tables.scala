package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader over a scale-factor directory.
  *
  * Mirrors the reference's "object-store table = prefix of files" model
  * (reference: dags/access/minio_io_manager.py:169-181 reads one parquet
  * object; here a table is a parquet path Spark scans in parallel with
  * column pruning + predicate pushdown — the 100 TB-safe equivalent).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet stores TIMESTAMP(NANOS) which Spark's TimestampType
    * (micros) cannot read directly; read nanos as long and convert. The
    * truncation ns→us matches DuckDB's microsecond timestamps in spirit;
    * oracle comparisons only use second/day granularity. */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }
}
