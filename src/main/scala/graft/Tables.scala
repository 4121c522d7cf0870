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
    * (micros) cannot read directly; read nanos as long and convert with
    * integral division (`div`): `/` is double division and ns epochs
    * (~1.7e18) exceed double's 53-bit mantissa, putting ~1.6% of rows
    * 1 µs off. `div` truncates toward zero exactly like DuckDB's
    * ns→µs cast, so µs-granularity oracles (q39) compare bit-exact. */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    // the driver's testdata stores TIMESTAMP(NANOS) (read as long above);
    // re-landed copies (ScaleGen replicas, incremental-ingest output) are
    // already µs TimestampType and need no conversion
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
