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

  /** events.parquet's physical `ts` type has drifted across testdata
    * generations, so dispatch on the decoded Spark type and normalise every
    * variant to session-tz TimestampType (micros), which all downstream
    * `unix_micros`/window logic assumes:
    *
    *  - TIMESTAMP(NANOS): TimestampType can't hold nanos; read as long
    *    (`nanosAsLong`) and convert with integral `div` — `/` is double
    *    division and ns epochs (~1.7e18) exceed double's 53-bit mantissa,
    *    putting ~1.6% of rows 1 µs off. `div` truncates toward zero exactly
    *    like DuckDB's ns→µs cast, so µs-granularity oracles compare bit-exact.
    *  - timestamp[us] without tz: Spark reads TIMESTAMP_NTZ; cast to
    *    TimestampType. Sessions here run in UTC, so the wall-clock
    *    reinterpretation is epoch-identity and matches DuckDB, which treats
    *    the same column as naive-UTC.
    *  - TimestampType (re-landed copies: ScaleGen replicas,
    *    incremental-ingest output): pass through.
    *
    * Any OTHER physical type is a new drift: fail loudly with the type
    * instead of letting 4 queries + 8 specs break downstream. */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported physical type $other — testdata " +
            "schema drifted again; add a normalisation arm in Tables.events")
    }
  }
}
