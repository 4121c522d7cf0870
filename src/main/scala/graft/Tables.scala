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

  /** Measurement-only hook ([[graft.queries.OptProbe]]): when set, every
    * [[apply]] is wrapped in [[spreadBySize]] so a query can be A/B-timed
    * with/without the spread in ONE JVM. Never set outside the probe. */
  @volatile private[graft] var probeSpreadAll = false

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = raw(spark, sfDir, name)
    if (probeSpreadAll) {
      val (bytes, files) = pathStats(s"$sfDir/$name.parquet")
      spreadBySize(spark, df, bytes, files)
    } else df
  }

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) else
      readStamped(spark, s"$sfDir/$name.parquet")

  /** Round-19 optimization: per-JVM schema memo, keyed by the table
    * path + a name:size:mtime fingerprint of its physical files (the
    * stampedKey staleness contract — a rewrite re-infers). A bare
    * `spark.read.parquet(path)` runs a footer schema-inference job on
    * the driver EVERY time; at ~175 table reads per bench pass that was
    * ~60 ms × reads ≈ 20% of the whole sf0.1 suite (measured
    * read_plain 0.16 s vs read_schema 0.10 s on a 3 KB table — the
    * cost is the inference job, not the data). This is exactly the
    * metadata a catalog/metastore serves at deployment; caching it
    * per-JVM is the path-based equivalent. Results are unchanged: the
    * cached schema IS the one inference produced on the same files. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap[String, org.apache.spark.sql.types.StructType]()

  private def readStamped(spark: SparkSession, path: String): DataFrame = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.sortBy(_.getName).toSeq).getOrElse(Nil).flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(path))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    // Round-20 (verdict item 7): key on the FULL fingerprint string, not
    // its 32-bit hashCode — a collision between two on-disk states of
    // the same path must never serve a stale schema. The map holds one
    // live entry per table (a rewrite orphans the old key), so the
    // longer key costs nothing.
    val sch = schemaCache.getOrElseUpdate(s"$path@$sig",
      spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** Recursive on-disk size + file count of a table path (single file or
    * a parquet directory of parts). */
  private[graft] def pathStats(path: String): (Long, Long) = {
    def walk(f: java.io.File): (Long, Long) =
      if (f.isFile) (f.length(), 1L)
      else Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        .map(walk).foldLeft((0L, 0L)) { case ((b, n), (b2, n2)) => (b + b2, n + n2) }
    walk(new java.io.File(path))
  }

  /** SCALE-ADAPTIVE parallelism spread for compute-heavy map paths
    * (guide §2: "make partitioning scale-adaptive — derive from input
    * size — rather than a constant tuned for either local mode or the
    * cluster"). Spark's scan parallelism is ceil((bytes + files ·
    * openCost) / maxPartitionBytes) splits; a small table (one 600 KB
    * parquet file at the sf0.1 gate — or a bounded audit slice at ANY
    * scale) therefore runs its entire scan-side pipeline — per-token
    * sha256, shingle generation, LSH plane dots, broadcast-join pair
    * loops — in ONE task while the other cores idle. When the estimated
    * split count is below the session's default parallelism, insert one
    * round-robin repartition so the heavy map work that FOLLOWS uses
    * every core; when the input is big enough to split naturally (any
    * production table), the rule is a no-op and the plan is untouched.
    * The exchange moves only the rows the caller kept (apply it after
    * pushed filters / audit-slice cuts), and every consumer here is
    * aggregation/join-shaped, so row order never reaches a result. */
  /** Measurement-only hook ([[graft.queries.OptProbe]] `+N` suffix):
    * when set, [[spreadBySize]] is a no-op so an adopted spread can be
    * A/B-timed against the plain read in ONE JVM without duplicating
    * the query. Never set outside the probe. */
  @volatile private[graft] var probeSpreadNever = false

  private[graft] def spreadBySize(spark: SparkSession, df: DataFrame,
                                  bytes: Long, files: Long): DataFrame = {
    val conf = spark.sessionState.conf
    val maxPB = conf.filesMaxPartitionBytes
    val openCost = conf.filesOpenCostInBytes
    val par = spark.sparkContext.defaultParallelism.toLong
    // Round-20 (advisor item 1): mirror Spark's own split sizing
    // (FilePartition.maxSplitBytes = min(maxPartitionBytes,
    // max(openCostInBytes, totalBytes / defaultParallelism))) instead of
    // the round-19 ceil(totalBytes / maxPartitionBytes) underestimate —
    // that formula predicted 1 split for any table under 128 MB, so in
    // the ~128 MB–4 GB band the spread would have inserted a redundant
    // full-table round-robin exchange on a scan that already ran at full
    // parallelism. With the real formula, splits >= par whenever
    // totalBytes >= par·openCost (~128 MB at 32 cores), making the rule
    // a true no-op there.
    val totalBytes = bytes + files * openCost
    val maxSplit = maxPB.min(openCost.max(totalBytes / par.max(1L)))
    val splits = ((totalBytes + maxSplit - 1) / maxSplit.max(1L)).max(1L)
    if (splits < par && !probeSpreadNever) df.repartition(par.toInt) else df
  }

  /** [[apply]] + [[spreadBySize]] over the table's own on-disk size —
    * the read for scan-side-compute-heavy queries. */
  def spread(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val (bytes, files) = pathStats(s"$sfDir/$name.parquet")
    spreadBySize(spark, raw(spark, sfDir, name), bytes, files)
  }

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
    val df = readStamped(spark, s"$sfDir/events.parquet")
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
