package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet prefixes — the operational
  * counterpart of the reference's batched full-refresh loads
  * (vectorstore_data.py's per-batch uploads and the per-URL bronze
  * writes both sprawl objects; SURVEY §4.1). At 100 TB the failure mode
  * is a prefix of millions of KB-sized files: every scan pays open/seek
  * per file, the driver pays listing + footer reads, and shuffle
  * planning degrades. Compaction rewrites a prefix into
  * ceil(bytes / targetBytes) files and swaps it in place.
  *
  * Shape notes:
  *  - sizing comes from the filesystem (`getContentSummary`), not a
  *    count() job — no data pass to plan the rewrite;
  *  - `shuffle = false` (default) uses `coalesce`: a map-side file
  *    concat with NO shuffle — output sizes inherit input skew but the
  *    rewrite moves each byte exactly once. `shuffle = true` uses
  *    `repartition` for evenly-sized output at one full shuffle — worth
  *    it when downstream scans care about per-file parallelism;
  *  - the swap is write-to-staging → rename(live, old) → rename(staging,
  *    live) → delete(old): at every step the full dataset exists under a
  *    well-known name, so any crash leaves a recoverable directory (a
  *    crash between the renames leaves `_old` — nothing is deleted until
  *    the new files are live). The fully atomic upgrade is the table
  *    format's metadata swap — built in round 15 as [[TxTable.compact]]:
  *    a same-data re-layout COMMIT that serializes with concurrent
  *    upserts and keeps the pre-compaction version time-travel
  *    readable. Prefer it for TxTable-backed tables; this directory
  *    form remains for plain parquet prefixes (standing index
  *    partitions, silver layouts);
  *  - partitioned layouts compact per partition directory (point this
  *    at one partition, the way [[Silver.refreshPartition]] scopes its
  *    overwrite) so untouched partitions keep their files byte-identical.
  *
  * Returns (filesBefore, filesAfter, bytes).
  */
object Compact {

  val DefaultTargetBytes: Long = 128L * 1024 * 1024

  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = DefaultTargetBytes,
              shuffle: Boolean = false): (Long, Long, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val before = parquetFiles(fs, path)
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val staging = new Path(dir + "_compacting")
    val old = new Path(dir + "_old")
    val df = spark.read.parquet(dir)
    (if (shuffle) df.repartition(nOut) else df.coalesce(nOut))
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"rename $path -> $old failed")
    if (!fs.rename(staging, path)) {
      fs.rename(old, path) // restore the live prefix before giving up
      throw new java.io.IOException(s"rename $staging -> $path failed")
    }
    fs.delete(old, true)
    (before, parquetFiles(fs, path), bytes)
  }

  /** Compact every partition directory of a partitioned layout — the
    * standing indexes' `centroid_id=`/`bucket=` dirs gain ONE file per
    * ingest batch ([[graft.streaming.EmbeddingsStream.ivfIngest]] /
    * [[graft.streaming.TextIndexStream.ingest]] append per drop), so a
    * year of daily drops is 365 files per partition unless somebody
    * sweeps. Each partition gets its own crash-safe swap: a failure
    * mid-sweep leaves every partition either fully old or fully new,
    * always readable, and untouched partitions keep their files
    * byte-identical. Partitions already at/below `minFiles` are skipped
    * (no data moves for an already-compact index). Returns
    * (filesBefore, filesAfter, bytes) summed over compacted partitions. */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetBytes: Long = DefaultTargetBytes,
                         shuffle: Boolean = false,
                         minFiles: Long = 2): (Long, Long, Long) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    parts.foldLeft((0L, 0L, 0L)) { case ((b, a, by), p) =>
      if (parquetFiles(fs, p.getPath) < minFiles) (b, a, by)
      else {
        val (pb, pa, pby) = compact(spark, p.getPath.toString, targetBytes, shuffle)
        (b + pb, a + pa, by + pby)
      }
    }
  }

  private def parquetFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path): Long =
    fs.listStatus(p).count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
}
