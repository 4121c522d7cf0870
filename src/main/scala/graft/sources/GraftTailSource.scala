package graft.sources

import graft.etl.TxTable

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft").load(path)` — incremental tailing
  * of a [[TxTable]] commit log as a Structured Streaming source, the
  * Delta-streaming-source recipe (Armbrust et al. §4.4: "treat the log
  * as a message queue"): the stream OFFSET is the table VERSION, each
  * micro-batch is exactly the data dirs that versions (start, end] ADDED
  * relative to their predecessors, and the checkpoint's offset log makes
  * consumption exactly-once per committed dir across restarts (dirs are
  * immutable, versions dense, so (start, end] is replay-stable).
  *
  * Rewrite semantics, mirroring Delta's documented streaming contract.
  * The hazard test is structural, not action-name matching: a version
  * REWRITES rows iff it DROPS a dir its predecessor listed (the
  * dropped dir's rows may reappear inside the version's fresh dirs —
  * refresh/compact/merge all have this shape; an append, a migrate, a
  * metadata-only setstats, or a merge/refresh landing on an EMPTY
  * table drop nothing and stream as pure appends). On a rewriting
  * version the source FAILS by default (a checkpointed stream must not
  * silently double-count) — exactly Delta's error asking for
  * `ignoreChanges`. With option `ignoreChanges=true` the fresh dirs are
  * re-emitted (downstream dedupes by key — at-least-once on rewritten
  * rows, the contract Delta documents); a deletion-only version
  * (dirs dropped, none added) is likewise accepted only under
  * `ignoreChanges` (Delta's `ignoreDeletes` case, folded into the one
  * option here).
  *
  * Options: `startingVersion` = N (tail from version N inclusive;
  * default 0 = replay the full committed history first, the
  * FileStreamSource convention) or `"latest"` (only versions committed
  * after stream start). `ignoreChanges` as above.
  * `maxVersionsPerBatch` = N (admission control, Delta's
  * `maxFilesPerTrigger` role): each micro-batch admits at most N
  * versions, so a stream restarted after a week of commits drains the
  * backlog in bounded batches instead of one giant memory/skew-spiking
  * batch. The cap is applied in [[getOffset]] relative to the last
  * offset this source has SEEN (offered or replayed) — on restart the
  * engine re-initializes the source with the checkpointed offsets via
  * getBatch before asking for new ones, so the cap never re-admits or
  * skips committed versions; exactly-once is untouched (spec-pinned).
  *
  * Vacuuming versions the stream has not processed yet makes getBatch
  * fail loudly on the missing manifest (data loss must never be
  * silent); retention must trail the slowest stream, the same
  * operational contract as the table's readers.
  */
final case class GraftTailSource(sqlContext: SQLContext, root: String,
                                 userSchema: Option[StructType],
                                 parameters: Map[String, String],
                                 metadataPath: String) extends Source {

  private val spark: SparkSession = sqlContext.sparkSession
  private val ignoreChanges = GraftStreamCore.ignoreChanges(parameters)
  /** Exclusive lower bound, `startingVersion=latest` anchored durably
    * under the checkpoint — semantics and anchor location shared with
    * the DSv2 path via [[GraftStreamCore.resolveStartExclusive]]. */
  private val startExclusive: Long = GraftStreamCore.resolveStartExclusive(
    spark, root, parameters, metadataPath)

  private val maxVersionsPerBatch: Option[Long] =
    GraftStreamCore.maxVersionsPerBatch(parameters)

  /** Highest version this source has offered or replayed — the
    * admission cap's base. Restart safety: MicroBatchExecution
    * re-initializes a V1 source by calling getBatch with the
    * checkpoint's committed offsets BEFORE the first getOffset, so this
    * watermark is restored past everything already emitted; if that
    * re-init ever didn't happen, the cap could only make getOffset
    * return an offset BELOW the checkpointed one, which the engine
    * treats as no-new-data for the replayed range (getBatch over an
    * empty version range) — never a re-emission. */
  @volatile private var seenThrough: Long = startExclusive

  override val schema: StructType =
    userSchema.getOrElse(TxTable.tableSchema(spark, root))

  private def ver(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other         => other.json.trim.toLong // SerializedOffset on restart
  }

  override def getOffset: Option[Offset] = {
    val v = TxTable.latestVersion(root)
    val capped = maxVersionsPerBatch match {
      case Some(m) => math.min(v, math.max(seenThrough, startExclusive) + m)
      case None    => v
    }
    if (capped < 0 || capped <= startExclusive) None
    else { seenThrough = math.max(seenThrough, capped); Some(LongOffset(capped)) }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startExclusive)
    val to = ver(end)
    // restart re-init (populateStartOffsets) and replayed batches both
    // land here: everything through `to` is spoken for
    seenThrough = math.max(seenThrough, to)
    // A fresh stream (no checkpointed offset yet) may start past
    // vacuumed history: the first RETAINED version bootstraps as a full
    // snapshot (prev = empty — nothing was emitted yet, so re-emission
    // is impossible) and earlier vacuumed versions contribute nothing.
    // A RESUMED stream finding a vacuumed version (or a vacuumed
    // predecessor it needs for the diff) must fail loudly instead:
    // it HAS emitted rows, so both skipping and full re-emission would
    // silently break exactly-once — retention must trail the slowest
    // stream (r17 reviewer: startingVersion=N on a vacuumed table
    // previously failed even for the safe fresh-start case).
    val fresh = GraftStreamCore.freshDirs(root, from, to,
      bootstrap = start.isEmpty, ignoreChanges = ignoreChanges)
    val batch =
      if (fresh.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(fresh.map(d => s"$root/$d"): _*)
    GraftBridge.streamingFrame(batch)
  }

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}
