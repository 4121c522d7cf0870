package graft.sources

import graft.etl.TxTable

import org.apache.spark.sql.{DataFrame, GraftBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.streaming.OutputMode

/** `df.writeStream.format("graft")` — the transactional sink half of
  * the streaming story (the source half is [[GraftTailSource]]): each
  * micro-batch commits through [[TxTable.appendIdempotent]] tagged
  * (appId, batchId), so the engine's at-least-once `addBatch` replay
  * (crash after the table commit, before the engine's own batch
  * commit) lands EXACTLY ONCE in the table — the replayed batch id is
  * already recorded in the manifest's txn map and the call no-ops.
  * This is Delta's documented sink recipe (txn action + idempotent
  * writes); together with the tail source, a standing pipeline can
  * read a TxTable incrementally, transform, and write a TxTable, with
  * exactly-once on BOTH edges.
  *
  * Output modes: Append commits each batch's rows; Complete commits a
  * full-replace [[TxTable.refresh]] per batch (the full-result shape
  * of streaming aggregations — replay repeats the identical refresh,
  * harmless by idempotence of content). Update is rejected: its rows
  * are upserts, which need a key the sink API doesn't carry — use
  * `foreachBatch` with [[TxTable.mergeUpsert]] for that shape.
  *
  * `appId` option: the writer identity for the txn map; defaults to
  * the query's checkpoint location (stable across restarts, exactly
  * what Delta keys on). A table written by several streams needs
  * distinct appIds, which distinct checkpoints give for free.
  */
final case class GraftTableSink(sqlContext: SQLContext, root: String,
                                appId: String, mode: OutputMode) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = GraftBridge.batchFrame(data)
    if (mode == OutputMode.Complete())
      TxTable.refresh(sqlContext.sparkSession, root, batch)
    else
      TxTable.appendIdempotent(sqlContext.sparkSession, root, batch,
        appId, batchId)
  }
}
