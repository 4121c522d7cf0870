package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY.md §2.7: the reference is batch-
  * only — `schedule_interval=None` DAGs with date-partition increments,
  * bronze.py:127 — so streams here are the engine's scale-up of that
  * incremental model: the landing path read as an unbounded source).
  *
  * Each streaming transform has a batch twin in the oracle suite
  * (q31 tumbling, q28 sessionize) and StreamingSpec asserts equality.
  */
object EventsStream {

  /** events schema as Spark reads it post ns→us conversion. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-stream source over a directory of parquet events (the
    * date-partitioned landing path as micro-batches). */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Incremental ingest with exactly-once bookkeeping — the engine's form
    * of the reference's manually-triggered, date-partition-incremental
    * DAG runs (bronze.py:127, SURVEY §2.7 streaming row): each invocation
    * processes ONLY files that appeared since the last run
    * (`Trigger.AvailableNow` drains the backlog and stops; the checkpoint
    * records consumed files), appends them to `destDir`, and returns.
    * Re-running with no new data is a no-op — the property that makes
    * scheduled re-runs and crash-retries safe without any bookkeeping
    * table. At scale this replaces "reprocess the whole landing path per
    * run" with O(new files) work per run. */
  def incrementalIngest(spark: SparkSession, srcDir: String, destDir: String,
                        checkpointDir: String): Unit = {
    val q = source(spark, srcDir)
      .writeStream.format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Tumbling 6h windowed counts with a 1h watermark — the streaming twin
    * of q31_tumbling_window. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("w.start")).as("bucket_start_epoch"),
        col("event_type"), col("n"))

  /** Streaming exact dedup (A1's unbounded form): drop replayed events by
    * id, keeping state only within the watermark horizon — at-least-once
    * sources (kafka replays, file redelivery) become effectively-once
    * without unbounded state. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream inner join (§2.7's last streaming shape):
    * each purchase matches the same user's clicks in the preceding
    * `boundSec` seconds. The watermark plus the time-range predicate let
    * the state store evict click rows older than
    * `watermark - boundSec` and purchase rows older than the watermark,
    * so state is O(events within the horizon), never O(stream). The
    * same expression runs unchanged as a batch query (watermarks are
    * no-ops in batch) — StreamingSpec asserts stream ≡ batch on the
    * shared fixture and containment of the q36 as-of click. */
  def clickPurchaseJoin(events: DataFrame, boundSec: Long = 1800L,
                        watermarkDelay: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermarkDelay)
    purchases.join(clicks,
      col("click_user") === col("user_id") &&
        col("click_ts") < col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $boundSec SECONDS"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  // ---- stateful sessionization (mapGroupsWithState) ---------------------

  case class Evt(event_id: Long, ts: java.sql.Timestamp, user_id: Long)
  case class SessionAgg(user_id: Long, session_id: Long, n_events: Long, duration_sec: Long)
  case class SessState(lastTs: Long, sessionId: Long, n: Long, startTs: Long)

  /** Gap-based (30 min) session assignment via flatMapGroupsWithState —
    * the streaming twin of q28_sessionize. A session is emitted when a
    * later event closes it (gap exceeded) or when the event-time
    * watermark passes its end (event-time timeout), so an idle user's
    * final session is always flushed.
    *
    * State bound: open-session state (events being accumulated) lives
    * only until watermark + gap; after the timeout flush a 4-long
    * closed marker per distinct user remains, carrying the session
    * counter so a returning user's next session continues the numbering
    * (batch-q28 parity) instead of colliding with emitted keys. Total
    * state is therefore O(distinct users), never O(events); a
    * deployment that prefers strict eviction over stable numbering can
    * derive session ids from session start time instead.
    *
    * Ordering assumption: in-order per user across micro-batches — see
    * the [[funnelDepths]] scaladoc for the shared multi-batch
    * late-arrival caveat. */
  def sessionize(events: Dataset[Evt], gapSec: Long = 1800L,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Evt], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // flush the open session but KEEP a closed marker (n = 0)
            // carrying the session counter: removing state entirely would
            // restart the next session at id 1, colliding with the
            // already-emitted keys. The marker is 4 longs per user and
            // registers no further timeout, so state stays bounded.
            val st = state.get
            state.update(st.copy(n = 0L))
            Iterator.single(SessionAgg(user, st.sessionId, st.n, st.lastTs - st.startTs))
          } else {
            // events within a micro-batch arrive unordered — sort by (ts, id)
            val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L, 0L, 0L))
            var out = List.empty[SessionAgg]
            for (e <- evs) {
              val t = e.ts.getTime / 1000
              // n == 0: no open session (fresh user OR post-flush marker) —
              // continue the counter, never reuse an emitted session_id
              if (st.n == 0L) st = SessState(t, st.sessionId + 1, 1L, t)
              else if (t - st.lastTs > gapSec) {
                out ::= SessionAgg(user, st.sessionId, st.n, st.lastTs - st.startTs)
                st = SessState(t, st.sessionId + 1, 1L, t)
              } else st = st.copy(lastTs = t, n = st.n + 1)
            }
            state.update(st)
            // flush when the watermark passes session end (clamped forward:
            // the API rejects timestamps at/behind the current watermark)
            state.setTimeoutTimestamp(
              math.max(st.lastTs * 1000L + gapSec * 1000L, state.getCurrentWatermarkMs() + 1L))
            out.reverseIterator
          }
      }
  }

  case class FEvt(event_id: Long, ts: java.sql.Timestamp, user_id: Long, event_type: String)
  case class FunnelAgg(user_id: Long, session_id: Long, depth: Long)
  case class FunnelState(lastTs: Long, sessionId: Long, n: Long, depth: Long)

  /** Streaming k-step funnel — the stateful twin of
    * `Funnel.sessionDepths` (q67's per-session surface): the same
    * gap-rule session machine as [[sessionize]] with the greedy step
    * matcher fused in (events scanned in (event-time µs, event_id)
    * order; an event advances the funnel iff its type is the next
    * unmatched step — identical to the batch side's strictly-after
    * position join). Emits (user, session, depth 0..k) when a session
    * closes; same state bound as sessionize (O(distinct users)).
    *
    * Ordering assumption (shared with [[sessionize]]): events are
    * applied in event-time order WITHIN each micro-batch, but a
    * late-yet-within-watermark event delivered in a LATER batch is
    * folded in after already-processed later events, so session splits
    * and funnel depth can diverge from the batch twin under multi-batch
    * late arrival. Batch-equivalence holds for in-order-per-user
    * delivery (the file/kafka-per-key common case, and what
    * StreamingSpec asserts); buffering events until the watermark
    * passes would close the gap at O(in-flight events) extra state. */
  def funnelDepths(events: Dataset[FEvt], steps: Seq[String], gapSec: Long = 1800L,
                   watermarkDelay: String = "10 minutes"): Dataset[FunnelAgg] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val k = steps.length
    // full µs precision: Timestamp.getTime is ms-truncated and would
    // mis-order same-ms events vs the batch (ts, event_id) sort
    def evUs(e: FEvt): Long = e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[FEvt], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            // flush + closed marker carrying the session counter, exactly
            // like sessionize — see that scaladoc for the state argument
            val st = state.get
            state.update(st.copy(n = 0L, depth = 0L))
            Iterator.single(FunnelAgg(user, st.sessionId, st.depth))
          } else {
            val evs = it.toSeq.sortBy(e => (evUs(e), e.event_id))
            var st = state.getOption.getOrElse(FunnelState(Long.MinValue, 0L, 0L, 0L))
            var out = List.empty[FunnelAgg]
            for (e <- evs) {
              val t = evUs(e) / 1000000L // gap rule is on whole seconds (q28 parity)
              if (st.n == 0L) st = FunnelState(t, st.sessionId + 1, 1L, 0L)
              else if (t - st.lastTs > gapSec) {
                out ::= FunnelAgg(user, st.sessionId, st.depth)
                st = FunnelState(t, st.sessionId + 1, 1L, 0L)
              } else st = st.copy(lastTs = t, n = st.n + 1)
              if (st.depth < k && e.event_type == steps(st.depth.toInt))
                st = st.copy(depth = st.depth + 1)
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastTs * 1000L + gapSec * 1000L, state.getCurrentWatermarkMs() + 1L))
            out.reverseIterator
          }
      }
  }

  /** Drain a streaming DataFrame synchronously into a memory table and
    * return the result (test/driver harness helper). */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
