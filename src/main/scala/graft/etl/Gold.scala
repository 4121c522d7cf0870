package graft.etl

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold layer — embed + vector table (reference dags/gold.py +
  * dags/utils/seed_milvus.py).
  *
  * The reference collects the whole corpus into a Python list and batches
  * OpenAI/Milvus calls (seed_milvus.py:42-86 — the OOM-at-scale pattern
  * SURVEY §7.4 flags). Here the embed is a per-row deterministic function
  * (T3 substitute), pk is Spark's `uuid()` (F9), defaults are coalesce
  * (P5/P6), and the "collection" is an overwritten parquet table (S12) —
  * all executor-parallel, nothing driver-side.
  */
object Gold {

  val VectorDim = 64

  /** silver chunks → gold vector rows with metadata defaults
    * (seed_milvus.py:52-60: title/description/content_type defaults). */
  def build(silver: DataFrame, dim: Int = VectorDim): DataFrame =
    silver.select(
      expr("uuid()").as("pk"),
      coalesce(col("metadata").getItem("source"), lit("unknown")).as("source"),
      coalesce(col("metadata").getItem("content_type"), lit("text/plain")).as("content_type"),
      coalesce(col("metadata").getItem("title"), lit("Untitled")).as("title"),
      coalesce(col("metadata").getItem("description"), lit("No description available")).as("description"),
      col("split_content").as("text"),
      VectorFunctions.hashEmbedUdf(col("split_content"), lit(dim)).as("vector"))

  /** drop_old=True collection refresh (seed_milvus.py:75) — committed
    * through the [[TxTable]] log since round 15: the "dropped" old
    * collection stays time-travel readable until an explicit vacuum
    * (strictly more capability than the reference's destructive
    * drop_old, same visible semantics through [[readTable]]). */
  def refresh(gold: DataFrame, path: String): Unit = {
    val spark = gold.sparkSession
    migrateLegacy(spark, path)
    TxTable.refresh(spark, path, gold)
  }

  /** A pre-TxTable plain-parquet table at `path` becomes the log's
    * version 0 (its loose root files are cleared — the bytes live in
    * the log thereafter); no-op for fresh or already-versioned paths.
    * Race-safe (r15 advisor): the adoption goes through
    * [[TxTable.migrate]]'s FIXED-target version-0 commit, not the
    * rebasing refresh loop — two concurrent first-writers both pass the
    * `exists` check, but only the version-0 winner publishes the legacy
    * contents; the loser discards and lets its caller's own commit
    * rebase on the winner (previously the loser's retry loop could
    * commit the legacy rows OVER the winner's already-merged commit —
    * a lost update). Only the winner clears the loose files. */
  private def migrateLegacy(spark: SparkSession, path: String): Unit = {
    if (TxTable.exists(path)) return
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(path)
    if (fs.exists(target) &&
        fs.listStatus(target).exists(_.getPath.getName.endsWith(".parquet"))) {
      val rows = spark.read.parquet(path)
      if (TxTable.migrate(spark, path, rows)) {
        fs.listStatus(target)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .foreach(s => fs.delete(s.getPath, false))
      }
    }
  }

  /** Key-based MERGE: `incoming` rows replace same-key `existing` rows
    * (last-writer-wins — the batch is the later write), unmatched
    * existing rows survive. This is the incremental alternative to the
    * reference's drop_old=True full refresh (seed_milvus.py:75): at
    * 100 TB you cannot rewrite the collection to update one day's drop.
    * Expressed as anti-join + union so Catalyst keeps both sides
    * columnar: the anti-join's build side is just the incoming KEY
    * column, broadcast when small (`broadcastKeys`, the landing-batch
    * norm — no shuffle of the 100 TB side; flip it off when a backfill
    * batch rivals the base table and AQE should plan the shuffle).
    * `incoming` must carry one row per key (dedupe upstream — a landing
    * batch with two writers for a key has no winner without a version
    * column). */
  def merge(existing: DataFrame, incoming: DataFrame, key: String,
            broadcastKeys: Boolean = true): DataFrame = {
    val keys = incoming.select(col(key))
    val survivors = existing.join(
      if (broadcastKeys) broadcast(keys) else keys, Seq(key), "left_anti")
    incoming.unionByName(survivors)
  }

  /** [[merge]] against a table in place, committed through the
    * [[TxTable]] ordered log (round-15, verdict task 7 — previously a
    * bare delete+rename swap with no version history): every upsert is
    * a version, any prior version stays readable ([[TxTable.read]] time
    * travel), and concurrent writers SERIALIZE by optimistic rebase
    * instead of last-rename-wins (TxTableSpec pins no-lost-update).
    * Creates the table when absent, so the first landing and every
    * later one are the same call — and re-running the same batch is a
    * no-op on the table's row multiset (PipelineSpec). A pre-existing
    * plain-parquet table at `path` is migrated: its current contents
    * become the log's first version before the merge commits. At scale,
    * [[TxTable.mergeUpsertPartitioned]] scopes the rewrite to only the
    * partitions the incoming keys touch. */
  def upsert(spark: SparkSession, path: String, incoming: DataFrame,
             key: String, broadcastKeys: Boolean = true): Unit = {
    migrateLegacy(spark, path)
    TxTable.mergeUpsert(spark, path, incoming, key, broadcastKeys)
  }

  /** Read a table whether TxTable-backed (snapshot read of latest) or a
    * plain parquet prefix — the read surface matching [[upsert]]'s
    * commit surface. */
  def readTable(spark: SparkSession, path: String): DataFrame =
    if (TxTable.exists(path)) TxTable.read(spark, path)
    else spark.read.parquet(path)

  /** Retrieval surface (S13 + A8): embed the query text and return the
    * top-k most similar gold rows. */
  def search(spark: SparkSession, goldPath: String, queryText: String, k: Int,
             dim: Int = VectorDim): DataFrame = {
    // deterministic surrogate id from the persisted pk — NOT
    // monotonically_increasing_id(), which would re-evaluate differently
    // between the top-k pass and the join-back below
    val corpus = readTable(spark, goldPath)
      .select(xxhash64(col("pk")).as("neighbor_id"),
        col("pk"), col("text"), col("vector").as("cv"))
    val q = spark.range(1).select(
      lit(-1L).as("query_id"),
      VectorFunctions.hashEmbedUdf(lit(queryText), lit(dim)).as("qv"))
    // map-side top-k: exact brute force, but only |partitions|·k
    // candidate rows shuffle instead of the whole corpus's cosines
    // (one query against 100 TB must not exchange corpus-sized rows;
    // bit-identical to the window form — SimilaritySpec)
    val hits = Similarity.topKPartitioned(
      spark, q, corpus.select(col("neighbor_id"), col("cv")), k)
    hits.join(corpus, "neighbor_id")
      .select(col("rank"), col("pk"), col("text"), col("cosine"))
      .orderBy(col("rank"))
  }

  /** The scale form of [[search]]: IVF retrieval against k-means-trained
    * centroids, probing `nprobe` partitions per query instead of the full
    * corpus (the Milvus IVF_FLAT index class the reference's collection
    * would use at volume — seed_milvus.py:7-25). Same output shape as
    * [[search]]; recall is governed by (centroids, nprobe), asserted in
    * PipelineSpec on the shared fixture. */
  def searchIvf(spark: SparkSession, goldPath: String, queryText: String, k: Int,
                centroids: Int = 8, nprobe: Int = 2, iters: Int = 3,
                dim: Int = VectorDim): DataFrame = {
    val corpus = readTable(spark, goldPath)
      .select(xxhash64(col("pk")).as("neighbor_id"),
        col("pk"), col("text"), col("vector").as("cv"))
    val cents = Similarity.kmeansCentroids(spark,
      corpus.select(col("neighbor_id"), col("cv")),
      k = centroids, iters = iters, idCol = "neighbor_id", vecCol = "cv")
    val q = spark.range(1).select(
      lit(-1L).as("query_id"),
      VectorFunctions.hashEmbedUdf(lit(queryText), lit(dim)).as("qv"))
    val hits = Similarity.ivfTopK(q,
      corpus.select(col("neighbor_id"), col("cv")), cents, k, nprobe)
    hits.join(corpus, "neighbor_id")
      .select(col("rank"), col("pk"), col("text"), col("cosine"))
      .orderBy(col("rank"))
  }
}
