package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (reference capability A8 — the Milvus vector store's retrieval surface,
  * dags/utils/seed_milvus.py:7-25).
  *
  * Two equivalent implementations of brute-force top-k:
  *  - [[topKWindow]]: declarative — broadcast the query side, NaN-guarded
  *    codegen'd cosine, `row_number` window. Catalyst/codegen
  *    handles everything; the window shuffles |corpus|×|queries| rows.
  *  - [[topKPartitioned]]: the 100 TB path — per-partition bounded heaps
  *    (map-side top-k) reduce the shuffle to |partitions|×|queries|×k
  *    rows before the final window. Equality with topKWindow is asserted
  *    in SimilaritySpec.
  * Both order by (cosine desc, neighbor_id asc) so results are fully
  * deterministic under ties.
  */
object Similarity {

  /** queries: (query_id: Long, qv: Array[Float]); corpus: (neighbor_id,
    * cv). Returns (query_id, neighbor_id, cosine, rank), rank ≤ k.
    * NULL vectors are excluded up front on BOTH sides in BOTH forms —
    * a null embedding is even more degenerate than a zero-norm one
    * (which already ranks -Infinity) and, unfiltered, it would NPE the
    * partitioned kernel while the window form quietly ranked it last;
    * the shared filter keeps the two forms result-identical on any
    * input (SimilaritySpec pins the null case). */
  def topKWindow(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val sims = corpus.filter(col("cv").isNotNull)
      .crossJoin(broadcast(queries.filter(col("qv").isNotNull)))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", guardedSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("long"))
  }

  /** Map-side top-k: each partition keeps a bounded worst-first heap per
    * query, so only |partitions|·|queries|·k candidate rows shuffle. The
    * dot/norm accumulation is sequential IEEE double, identical to the
    * HOF expression in [[topKWindow]].
    *
    * Scale bound: the query side is collected and broadcast — memory is
    * O(|queries|·dim) on driver and executors, NOT corpus-sized. That is
    * the operator's contract (a query batch against a huge corpus, the
    * reference's retrieval shape); for query sets too large to broadcast,
    * use the bucketed pair join (q40's LSH form) instead. */
  def topKPartitioned(spark: SparkSession, queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    val qs: Array[(Long, Array[Float])] = queries
      .filter(col("qv").isNotNull)
      .select(col("query_id"), col("qv")).as[(Long, Array[Float])].collect()
    val qBc = spark.sparkContext.broadcast(qs)

    val partial = corpus.filter(col("cv").isNotNull)
      .select(col("neighbor_id"), col("cv")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qarr = qBc.value
        // hoist the query ids/vectors/norms into flat arrays so the
        // per-pair loop does no tuple destructuring — the loop body is
        // the sequential-double dot alone (the kernel runs n·|Q| times;
        // at the definitional q24 batch that is the whole operator)
        val nq = qarr.length
        val qids = new Array[Long](nq)
        val qvs = new Array[Array[Float]](nq)
        val qnorm = new Array[Double](nq)
        var j = 0
        while (j < nq) {
          qids(j) = qarr(j)._1; qvs(j) = qarr(j)._2
          qnorm(j) = math.sqrt(sumsq(qvs(j))); j += 1
        }
        // per-query bounded heap ordered worst-first
        val heaps = Array.fill(nq)(
          collection.mutable.PriorityQueue.empty[(Double, Long)](
            Ordering.by[(Double, Long), (Double, Long)] { case (c, id) => (-c, id) }))
        for ((nid, cv) <- it) {
          val cn = math.sqrt(sumsq(cv))
          var qi = 0
          while (qi < nq) {
            if (qids(qi) != nid) {
              val raw = dot(qvs(qi), cv) / (qnorm(qi) * cn)
              // same NaN guard as guardedSim: a zero-norm vector must
              // never beat a real candidate in the heap comparison
              val c = if (raw.isNaN) Double.NegativeInfinity else raw
              val h = heaps(qi)
              if (h.size < k) h.enqueue((c, nid))
              else {
                val (wc, wid) = h.head
                if (c > wc || (c == wc && nid < wid)) { h.dequeue(); h.enqueue((c, nid)) }
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (c, nid) => (qids(qi), nid, c) }
        }
      }.toDF("query_id", "neighbor_id", "cosine")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    partial.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("long"))
  }

  /** IVF (inverted-file) approximate top-k: corpus is pre-partitioned by
    * nearest centroid; a query probes its `nprobe` nearest centroids'
    * partitions (the standard ANN recall/cost knob — each +1 adds one
    * more 1/|centroids| corpus slice per query). At 100 TB this turns a
    * full-corpus scan per query into an nprobe/|centroids| partition
    * scan. Recall monotonicity in nprobe is asserted in SimilaritySpec.
    *
    * centroids: (centroid_id: Long, cvec: Array[Float]) — small,
    * broadcast (use [[kmeansCentroids]] to train them). Returns the same
    * shape as [[topKWindow]]. */
  /** Nearest-centroid assignment by a map-side-combinable aggregation:
    * `min(struct(-casim, centroid_id, payload…))` picks the
    * (max-cosine, min-centroid_id) winner per id with PARTIAL
    * aggregation — each input partition emits one packed row per id,
    * instead of the window form's full n×k sort-shuffle. Identical
    * results to the window form (same sim doubles, same tiebreak; the
    * struct order never reaches the payload fields because centroid_id
    * is unique per id) because BOTH forms see the NaN-guarded
    * similarity: cosine of a zero-norm vector (hashEmbed of empty text
    * is all-zeros) is NaN, which Spark orders LARGEST — unguarded, the
    * window form would pick a NaN centroid while min(struct(-sim,…))
    * would skip it. [[guardedSim]] maps NaN → -Infinity so a NaN
    * centroid never beats a real one in either form. Use this for
    * CORPUS-sized sides; the window form stays for small query sides
    * needing top-nprobe. `carry` columns ride along inside the packed
    * struct. */
  def nearestCentroid(df: DataFrame, centroids: DataFrame, vecCol: String,
                      idCol: String, carry: Seq[String] = Nil): DataFrame = {
    val packed = struct(
      (col("casim") * lit(-1.0)).as("neg_sim") +: col("centroid_id").as("cid") +:
        col("casim").as("sim") +: carry.map(col): _*)
    df.crossJoin(broadcast(centroids))
      .withColumn("casim", guardedSim(col(vecCol), col("cvec")))
      .groupBy(col(idCol))
      .agg(min(packed).as("_w"))
      .select(col(idCol) +: col("_w.cid").as("centroid_id") +: col("_w.sim").as("casim") +:
        carry.map(c => col(s"_w.$c").as(c)): _*)
  }

  /** Cosine similarity with NaN (zero-norm input) mapped to -Infinity,
    * so "most similar" rankings never prefer a degenerate vector
    * regardless of whether the ranking is a window sort (NaN sorts
    * first under desc) or a min-struct agg (NaN sorts last). Public so
    * every ranking surface (ivfTopK, the streamed-index search) applies
    * the SAME guard — a divergence here would silently change top-k
    * results between the batch and index paths. */
  def guardedCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    nanvl(graft.plans.GraftExpressions.cosineSimNative(a, b), lit(Double.NegativeInfinity))
  private def guardedSim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    guardedCosine(a, b)

  /** Top-`nprobe` nearest centroids per query (the QUERY side of IVF;
    * the corpus side is [[nearestCentroid]]'s agg-min — queries are a
    * bounded batch, so a window over the k-row cross join is fine).
    * Returns the query rows with `centroid_id` attached, one row per
    * (query, probed centroid). */
  def assignProbes(queries: DataFrame, centroids: DataFrame, nprobe: Int,
                   vecCol: String = "qv", idCol: String = "query_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val w = Window.partitionBy(col(idCol)).orderBy(col("casim").desc, col("centroid_id").asc)
    queries.crossJoin(broadcast(centroids))
      .withColumn("casim", guardedSim(col(vecCol), col("cvec")))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= nprobe)
      .drop("casim", "_rk", "cvec")
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame, k: Int,
              nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    def assign(df: DataFrame, vecCol: String, idCol: String, keep: Int): DataFrame =
      assignProbes(df, centroids, keep, vecCol, idCol)
    // each corpus vector lives in exactly ONE partition (agg-min, scales
    // with partial aggregation); a query probes nprobe of them (window,
    // query side is small), so (query, neighbor) candidates are unique
    val corpusAssigned = nearestCentroid(corpus, centroids, "cv", "neighbor_id", Seq("cv"))
      .drop("casim")
    val queriesAssigned = assign(queries, "qv", "query_id", nprobe)
    // probe: join query to its centroid's corpus partition only
    // guardedSim here too: an unguarded NaN cosine (zero-norm corpus
    // vector) orders largest under desc, ranking the degenerate vector
    // top-1 for every query probing its partition
    val cands = corpusAssigned.join(broadcast(queriesAssigned), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", guardedSim(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("long"))
  }

  /** Spherical k-means centroid training for the IVF family: deterministic
    * Lloyd iterations (no RNG — seeds are the `k` lowest-id vectors,
    * renumbered 0..k-1; ties in assignment break by centroid_id asc).
    *
    * Scale shape: the heavy steps — nearest-centroid assignment
    * (crossJoin against the BROADCAST k×dim centroid table) and the
    * per-dimension mean (posexplode + two-level groupBy, map-side
    * partial aggregation) — are fully distributed; only the k×dim
    * centroid matrix itself is collected per iteration to re-broadcast,
    * which also truncates the iterative lineage (the MLlib pattern). An
    * empty cluster keeps its previous centroid.
    *
    * The per-dimension mean is EXACT and engine-portable: each component
    * is floored to integer micro-units (floor(x·1e6) — floor, not round,
    * because the engines disagree on rounding mode at exact halves),
    * summed in integer arithmetic (associative, so partition order
    * cannot change the result), and divided once as
    * float((sum/count)/1e6) — both divisions correctly-rounded IEEE
    * doubles of identical integers. The trained centroids are therefore
    * BIT-IDENTICAL run-to-run and across Spark/DuckDB, which is what
    * lets q47's full 3-iteration chain be oracle-checked as a DuckDB
    * CTE. Exactness holds while Σ|x|·1e6 per (cluster, dim) < 2^53 —
    * ~9e9 unit-scale rows per cluster, far beyond any real shard.
    *
    * vectors: (idCol: Long, vecCol: Array[Float]). Returns
    * (centroid_id: Long 0..k-1, cvec: Array[Float]).
    *
    * `trainSampleCap` bounds the TRAINING set (not the later corpus
    * assignment) to the `cap` vectors with the smallest
    * (hash60(id), id) — a deterministic, content-independent,
    * engine-replayable sample (the q53/q64 hash idiom; faiss calls the
    * same idea max_points_per_centroid). Full-batch Lloyd is Θ(n·k)
    * per iteration, which with SemDeDup's k ∝ n is Θ(n²) — the sample
    * caps it at Θ(cap·k) ∝ n, restoring a linear end-to-end q68
    * (measured in SCALE.md). When n ≤ cap the sample IS the corpus,
    * so at the oracle gates results are bit-identical to uncapped
    * training; seeds and means are set-semantics over the training
    * set, so the sample's ordering never matters. */
  def kmeansCentroids(spark: SparkSession, vectors: DataFrame, k: Int, iters: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      trainSampleCap: Long = Long.MaxValue): DataFrame = {
    import spark.implicits._
    require(k >= 1 && iters >= 0, s"bad kmeans config ($k,$iters)")
    val sampled = trainSampleCap != Long.MaxValue
    // repartition after the limit: a mid-plan GlobalLimit collapses to
    // ONE partition, which would serialize every downstream assignment
    // join; cache so the top-cap sort runs once, not once per iteration
    val train =
      if (!sampled) vectors
      else vectors.orderBy(
          expr(graft.queries.Idioms.hash60Expr(s"CAST($idCol AS STRING)")).asc,
          col(idCol).asc)
        .limit(trainSampleCap.toInt)
        .repartition(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .cache()
    var cents: Array[(Long, Array[Float])] = train
      .orderBy(col(idCol).asc).limit(k)
      .select(col(idCol), col(vecCol)).as[(Long, Array[Float])].collect()
      .zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    for (_ <- 1 to iters) {
      val cdf = cents.toSeq.toDF("centroid_id", "cvec")
      val assigned = nearestCentroid(
        train.select(col(idCol), col(vecCol)), cdf, vecCol, idCol, Seq(vecCol))
      val means = assigned
        .select(col("centroid_id"), posexplode(col(vecCol)))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(floor(col("col").cast("double") * lit(1000000.0))).as("sm"),
          count(lit(1)).as("cnt"))
        .withColumn("m",
          (col("sm").cast("double") / col("cnt").cast("double") / lit(1000000.0)).cast("float"))
        .groupBy(col("centroid_id"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> x.m)")
          .as("cvec"))
        .as[(Long, Array[Float])].collect().toMap
      cents = cents.map { case (cid, v) => (cid, means.getOrElse(cid, v)) }
    }
    if (sampled) train.unpersist(blocking = false)
    cents.toSeq.toDF("centroid_id", "cvec")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): cluster the corpus with
    * k-means, then mark a vector a duplicate iff some LOWER-id member
    * of ITS OWN cluster sits above the cosine threshold — the paper's
    * keep-one-per-near-dup-group rule with a deterministic keeper
    * (lowest id, the exact-dedup q03 precedent). Returns one row per
    * input vector: (idCol, centroid_id, dup_of) where dup_of is the
    * smallest qualifying lower id, NULL for survivors — survivors are
    * `dup_of IS NULL`, and the keeper attribution is what lets a
    * pipeline audit WHY a document was dropped.
    *
    * Scale shape: the pair join is per-cluster, so cost is
    * O(Σ cluster²) ≈ n²/k for balanced clusters — the SemDeDup paper's
    * sizing rule is k ∝ n (it uses 11k clusters for 100M embeddings),
    * which holds per-cluster occupancy (and with it pair cost per
    * vector) constant, the same occupancy argument as q40's autoBits.
    * Training cost is |train|·k per Lloyd iteration — with k ∝ n and
    * FULL-batch training that is itself Θ(n²) and dominates (SCALE.md
    * measured it 12× the pair join at 100×), which is why the shipped
    * q68 also bounds the training set ([[kmeansCentroids]]
    * trainSampleCap, a no-op at the oracle gates). The per-cluster
    * join shuffles on centroid_id — with k ∝ n keys the shuffle is
    * well-spread (at the gates' k=8 it is 8 partitions, fine at gate
    * sizes).
    *
    * Cosine is the plain (unguarded) expression, like q25: the oracle
    * gate corpus has no zero-norm vectors, and a NaN cosine fails
    * `> thresh` in Spark (a zero-norm vector is never marked dup). */
  def semDedup(vectors: DataFrame, centroids: DataFrame, thresh: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val assigned = nearestCentroid(
      vectors.select(col(idCol), col(vecCol)), centroids, vecCol, idCol, Seq(vecCol))
    val a = assigned.select(col("centroid_id"), col(idCol), col(vecCol).as("va"))
    val b = assigned.select(col("centroid_id").as("_cb"), col(idCol).as("_idb"),
      col(vecCol).as("vb"))
    val dups = a.join(b, col("centroid_id") === col("_cb") && col("_idb") < col(idCol))
      .withColumn("sim", graft.plans.GraftExpressions.cosineSimNative(col("va"), col("vb")))
      .filter(col("sim") > thresh)
      .groupBy(col(idCol)).agg(min(col("_idb")).as("dup_of"))
    assigned.select(col(idCol), col("centroid_id"))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col("centroid_id"), col("dup_of"))
  }

  /** Scalar-quantized (SQ8-style, the Faiss/Milvus storage trick) top-k
    * with exact rescoring: rank ALL candidates by the cosine of the
    * int8-quantized (then dequantized) vectors, keep the top
    * `oversample` per query, rescore ONLY those against the original
    * float vectors, return the exact-rescored top `k`.
    *
    * Why it matters at 100 TB: the first (full-scan) phase reads the
    * 4×-smaller int8 representation — on a storage-bound cluster that
    * is a 4× scan-cost cut — and the exact phase touches only
    * |queries|·oversample full-precision rows. Here both columns ride
    * the same DataFrame for oracle-checkability; a deployment stores
    * the quantized column (+ its scale) in its own parquet and scans
    * the float column only in phase 2.
    *
    * queries: (query_id, qv float[], qdv float[]); corpus:
    * (neighbor_id, cv, cdv) where *dv is the dequantized-quantized
    * vector (see VectorOps.dequantizedCol — floor-based, so both
    * engines derive bit-identical grids). Deterministic under ties on
    * both phases (neighbor_id asc). */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                    oversample: Int): DataFrame = {
    // phase 1 emits SCALARS ONLY (query_id, neighbor_id, approx) into
    // the ranking shuffle — carrying the vectors through the window
    // would put ~1 KB/row through the exchange (corpus×queries rows: a
    // near-TB shuffle at the 100× replica); pruned, the same shuffle
    // moves 24-byte rows. The full-precision vectors are joined back
    // AFTER the shortlist, touching |queries|·oversample rows only.
    // norms precomputed once per side (q25 trick): the pair loop runs
    // the codegen'd dot alone; dot/(qn·cn) is bit-identical to the full
    // cosine (qn = sqrt(sumsq) is the same double either way), and a
    // zero-norm side divides to NaN → nanvl → -Infinity, exactly
    // guardedSim's contract
    val qn = queries.select(col("query_id"), col("qdv"))
      .withColumn("qn", sqrt(expr(graft.functions.VectorFunctions.sumsqExpr("qdv"))))
    val cn = corpus.select(col("neighbor_id"), col("cdv"))
      .withColumn("cn", sqrt(expr(graft.functions.VectorFunctions.sumsqExpr("cdv"))))
    val cands = cn.crossJoin(broadcast(qn))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        nanvl(graft.plans.GraftExpressions.dotNative(col("qdv"), col("cdv"))
          / (col("qn") * col("cn")), lit(Double.NegativeInfinity)).as("approx"))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("neighbor_id").asc)
    val shortlist = cands.withColumn("_ar", row_number().over(w1))
      .filter(col("_ar") <= oversample)
      .select(col("query_id"), col("neighbor_id"))
    // rescore: tiny shortlist broadcasts against the corpus to fetch
    // cv; qv rides the (always-small) query batch
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    corpus.select(col("neighbor_id"), col("cv"))
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .join(broadcast(queries.select(col("query_id"), col("qv"))), Seq("query_id"))
      .withColumn("cosine", guardedSim(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank").cast("long"))
  }

  /** Sequential left-to-right double dot product — bit-identical to the
    * `aggregate(zip_with(...))` HOF and DuckDB's list_sum/list_transform. */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def sumsq(a: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    s
  }
}
