package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** SCALE.md evidence runner for the LSH sizing claim: times
  * `VectorOps.lshNearDupPairs` at a given bit width on a given scale
  * directory (median of 3, same protocol as Bench) and reports the
  * candidate-pair recall against the exact verifier computed over the
  * `vec_id < 2000` audit slice (q25's bound — the slice is the identity
  * replica in ScaleGen output, so exact ground truth is available at
  * any replication factor).
  *
  * Usage: ScaleProbe <sfDir> [bits|auto|auto2|knn|decontam|semdedup|bm25|ivfindex|lshprofile|txskipmerge|gsource|...] [tables|k|commits]
  * `auto` (the default) sizes bits from the corpus count exactly like
  * the shipped q40 — the no-manual-resizing path. `auto2` is the same
  * width with two-sided probing (`lshNearDupPairs(..., twoSided)`), the
  * recall/cost knob SCALE.md tables against the one-sided default. `knn` instead times
  * the DEPLOYMENT shape of brute kNN — a FIXED 40-query batch
  * (`vec_id < 2000 && vec_id % 50 = 0`, the identity replica, so the
  * batch is the same vectors at every scale factor) against the whole
  * corpus via `Similarity.topKPartitioned` — the evidence that q24's
  * quadratic growth in the bench is its batch *definition* (batch ∝
  * corpus there), not the operator: at a fixed batch the cost is linear
  * in corpus.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    // third arg is mode-dependent (tables | k | commit count); parse it
    // as an Option so each mode applies its OWN default — overloading a
    // default VALUE as the absent sentinel made an explicit request for
    // that value silently mean "default" (r16 advisor)
    val (sfDir, bitsArg, thirdArg) = args match {
      case Array(d) => (d, "auto", None)
      case Array(d, b) => (d, b, None)
      case Array(d, b, t) => (d, b, Some(t.toInt))
    }
    val tables = thirdArg.getOrElse(graft.queries.VectorOps.LshTables)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (bitsArg == "knn") {
      val e = Tables(spark, sfDir, "embeddings")
      val n = e.count()
      val q = e.filter(col("vec_id") < 2000 && col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      def topk = graft.operators.Similarity.topKPartitioned(spark, q,
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")), 5)
      val nq = q.count() // the actual batch, not an assumed 40
      topk.count() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        topk.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"knn_fixed_batch","sf":"$sfDir","corpus":$n,"queries":$nq,"median_sec":${times(1)}%.3f}""")
      spark.stop()
      return
    }

    // `pca` times q98's corpus pass — the single-pass two-level moment
    // aggregation (BIGINT bucket partials, decimal only across buckets).
    // Fixed d, linear in corpus rows; the driver-side eigeniteration is
    // O(d²) and scale-free, so this IS q98's whole scale exposure.
    if (bitsArg == "pca") {
      val e = Tables(spark, sfDir, "embeddings")
      val n = e.count()
      def mom = graft.queries.VectorOps.pcaMomentsOf(e)
      mom.count() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mom.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"pca_moments","sf":"$sfDir","corpus":$n,"median_sec":${times(1)}%.3f}""")
      spark.stop()
      return
    }

    // `pq` times q102's DEPLOYMENT shape — a FIXED query batch (the
    // identity replica's vec_id < 2000 && % 50 = 0, same queries at
    // every scale) scored by ADC against the full corpus code table.
    // q102's gate-definition queries grow with the corpus (q24's
    // class → n·q candidate rows); at a fixed batch the scan is
    // linear in corpus, which is what this measures. Training is NOT
    // in the timed section (a deployment scores against standing
    // codebooks).
    if (bitsArg == "pq") {
      // The q102 deployment shape, built from the SAME pqCodebooks /
      // pqSubvectors / pqEncode helpers and Q25Cap the query itself uses
      // — the probe cannot drift from the query it times.
      import graft.queries.VectorOps._
      import graft.functions.VectorFunctions
      import org.apache.spark.sql.expressions.Window
      val e = Tables(spark, sfDir, "embeddings")
      val n = e.count()
      val cents = pqCodebooks(spark, e, "embedding").cache()
      val qtab = pqSubvectors(
          e.filter(col("vec_id") < Q25Cap && col("vec_id") % 50 === 0)
            .select(col("vec_id").as("query_id"), col("embedding")),
          "query_id", "embedding")
        .join(broadcast(cents), Seq("sub"))
        .withColumn("t", expr(
          s"CAST(FLOOR((${VectorFunctions.dotExpr("sv", "cvec")}) * 1000000.0) AS BIGINT)"))
        .select(col("query_id"), col("sub"), col("code"), col("t")).cache()
      val nq = qtab.select(col("query_id")).distinct().count()
      def topk = pqEncode(pqSubvectors(e, "vec_id", "embedding"), cents, Seq("vec_id"))
        .join(broadcast(qtab), Seq("sub", "code"))
        .filter(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id")).agg(sum(col("t")).as("adc_micro"))
        .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("adc_micro").desc, col("vec_id").asc)))
        .filter(col("rank") <= 5)
      topk.count() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        topk.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"pq_fixed_batch","sf":"$sfDir","corpus":$n,"queries":$nq,"median_sec":${times(1)}%.3f}""")
      spark.stop()
      return
    }

    // `decontam` times q71's DEPLOYMENT shape — a FIXED benchmark set
    // (vec_id < 2000 && % 20 = 0: the identity replica, so the same
    // vectors at every scale factor) against the full train split — the
    // evidence that q71's growth in the x-replica gate is its bench
    // *definition* (bench ∝ n there), not the operator: at a fixed
    // benchmark the cost is linear in corpus.
    if (bitsArg == "decontam") {
      val e = Tables(spark, sfDir, "embeddings")
        .withColumn("nrm", sqrt(expr(graft.functions.VectorFunctions.sumsqExpr("embedding"))))
      val n = e.count()
      val bench = e.filter(col("vec_id") < 2000 && col("vec_id") % 20 === 0)
        .select(col("vec_id").as("bench_id"), col("embedding").as("bv"), col("nrm").as("nb"))
      val train = e.filter(col("vec_id") % 20 =!= 0)
        .select(col("vec_id"), col("embedding"), col("nrm").as("na"))
      val nb = bench.count()
      def flags = graft.queries.VectorOps.semanticDecontaminate(train, bench, 0.4)
      val flagged = flags.count() // warmup + stat
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        flags.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"decontam_fixed_bench","sf":"$sfDir","corpus":$n,"bench":$nb,"median_sec":${times(1)}%.3f,"flagged":$flagged}""")
      spark.stop()
      return
    }

    // `sketch` times the two round-12 mergeable sketches at replica
    // scale — the SCALE.md evidence for the bounded-state claim: the
    // KMV aggregation (deployment shape: sketch only, one exchange of
    // ≤k-long buffers per group-partition) and the CMS cell build
    // (map-side combined into ≤ d·w cells) both scan the corpus
    // linearly, but the STATE (groups·k longs; ≤4096 cells) and the
    // shuffle payload stay fixed however large the corpus — the numbers
    // that make them the 100 TB substitutes for exact distinct / exact
    // gram counts.
    if (bitsArg == "sketch") {
      import graft.queries.TrainingOps
      import graft.streaming.SketchStream
      val docs = Tables(spark, sfDir, "documents")
      val n = docs.count()
      val kmv = udaf(graft.functions.KmvSketchAggregator(TrainingOps.KmvK))
      def kmvSketch = SketchStream.tokenHashes(docs)
        .groupBy(col("lang"), col("source")).agg(kmv(col("h")).as("sketch"))
      val groups = kmvSketch.count() // warmup + stat
      val sketchLongs = kmvSketch
        .agg(sum(size(col("sketch")))).head.getLong(0)
      val kmvT = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); kmvSketch.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      def cells = SketchStream.batchCells(docs)
      val nCells = cells.count() // warmup + stat
      val cmsT = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); cells.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"sketch","sf":"$sfDir","corpus":$n,"groups":$groups,"kmv_state_longs":$sketchLongs,"cms_cells":$nCells,"kmv_median_sec":${kmvT(1)}%.3f,"cms_median_sec":${cmsT(1)}%.3f}""")
      spark.stop()
      return
    }

    // `bloombuild` times ONLY q73's Bloom bit-array assembly — the
    // distributed build (bench n-grams → k probe positions → block-
    // indexed bit_or → driver collect of m/64 words) — across replica
    // scales. The SCALE.md evidence that the build is flat-per-element
    // with driver footprint bounded by m/64 words (= the broadcast
    // payload), after round 10's position-collect was replaced.
    if (bitsArg == "bloombuild") {
      import graft.queries.TrainingOps
      val bench = TrainingOps.benchGramHashes(spark, sfDir).cache()
      val nGrams = bench.count() // materialize + stat
      val m = TrainingOps.BloomBitsPerElem * nGrams
      def build = TrainingOps.bloomBitArray(bench, m)
      val warm = build // warmup: JIT + codegen
      val nzWords = warm.count(_ != 0L)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        build
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val perElemUs = times(1) / nGrams * 1e6
      println(f"""{"probe":"bloombuild","sf":"$sfDir","bench_ngrams":$nGrams,"m_bits":$m,"driver_words":${(m + 63) / 64},"nonzero_words":$nzWords,"median_sec":${times(1)}%.3f,"us_per_elem":$perElemUs%.3f}""")
      spark.stop()
      return
    }

    // `bloomshard` exercises the BEYOND-broadcast design point for q73:
    // the bit array as a DataFrame of (blk, w) words co-partition-joined
    // against the probe positions, instead of an m/64-word broadcast.
    // Evidence reported: per-task word footprint (max words in any
    // shard × 8 B — scales as m/(64·P), so the 1 B-n-gram / 10 Gbit
    // point is ~1.3 MB/task at P=1000 where the broadcast needs 1.25 GB
    // on EVERY executor) and candidate-set equality with the broadcast
    // path on the same corpus.
    if (bitsArg == "bloomshard") {
      import graft.queries.TrainingOps
      val bench = TrainingOps.benchGramHashes(spark, sfDir).cache()
      val nGrams = bench.count()
      val m = TrainingOps.BloomBitsPerElem * nGrams
      val words = TrainingOps.bloomWordTable(bench, m)
        .repartition(col("blk")).cache()
      val nWords = words.count()
      // the per-task memory bound: the fullest shard's word count
      val maxShard = words.groupBy(spark_partition_id().as("pid"))
        .count().agg(max(col("count"))).first().getLong(0)
      val train = TrainingOps.trainGramHashes(spark, sfDir).cache()
      train.count()
      def sharded = TrainingOps.bloomProbeSharded(train, words, m)
      val cand = sharded.count() // warmup + stat
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        sharded.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      // ground truth: the broadcast path's bloomHit on the same probes
      val bits = TrainingOps.bloomBitArray(bench, m)
      val posE = (j: Int) => TrainingOps.bloomPosExpr(m, j)
      val hit = (0 until TrainingOps.BloomK).map { j =>
        expr(s"(shiftright(element_at(bs, CAST((${posE(j)}) DIV 64 AS INT) + 1), " +
          s"CAST((${posE(j)}) % 64 AS INT)) & 1) = 1")
      }.reduce(_ && _)
      val bcast = train.select(col("id"), col("h")).distinct()
        .withColumn("bs", typedLit(bits.toSeq)).filter(hit).drop("bs")
      val diff = sharded.exceptAll(bcast).count() + bcast.exceptAll(sharded).count()
      println(f"""{"probe":"bloomshard","sf":"$sfDir","bench_ngrams":$nGrams,"m_bits":$m,"words":$nWords,"max_words_per_task":$maxShard,"task_bytes":${maxShard * 8},"candidates":$cand,"median_sec":${times(1)}%.3f,"matches_broadcast":${diff == 0L}}""")
      spark.stop()
      return
    }

    // `bm25` times q75's DEPLOYMENT shape — a FIXED query batch (the
    // identity replica's doc_id % 250 docs, the same queries at every
    // scale factor) against the whole corpus: the evidence that q75's
    // growth in the replica bench is its query-set definition (queries
    // ∝ corpus there), not the operator.
    if (bitsArg == "bm25") {
      val n = Tables(spark, sfDir, "documents").count()
      def ranked = graft.queries.VectorOps.bm25Ranked(spark, sfDir, 5,
        queryCap = 10000000L)
      val rows = ranked.count() // warmup + stat
      val nq = rows / 5
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ranked.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"bm25_fixed_batch","sf":"$sfDir","corpus":$n,"queries":$nq,"median_sec":${times(1)}%.3f}""")
      spark.stop()
      return
    }

    // `ivfindex` times the STANDING-INDEX retrieval shape against the
    // recompute-everything shape, same fixed 40-query batch as `knn`
    // (identity replica, so the same queries at every scale factor):
    // (a) one-time index build (corpus assignment + centroid_id-
    // partitioned write), (b) EmbeddingsStream.searchIndex — probe
    // nprobe centroids per query, scan ONLY those partitions via
    // dynamic partition pruning, (c) Similarity.ivfTopK — re-assigns
    // the whole corpus per run (what a no-index deployment pays per
    // query batch). The evidence for SCALE.md: (b) is bounded by the
    // probed partitions' bytes, (c) by the corpus.
    if (bitsArg == "ivfindex") {
      import graft.operators.Similarity
      import graft.streaming.EmbeddingsStream
      // a deployment ANALYZEs its tables; without stats the planner's
      // benefit estimate declines DPP at probe scale
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val e = Tables(spark, sfDir, "embeddings")
      val n = e.count()
      val cents = e.filter(col("vec_id") < 64)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cvec")).cache()
      cents.count()
      val idxDir = s"/tmp/graft_ivfindex_$n"
      val tb = System.nanoTime()
      Similarity.nearestCentroid(
          e.select(col("vec_id"), col("embedding")), cents, "embedding", "vec_id",
          Seq("embedding"))
        .select(col("centroid_id"), col("vec_id"), col("casim"), col("embedding"))
        .write.mode("overwrite").partitionBy("centroid_id").parquet(idxDir)
      val buildSec = (System.nanoTime() - tb) / 1e9
      val q = e.filter(col("vec_id") < 2000 && col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv")).cache()
      val nq = q.count()
      def viaIndex = EmbeddingsStream.searchIndex(spark, idxDir, q, cents, k = 5, nprobe = 2)
      def viaFull = Similarity.ivfTopK(q,
        e.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv")),
        cents, k = 5, nprobe = 2)
      viaIndex.count(); viaFull.count() // warmup
      def med(f: => Long): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      val idxSec = med(viaIndex.count())
      val fullSec = med(viaFull.count())
      println(f"""{"probe":"ivfindex","sf":"$sfDir","corpus":$n,"queries":$nq,"build_sec":$buildSec%.3f,"index_search_sec":$idxSec%.3f,"full_ivf_sec":$fullSec%.3f}""")
      spark.stop()
      return
    }

    // `textindex` — the standing-inverted-index twin of `ivfindex`:
    // (a) one-time postings build (term-bucket-partitioned write),
    // (b) TextIndexStream.search — DPP-pruned bucket scan + shared
    // integer BM25 stage, (c) VectorOps.bm25Ranked — the batch path that
    // rebuilds postings from raw text per run. Fixed query set (identity
    // replica doc_ids, the q75 contract), so growth is pure corpus.
    if (bitsArg == "textindex") {
      import graft.streaming.TextIndexStream
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val docs = Tables(spark, sfDir, "documents")
      val n = docs.count()
      val idxDir = s"/tmp/graft_textindex_$n"
      val tb = System.nanoTime()
      val posts = TextIndexStream.postingsOf(docs)
      posts.write.mode("overwrite").partitionBy("bucket").parquet(s"$idxDir/postings")
      posts.groupBy(col("doc_id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
        .write.mode("overwrite").parquet(s"$idxDir/stats")
      val buildSec = (System.nanoTime() - tb) / 1e9
      // identity-replica query batch: same queries at every scale factor
      val queries = docs.filter(col("doc_id") % 250 === 0 && col("doc_id") < 5000)
        .select(col("doc_id").as("query_id"), col("text")).cache()
      val nq = queries.count()
      def viaIndex = TextIndexStream.search(spark, idxDir, queries, k = 5)
      def viaBatch = graft.queries.VectorOps.bm25Ranked(spark, sfDir, 5, queryCap = 5000L)
      viaIndex.count(); viaBatch.count() // warmup
      def med(f: => Long): Double = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      val idxSec = med(viaIndex.count())
      val fullSec = med(viaBatch.count())
      // a SINGLE query probes <= 8 of 64 buckets — the pruning-dominated
      // shape (the 20-query batch's ~160 distinct terms touch nearly
      // every bucket, so its win is build-amortization, not pruning)
      val q1 = queries.filter(col("query_id") === 0).cache(); q1.count()
      def viaIndexOne = TextIndexStream.search(spark, idxDir, q1, k = 5)
      viaIndexOne.count() // warmup
      val oneSec = med(viaIndexOne.count())
      println(f"""{"probe":"textindex","sf":"$sfDir","corpus":$n,"queries":$nq,"build_sec":$buildSec%.3f,"index_search_sec":$idxSec%.3f,"one_query_sec":$oneSec%.3f,"full_bm25_sec":$fullSec%.3f}""")
      spark.stop()
      return
    }

    // `semdedup [k]` times q68's full train+dedup pipeline; second arg is
    // an explicit cluster count or omitted for the shipped autoK(n) —
    // the SCALE.md evidence that the per-cluster pair join needs k ∝ n
    if (bitsArg == "semdedup") {
      val e = Tables(spark, sfDir, "embeddings")
      val n = e.count()
      val k = thirdArg.getOrElse(graft.queries.VectorOps.autoK(n))
      def run = {
        val semCap = graft.queries.VectorOps.SemTrainCap
        val cap = if (n > semCap) semCap else Long.MaxValue
        val cents = graft.operators.Similarity.kmeansCentroids(spark, e, k, iters = 3,
          trainSampleCap = cap)
        graft.operators.Similarity.semDedup(e, cents, 0.45)
      }
      val dups = run.filter(col("dup_of").isNotNull).count() // warmup + stat
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        run.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"""{"probe":"semdedup","sf":"$sfDir","corpus":$n,"k":$k,"median_sec":${times(1)}%.3f,"dups":$dups}""")
      spark.stop()
      return
    }

    // `ndupindex` measures the standing near-dup index's deployment
    // claim: once the band index stands, an arriving ~1% drop costs the
    // PROBE (DPP-pruned band join + within-batch pairs + append), not
    // the full-corpus candidate recompute a batch-only pipeline pays
    // per run — the textindex probe's argument applied to dedup
    if (bitsArg == "ndupindex") {
      import java.nio.file.Files
      val docs = Tables(spark, sfDir, "documents")
      val n = docs.count()
      val src = Files.createTempDirectory("ndup-src").toString
      val dup = Files.createTempDirectory("ndup-idx").toString + "/dup"
      val ckpt = Files.createTempDirectory("ndup-ckpt").toString
      val probe = docs.filter(col("doc_id") % 97 === 0)
      val nb = probe.count()
      docs.filter(col("doc_id") % 97 =!= 0).write.mode("append").parquet(src)
      val t0 = System.nanoTime()
      graft.streaming.NearDupStream.ingest(spark, src, dup, ckpt)
      val buildSec = (System.nanoTime() - t0) / 1e9
      probe.write.mode("append").parquet(src)
      val t1 = System.nanoTime()
      graft.streaming.NearDupStream.ingest(spark, src, dup, ckpt)
      val probeSec = (System.nanoTime() - t1) / 1e9
      val matches = graft.streaming.NearDupStream.matches(spark, dup).count()
      val sig = graft.queries.TextOps.minhashSig(
        docs.withColumn("arr",
            graft.plans.GraftExpressions.distinctShingles(col("text"), 3))
          .select(col("doc_id"), explode(col("arr")).as("s")))
      val t2 = System.nanoTime()
      val fullCand = graft.queries.TextOps.lshCandidatePairs(sig, 8).count()
      val fullSec = (System.nanoTime() - t2) / 1e9
      println(f"""{"probe":"ndupindex","sf":"$sfDir","corpus":$n,"drop":$nb,"build_sec":$buildSec%.3f,"drop_probe_sec":$probeSec%.3f,"full_recompute_sec":$fullSec%.3f,"matches":$matches,"full_candidates":$fullCand}""")
      spark.stop()
      return
    }

    // `spanstride` charts q78's recall/cost knob: the strided span
    // detector at stride 4 (shipped) / 2 / 1 (full positional recall) —
    // span rows grow as 1/stride, duplicate detections monotonically
    // include the coarser stride's
    // txmerge: the partition-scoped-commit claim measured. Builds a
    // TxTable of the documents corpus partitioned by lang, then commits
    // a SMALL fixed batch (the identity-replica slice doc_id < 200 —
    // same batch at every scale factor) twice: once through the
    // whole-table merge path and once through the partition-scoped
    // path. At any corpus scale the scoped commit's rewrite is bounded
    // by the touched partitions' size, while the whole-table merge
    // rewrites everything — the gap IS the claim in TxTable.scala's
    // class doc, as a measured trend instead of an assertion.
    if (bitsArg == "txmerge") {
      import graft.etl.TxTable
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val n = docs.count()
      // the realistic incremental-load shape: a small batch landing in
      // ONE partition (first lang alphabetically — deterministic at any
      // replica factor); identity-replica slice so the batch is the
      // same docs at every scale
      val oneLang = docs.filter(col("doc_id") < 2000)
        .agg(min(col("lang"))).head.getString(0)
      val batch = docs.filter(col("doc_id") < 200 && col("lang") === oneLang)
        .withColumn("text", concat(col("text"), lit(" [updated]")))
      val nb = batch.count()
      val langs = batch.select(col("lang")).distinct().count()
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // bytes the merge COMMIT physically wrote = size of the latest
      // version's dirs that the previous version did not reference —
      // the claim under measurement is "untouched partitions move zero
      // bytes", which is a property of written volume, not wall time
      // (at probe scale the write is action-overhead-dominated)
      def wroteBytes(root: String): Long = {
        val latest = TxTable.latestVersion(root)
        val prev = TxTable.snapshot(root, latest - 1).dirs.toSet
        TxTable.snapshot(root, latest).dirs.filterNot(prev).map { d =>
          val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, d))
          try s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
          finally s.close()
        }.sum
      }
      val base = java.nio.file.Files.createTempDirectory("graft-txprobe").toString
      // scoped path: partitioned seed commit, then the scoped merge
      val scopedRoot = s"$base/scoped"
      TxTable.mergeUpsertPartitioned(spark, scopedRoot, docs, "doc_id", "lang")
      val tScoped = timed {
        TxTable.mergeUpsertPartitioned(spark, scopedRoot, batch, "doc_id", "lang")
      }
      val bScoped = wroteBytes(scopedRoot)
      // whole-table path: same seed data, unpartitioned history
      val wholeRoot = s"$base/whole"
      TxTable.refresh(spark, wholeRoot, docs)
      val tWhole = timed { TxTable.mergeUpsert(spark, wholeRoot, batch, "doc_id") }
      val bWhole = wroteBytes(wholeRoot)
      // the scoped commit's latest version must carry the union content
      val after = TxTable.read(spark, scopedRoot).count()
      println(f"""{"probe":"txmerge","sf":"$sfDir","corpus":$n,"batch":$nb,"touched_langs":$langs,"scoped_merge_sec":$tScoped%.3f,"whole_merge_sec":$tWhole%.3f,"scoped_wrote_bytes":$bScoped,"whole_wrote_bytes":$bWhole,"rows_after":$after}""")
      spark.stop()
      return
    }

    // txskip: the data-skipping claim measured (round-16 TxTable stats
    // + clustered compact). Builds a TxTable of the documents corpus,
    // range-clusters it on doc_id into ~32 dirs with exact per-dir
    // stats, then times a FIXED narrow scan (doc_id < 200 — the
    // identity-replica slice, same rows at any scale factor) through
    // the stats-pruned path vs the full filter. At any corpus scale the
    // pruned scan reads O(range) dirs; the unpruned filter reads the
    // table.
    if (bitsArg == "txskip") {
      import graft.etl.TxTable
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val n = docs.count()
      val root = java.nio.file.Files.createTempDirectory("graft-txskip").toString + "/t"
      TxTable.refresh(spark, root, docs)
      def dirBytes(rel: String): Long = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, rel))
        try s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => java.nio.file.Files.size(p)).sum
        finally s.close()
      }
      val total = TxTable.snapshot(root).dirs.map(dirBytes).sum
      val cv = TxTable.compact(spark, root,
        targetBytes = math.max(1L, total / 32), clusterBy = Seq("doc_id"))
      val dirs = TxTable.snapshot(root, cv).dirs.length
      val (kept, dropped) = TxTable.pruneDirs(root, "doc_id", 0, 199)
      def med3(f: => Long): (Double, Long) = {
        val r = f // warmup + row check
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.sorted
        (ts(1), r)
      }
      val (tPruned, rows) = med3(TxTable.scan(spark, root, "doc_id", 0, 199).count())
      val (tFull, rowsFull) = med3(TxTable.read(spark, root)
        .filter(col("doc_id").between(0, 199)).count())
      require(rows == rowsFull, s"pruned scan row drift: $rows vs $rowsFull")
      println(f"""{"probe":"txskip","sf":"$sfDir","corpus":$n,"dirs":$dirs,"kept_dirs":${kept.length},"pruned_dirs":$dropped,"rows":$rows,"pruned_scan_sec":$tPruned%.3f,"full_filter_sec":$tFull%.3f}""")
      spark.stop()
      return
    }

    // txskipmerge: the round-17 every-commit-stats claim measured — a
    // STANDING table built purely through ingest commits (refresh +
    // appends, stats declared once, NEVER compacted), then the same
    // fixed narrow scan as `txskip` through the stats-pruned path vs
    // the full filter. Before round 17 every one of these dirs was
    // unstatted (only clustered compact wrote stats), so the pruned
    // scan would have read the whole table; now each ingest batch's
    // dir carries its own min/max and the scan reads O(range) dirs.
    if (bitsArg == "txskipmerge") {
      import graft.etl.TxTable
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val n = docs.count()
      val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
      val nBatches = 32
      val span = maxId / nBatches + 1
      val root = java.nio.file.Files.createTempDirectory("graft-txskipm").toString + "/t"
      // ingest-shaped history: batch i covers doc_id [i*span, (i+1)*span)
      // — the range-correlated arrival every time-ordered pipeline has
      TxTable.refresh(spark, root, docs.filter(col("doc_id") < span))
      TxTable.setStatsColumns(spark, root, Seq("doc_id"))
      (1 until nBatches).foreach { i =>
        TxTable.append(spark, root, docs.filter(
          col("doc_id") >= i * span && col("doc_id") < (i + 1) * span))
      }
      val dirs = TxTable.snapshot(root).dirs.length
      val (kept, dropped) = TxTable.pruneDirs(root, "doc_id", 0, 199)
      def med3(f: => Long): (Double, Long) = {
        val r = f
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.sorted
        (ts(1), r)
      }
      val (tPruned, rows) = med3(TxTable.scan(spark, root, "doc_id", 0, 199).count())
      val (tFull, rowsFull) = med3(TxTable.read(spark, root)
        .filter(col("doc_id").between(0, 199)).count())
      require(rows == rowsFull, s"pruned scan row drift: $rows vs $rowsFull")
      println(f"""{"probe":"txskipmerge","sf":"$sfDir","corpus":$n,"dirs":$dirs,"kept_dirs":${kept.length},"pruned_dirs":$dropped,"rows":$rows,"pruned_scan_sec":$tPruned%.3f,"full_filter_sec":$tFull%.3f}""")
      spark.stop()
      return
    }

    // gsource: the round-17 format("graft") connector measured — the
    // same ingest-shaped never-compacted table as txskipmerge, read
    // back through `spark.read.format("graft")` with plain WHERE
    // clauses. What's measured is the full automatic path: Catalyst
    // pushes the predicates into buildScan, the connector translates
    // them to ranges, and the manifest-level skip happens with no
    // explicit scan API. Three shapes: a numeric range, a string
    // equality (per-batch lang labels → DirStrStat pruning), and the
    // unpruned full filter as the control.
    if (bitsArg == "gsource") {
      import graft.etl.TxTable
      import graft.sources.GraftTableSource
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val n = docs.count()
      val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
      val nBatches = 32
      val span = maxId / nBatches + 1
      val root = java.nio.file.Files.createTempDirectory("graft-gsource").toString + "/t"
      def batch(i: Int) = docs.filter(
        col("doc_id") >= i * span && col("doc_id") < (i + 1) * span)
        .withColumn("src", format_string("ingest-%02d", lit(i)))
        .withColumn("sha", sha2(col("text"), 256))
      TxTable.refresh(spark, root, batch(0))
      TxTable.setStatsColumns(spark, root, Seq("doc_id", "src"))
      // the content hash is the range-unprunable key shape: every dir's
      // string min/max spans the whole hex space — only a bloom prunes it
      TxTable.setBloomColumns(spark, root, Seq("sha"))
      (1 until nBatches).foreach(i => TxTable.append(spark, root, batch(i)))
      val t = spark.read.format("graft").load(root)
      // probe the max-id doc: guaranteed present (replica id spaces are
      // sparse, so a mid-range batch can be empty at some scales)
      val probeSha = docs.filter(col("doc_id") === maxId)
        .select(sha2(col("text"), 256)).head.getString(0)
      def med3(f: => Long): (Double, Long) = {
        val r = f
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }.sorted
        (ts(1), r)
      }
      val (tRange, rowsRange) = med3(t.where(col("doc_id").between(0, 199)).count())
      val keptRange = GraftTableSource.lastKeptDirs.get
      val (tEq, rowsEq) = med3(t.where(col("src") === "ingest-07").count())
      val keptEq = GraftTableSource.lastKeptDirs.get
      val (tSha, rowsSha) = med3(t.where(col("sha") === probeSha).count())
      val keptSha = GraftTableSource.lastKeptDirs.get
      val (tFull, rowsFull) = med3(TxTable.read(spark, root)
        .filter(col("doc_id").between(0, 199)).count())
      require(rowsRange == rowsFull, s"connector row drift: $rowsRange vs $rowsFull")
      require(rowsSha >= 1, "bloom lookup lost a present key")
      // FULL-table scan through the connector vs the identical direct
      // parquet read (r17 verdict: the DSv1 RDD[Row] boundary made this
      // the connector's one structural cost; the DSv2 delegated
      // ParquetScan should price them the same). sum(length(text))
      // forces real column materialization — a bare count() would be
      // answered from parquet metadata on both sides.
      def fullAgg(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(length(col("text")))).head.getLong(0)
      val (tConnFull, aggConn) = med3(fullAgg(t))
      val dirPaths = TxTable.snapshot(root).dirs.map(d => s"$root/$d")
      val (tParqFull, aggParq) = med3(fullAgg(spark.read.parquet(dirPaths: _*)))
      require(aggConn == aggParq, s"full-scan agg drift: $aggConn vs $aggParq")
      println(f"""{"probe":"gsource","sf":"$sfDir","corpus":$n,"dirs":$nBatches,"range_kept":$keptRange,"range_rows":$rowsRange,"range_sec":$tRange%.3f,"streq_kept":$keptEq,"streq_rows":$rowsEq,"streq_sec":$tEq%.3f,"bloom_kept":$keptSha,"bloom_rows":$rowsSha,"bloom_sec":$tSha%.3f,"full_filter_sec":$tFull%.3f,"fullscan_connector_sec":$tConnFull%.3f,"fullscan_parquet_sec":$tParqFull%.3f}""")
      spark.stop()
      return
    }

    // gdpp: runtime (join-driven) dir pruning UNDER CONCURRENT WRITERS
    // (round-19 verdict task 6) — a standing DPP-joined pipeline reads
    // a 32-dir ingest table while an append writer commits between
    // reps. Three invariants measured, not asserted-only: (1) a PINNED
    // frame's DPP join returns byte-stable counts across every racing
    // commit (the runtime filter() re-prunes against the pinned
    // snapshot's immutable dir list); (2) the prune stays engaged
    // (kept ≪ dirs) on every rep; (3) a FRESH load per rep sees each
    // commit's rows, at flat per-rep cost (the O(1) hinted log
    // discovery + one-dir prune delta, not an O(commits) reread).
    // stagedur: the DURABLE StageMemo cross-JVM contract, for real —
    // run this twice with the same SPARK_GRAFT_STAGE_ROOT: the first
    // JVM builds and commits the stage table; the second (a genuinely
    // fresh process, not a clear() simulation) must read the committed
    // stage WITHOUT running the build. Emits built:true/false + rows.
    if (bitsArg == "stagedur") {
      val stageRoot = sys.env.getOrElse("SPARK_GRAFT_STAGE_ROOT",
        sys.error("set SPARK_GRAFT_STAGE_ROOT"))
      spark.conf.set(graft.queries.StageMemo.StageRootConf, stageRoot)
      var built = false
      val t0 = System.nanoTime()
      val df = graft.queries.StageMemo.materialize(spark,
        s"${graft.queries.VectorOps.stampedKey(sfDir, "documents")}#stagedur",
        "sdur") {
        built = true
        Tables(spark, sfDir, "documents")
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      }
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"stagedur","sf":"$sfDir","built":$built,"rows":$rows,"sec":$sec%.3f}""")
      spark.stop()
      return
    }

    // shpairs: the q21/q96 shared shingle-pair stage BUILD cost in
    // isolation — cold (first computation in the JVM) and warm
    // (second), to adjudicate how much of the staged build's first-rep
    // cost is JVM/page-cache warmup vs real compute.
    if (bitsArg == "shpairs") {
      def one(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = graft.queries.TextOps.shinglePairAgg(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (cold, n1) = one()
      val (warm, n2) = one()
      require(n1 == n2)
      println(f"""{"probe":"shpairs","sf":"$sfDir","rows":$n1,"cold_sec":$cold%.2f,"warm_sec":$warm%.2f}""")
      spark.stop()
      return
    }

    if (bitsArg == "gdpp") {
      import graft.etl.TxTable
      import graft.sources.GraftTableSource
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val n = docs.count()
      val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
      val nBatches = 32
      val span = maxId / nBatches + 1
      val root = java.nio.file.Files.createTempDirectory("graft-gdpp").toString + "/t"
      def batch(i: Int) = docs.filter(
        col("doc_id") >= i * span && col("doc_id") < (i + 1) * span)
      TxTable.refresh(spark, root, batch(0))
      TxTable.setStatsColumns(spark, root, Seq("doc_id"))
      (1 until nBatches).foreach(i => TxTable.append(spark, root, batch(i)))
      // dim side: a REAL parquet scan with a selective predicate (a
      // folded LocalRelation makes Spark correctly decline DPP), whose
      // selected keys all land in ONE fact dir (batch 7's id range)
      val dimPath = java.nio.file.Files.createTempDirectory("graft-gdpp-dim").toString + "/dim"
      docs.select(col("doc_id"), (col("doc_id") / span).cast("long").as("grp"))
        .write.parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("grp") === 7L).select("doc_id")
      val pinned = spark.read.format("graft").load(root)
        .join(org.apache.spark.sql.functions.broadcast(dim), "doc_id")
      val pinnedBase = pinned.count()
      val reps = 8
      val pinnedTimes = Array.ofDim[Double](reps)
      val freshTimes = Array.ofDim[Double](reps)
      val freshCounts = Array.ofDim[Long](reps)
      var keptMax = 0
      (0 until reps).foreach { r =>
        // racing writer: a commit duplicating 50 rows of the joined key
        // range lands BEFORE this rep's reads
        TxTable.append(spark, root, batch(7).limit(50))
        val t0 = System.nanoTime()
        val c = pinned.count()
        pinnedTimes(r) = (System.nanoTime() - t0) / 1e9
        require(c == pinnedBase,
          s"pinned DPP count drifted under writers: $c vs $pinnedBase at rep $r")
        keptMax = math.max(keptMax, GraftTableSource.lastKeptDirs.get)
        val t1 = System.nanoTime()
        freshCounts(r) = spark.read.format("graft").load(root)
          .join(org.apache.spark.sql.functions.broadcast(dim), "doc_id").count()
        freshTimes(r) = (System.nanoTime() - t1) / 1e9
      }
      // fresh loads saw every commit: counts strictly increasing
      require(freshCounts.toSeq == freshCounts.toSeq.sorted &&
        freshCounts.distinct.length == reps,
        s"fresh loads missed commits: ${freshCounts.toSeq}")
      val pm = pinnedTimes.sorted.apply(reps / 2)
      val fm = freshTimes.sorted.apply(reps / 2)
      println(f"""{"probe":"gdpp","sf":"$sfDir","corpus":$n,"dirs":$nBatches,"reps":$reps,"pinned_rows":$pinnedBase,"pinned_med_sec":$pm%.3f,"fresh_med_sec":$fm%.3f,"fresh_first_sec":${freshTimes(0)}%.3f,"fresh_last_sec":${freshTimes(reps - 1)}%.3f,"kept_max":$keptMax,"fresh_rows_last":${freshCounts(reps - 1)}}""")
      spark.stop()
      return
    }

    // gstream: the streaming table→table pair measured — table A is the
    // corpus as an append-only TxTable, tailed into table B through
    // `readStream.format("graft")` → `writeStream.format("graft")`
    // (checkpointed offsets, idempotent sink commits). Two numbers:
    // the BOOTSTRAP (full-history replay, ∝ corpus — paid once per
    // stream), and the INCREMENTAL per-batch wall for a FIXED 200-row
    // batch appended to A while the stream runs — the standing cost,
    // which must stay FLAT as the accumulated corpus grows (O(new
    // dirs) per batch on both edges: hinted O(1) log discovery, one
    // manifest diff, one batch write).
    if (bitsArg == "gstream") {
      import graft.etl.TxTable
      val docs = Tables(spark, sfDir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val n = docs.count()
      val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
      val nBatches = 8
      val span = maxId / nBatches + 1
      val base = java.nio.file.Files.createTempDirectory("graft-gstream").toString
      val a = s"$base/a"; val b = s"$base/b"; val ckpt = s"$base/ckpt"
      TxTable.refresh(spark, a, docs.filter(col("doc_id") < span))
      (1 until nBatches).foreach(i => TxTable.append(spark, a, docs.filter(
        col("doc_id") >= i * span && col("doc_id") < (i + 1) * span)))
      val q = spark.readStream.format("graft").load(a)
        .writeStream.format("graft")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start(b)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val bootstrapSec = (System.nanoTime() - t0) / 1e9
      val inc = docs.limit(200).cache()
      val incRows = inc.count()
      val times = (1 to 5).map { _ =>
        TxTable.append(spark, a, inc)
        val t1 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - t1) / 1e9
      }.sorted
      q.stop()
      inc.unpersist()
      val aRows = TxTable.read(spark, a).count()
      val bRows = TxTable.read(spark, b).count()
      require(aRows == bRows, s"stream lost rows: A=$aRows B=$bRows")
      require(bRows == n + 5 * incRows, "unexpected row accounting")
      println(f"""{"probe":"gstream","sf":"$sfDir","corpus":$n,"bootstrap_sec":$bootstrapSec%.3f,"incr_batch_rows":$incRows,"incr_median_sec":${times(2)}%.3f,"rows_exact":$bRows}""")
      spark.stop()
      return
    }

    // lshprofile: q40's ×100 cost split (r16 verdict task 5) — time the
    // CANDIDATE stage (key explode + hot-bucket blacklist + band join +
    // pair distinct) separately from the EXACT-CONFIRM stage (two
    // embedding joins + cosine filter, timed from materialized
    // candidates), plus the blacklist volume, so tuning targets the
    // half that actually dominates. Single rep per stage: the split
    // RATIO is the deliverable and a q40 run at ×100 is ~5 min.
    if (bitsArg == "lshprofile") {
      import graft.queries.VectorOps
      val e = Tables(spark, sfDir, "embeddings")
      val n = e.count()
      val bits = VectorOps.autoBits(n)
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      // blacklist volume (same expressions the candidate stage uses)
      val idx = e.select(col("vec_id"),
          posexplode(graft.plans.GraftExpressions.lshKeys(
            col("embedding"), tables, bits, VectorOps.LshMult)))
        .select(col("vec_id"), col("pos").as("tbl"), col("col").as("k"))
      val (idxRows, _) = timed(idx.count())
      val (hotBuckets, _) = timed(idx.groupBy(col("tbl"), col("k"))
        .agg(count(lit(1)).as("occ"))
        .filter(col("occ") > VectorOps.LshBucketCap).count())
      val cand = VectorOps.lshCandidatesVec(e, tables, bits)
      val (nCand, candSec) = timed(cand.count())
      val cached = cand.cache()
      cached.count() // materialize outside the confirm timing
      val (nPairs, confirmSec) = timed(
        VectorOps.lshConfirm(e, cached, 0.45).count())
      // r18: the SQ8 pre-filter's cut, measured on the same cached
      // candidate set — survivors = confirm-stage input after the
      // lossless upper-bound filter, then the filtered confirm's cost
      val (nSurv, prefilterSec) = timed(
        VectorOps.sq8Prefilter(e, cached, 0.45).count())
      val surv = VectorOps.sq8Prefilter(e, cached, 0.45).cache()
      surv.count()
      val (nPairsF, confirmFSec) = timed(
        VectorOps.lshConfirm(e, surv, 0.45).count())
      surv.unpersist()
      cached.unpersist()
      val (_, fullSec) = timed(
        VectorOps.lshNearDupPairs(e, tables, bits, 0.45).count())
      // prefiltered end-to-end uses the FUSED candidate filter (blob
      // carried on the bucket-join sides, filter before the distinct)
      val (nPairsFused, fullPreSec) = timed(
        VectorOps.lshNearDupPairs(e, tables, bits, 0.45, prefilter = true).count())
      require(nPairsF == nPairs,
        s"LOSSLESS VIOLATION: prefiltered confirm found $nPairsF pairs vs $nPairs")
      require(nPairsFused == nPairs,
        s"LOSSLESS VIOLATION: fused prefilter found $nPairsFused pairs vs $nPairs")
      println(f"""{"probe":"lshprofile","sf":"$sfDir","corpus":$n,"bits":$bits,"tables":$tables,"idx_rows":$idxRows,"hot_buckets":$hotBuckets,"candidates":$nCand,"pairs":$nPairs,"survivors":$nSurv,"candidate_sec":$candSec%.3f,"confirm_sec":$confirmSec%.3f,"prefilter_sec":$prefilterSec%.3f,"confirm_filtered_sec":$confirmFSec%.3f,"end_to_end_sec":$fullSec%.3f,"end_to_end_prefiltered_sec":$fullPreSec%.3f}""")
      spark.stop()
      return
    }

    // txlog: the O(1)-log-discovery claim measured (round-16 TxTable
    // `_latest.hint`). Builds an N-commit log (manifests only — the
    // discovery cost under test is independent of data volume), then
    // times latest-snapshot resolution (a) hinted — the shipped path —
    // and (b) hintless, deleting the hint before every resolve so each
    // one pays the legacy full-directory-listing fallback. This is the
    // cost a standing CDC pipeline pays on EVERY read and EVERY
    // optimistic-loop iteration after months of one-commit-per-micro-
    // batch operation; the counters prove the hinted path never lists.
    // Third arg = commit count (default 1000).
    if (bitsArg == "txlog") {
      import graft.etl.TxTable
      val n = thirdArg.getOrElse(1000)
      val root = java.nio.file.Files.createTempDirectory("graft-txlog").toString + "/t"
      (0 until n).foreach(v =>
        require(TxTable.tryCommit(root, v, "append", Seq(s"data/v$v"))))
      val reps = 200
      def timeResolves(dropHint: Boolean): Double = {
        val hintPath = java.nio.file.Paths.get(root, "_txlog", "_latest.hint")
        var acc = 0L
        var i = 0
        while (i < reps) {
          if (dropHint) java.nio.file.Files.deleteIfExists(hintPath)
          val t0 = System.nanoTime()
          require(TxTable.snapshot(root).version == n - 1)
          acc += System.nanoTime() - t0
          i += 1
        }
        acc / 1e6 / reps // ms per resolve
      }
      timeResolves(dropHint = false) // warmup (page cache, JIT)
      TxTable.resetCounters()
      val hintedMs = timeResolves(dropHint = false)
      val (hLists, hProbes, hReads) = (TxTable.fullListings.get,
        TxTable.manifestProbes.get, TxTable.manifestReads.get)
      TxTable.resetCounters()
      val unhintedMs = timeResolves(dropHint = true)
      val uLists = TxTable.fullListings.get
      println(f"""{"probe":"txlog","commits":$n,"resolves":$reps,"hinted_ms":$hintedMs%.4f,"hintless_ms":$unhintedMs%.4f,"speedup":${unhintedMs / hintedMs}%.1f,"hinted_full_listings":$hLists,"hinted_probes_per_resolve":${hProbes.toDouble / reps}%.1f,"hinted_reads_per_resolve":${hReads.toDouble / reps}%.1f,"hintless_full_listings":$uLists}""")
      spark.stop()
      return
    }

    // txmanifest: per-commit + per-resolve cost vs TABLE DIR COUNT
    // (r17 verdict task 2). Every manifest is a full snapshot — render,
    // parse, and the commit-time vacuum-guard dir touch are all
    // O(dirs) — so a commit on a 100k-dir table pays 100k-entry string
    // work per commit and per resolve. This probe builds an n-dir table
    // (real empty dirs, so the mtime-touch loop runs for real), then
    // times (a) the raw manifest write, (b) snapshot resolution
    // (read + regex parse), (c) a REAL append commit on top — the cost
    // a standing ingest pipeline pays per micro-batch at that dir
    // count. Third arg = dir count (default sweeps 1k/10k/100k).
    if (bitsArg == "txmanifest") {
      import graft.etl.TxTable
      val sizes = thirdArg.map(Seq(_)).getOrElse(Seq(1000, 10000, 100000))
      sizes.foreach { n =>
        val root = java.nio.file.Files.createTempDirectory("graft-txmanifest").toString + "/t"
        val dirs = (0 until n).map(i => f"data/v0-$i%08x")
        dirs.foreach(d => java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(root, d)))
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
        }
        val (_, commitSec) = timed(
          require(TxTable.tryCommit(root, 0L, "refresh", dirs)))
        val mBytes = java.nio.file.Files.size(
          java.nio.file.Paths.get(root, "_txlog", "v00000000.json"))
        // resolve COLD (cache dropped each round: full read + linear
        // parse) and WARM (immutable-manifest cache hit)
        val colds = (0 until 5).map { _ =>
          TxTable.clearResolutionCaches()
          timed(require(TxTable.snapshot(root).dirs.length == n))._2
        }.sorted
        val coldSec = colds(2)
        val warms = (0 until 5).map(_ => timed(
          require(TxTable.snapshot(root).dirs.length == n))._2).sorted
        val warmSec = warms(2)
        // a real append commit on the n-dir table: parse + schema gate +
        // tiny parquet write + O(n) vacuum-guard touch + O(n) render
        import spark.implicits._
        val batch = (0L until 10L).toDF("k")
        val (_, appendSec) = timed(TxTable.append(spark, root, batch))
        // prune resolution cost at n dirs (stats absent -> all kept):
        // the read-side manifest overhead a connector scan pays
        val snap = TxTable.snapshot(root)
        val (_, pruneSec) = timed(
          TxTable.pruneSnapshot(root, snap, Map("k" -> (0.0, 1.0)), Map.empty, Map.empty))
        println(f"""{"probe":"txmanifest","dirs":$n,"manifest_bytes":$mBytes,"commit_render_sec":$commitSec%.4f,"resolve_cold_sec":$coldSec%.4f,"resolve_warm_sec":$warmSec%.5f,"append_commit_sec":$appendSec%.3f,"prune_resolve_sec":$pruneSec%.4f}""")
        // drop the tree to keep /tmp bounded at 100k dirs
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(root).getParent)
        try walk.iterator().asScala.toSeq.reverse.foreach(p =>
          java.nio.file.Files.deleteIfExists(p))
        finally walk.close()
      }
      spark.stop()
      return
    }

    if (bitsArg == "spanstride") {
      val docs = Tables(spark, sfDir, "documents")
      val n = docs.count()
      for (stride <- Seq(4, 2, 1)) {
        def run = graft.queries.TrainingOps.overlapSpanDetect(docs, stride)
        val agg = run.agg(sum(col("n_spans")), sum(col("n_dup_spans")),
          count(org.apache.spark.sql.functions.when(col("n_dup_spans") > 0, 1)))
          .head()
        val (spans, dups, flagged) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          run.count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"""{"probe":"spanstride","sf":"$sfDir","docs":$n,"stride":$stride,"span_rows":$spans,"dup_spans":$dups,"docs_flagged":$flagged,"median_sec":${times(1)}%.3f}""")
      }
      spark.stop()
      return
    }

    // `auto2` = auto-sized width with TWO-SIDED probing (either endpoint's
    // probe set may contain the other's key) — the recall-vs-cost twin of
    // the shipped one-sided default
    val twoSided = bitsArg == "auto2"
    val bits =
      if (bitsArg == "auto" || twoSided)
        graft.queries.VectorOps.autoBits(Tables(spark, sfDir, "embeddings").count())
      else bitsArg.toInt

    def pairs = graft.queries.VectorOps.lshNearDupPairs(
      Tables(spark, sfDir, "embeddings"), tables, bits, 0.45, twoSided)

    pairs.count() // warmup: JIT + codegen before timing
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      pairs.count()
      (System.nanoTime() - t0) / 1e9
    }.sorted

    // recall on the exact-ground-truth slice
    val slice = pairs.filter(col("id_a") < 2000 && col("id_b") < 2000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.queries.VectorOps.queries("q25_embedding_neardup")(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (exact.isEmpty) 1.0 else (exact & slice).size.toDouble / exact.size

    println(f"""{"probe":"lsh_neardup","sf":"$sfDir","bits":$bits,"tables":$tables,"two_sided":$twoSided,"median_sec":${times(1)}%.3f,"pairs_slice":${slice.size},"exact_slice":${exact.size},"recall":$recall%.3f}""")
    spark.stop()
  }
}
