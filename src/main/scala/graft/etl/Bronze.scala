package graft.etl

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze layer — ingest (reference dags/bronze.py + dags/utils/crawl_web.py).
  *
  * The reference crawls sequentially on one Celery worker; here every step
  * is a relational transform so ingest parallelizes over executors:
  *  - link hygiene filter = higher-order array filter (crawl_web.py:90-94)
  *  - content dedup = sha2 + dropDuplicates (bronze.py:66-70, A1)
  *  - visited-set = left_anti join (crawl_web.py:119-122, J1)
  *  - frontier expansion = explode + anti-join loop (J2) — each BFS round
  *    is one distributed job, not a Python recursion
  *  - landing = date-partitioned append (bronze.py:91, S9)
  * The HTTP fetch itself is an IO edge (S10) injected as `fetchPage` so
  * tests run offline (zero-egress), matching SURVEY §7.4 risk 3.
  */
object Bronze {

  /** Drop mailto:/tel:/fragment links and resolve relative hrefs against
    * the page URL (crawl_web.py:90-94 + urljoin at :91). */
  def cleanLinks(df: DataFrame, urlCol: String = "url", linksCol: String = "links"): DataFrame =
    df.withColumn(linksCol,
      transform(
        filter(col(linksCol), l =>
          !(l.startsWith("mailto:") || l.startsWith("tel:") || l.startsWith("#"))),
        l => TextFunctions.urljoinUdf(col(urlCol), l)))

  /** Content-hash dedup, keeping the first URL per identical payload
    * (bronze.py:66-70): 256-bit key shuffles uniformly at any scale. */
  def dedupByContent(df: DataFrame, contentCol: String = "page_content"): DataFrame =
    df.withColumn("content_hash", sha2(col(contentCol), 256))
      .dropDuplicates("content_hash")

  /** One BFS round of the crawl frontier (crawl_web.py:144-158): expand
    * links of newly-fetched pages, minus everything already visited.
    * `visited` stays small relative to the corpus → broadcast-able; at
    * extreme scale Catalyst/AQE picks shuffle-hash instead. */
  def expandFrontier(pages: DataFrame, visited: DataFrame): DataFrame =
    pages.select(explode(col("links")).as("url"))
      .distinct()
      .join(visited, Seq("url"), "left_anti")

  /** Full BFS crawl to `depth` (crawl_web.py:103-160 recursion as an
    * iterative driver loop of distributed jobs). `fetchPage` maps a URL
    * batch to (url, page_content, metadata, links) — injected IO edge.
    *
    * Every round's `pages` / `frontier` / `visited` is persisted and
    * materialized before the next round reads it: without that, each
    * round's action re-evaluates the full lineage of all prior rounds —
    * O(depth²) re-invocations of `fetchPage`, and with a real non-
    * idempotent HTTP fetch the visited set could diverge mid-crawl
    * (reference fetches each URL once, crawl_web.py:114-122). The
    * returned frame unions the cached round batches, so downstream
    * actions re-read cache, not the network; land it promptly. */
  def crawl(spark: SparkSession, roots: DataFrame, depth: Int,
            fetchPage: DataFrame => DataFrame): DataFrame = {
    var visited = roots.select(col("url")).persist()
    var frontier = visited
    var acc: DataFrame = null
    var d = 0
    while (d <= depth && frontier.count() > 0) {
      val pages = cleanLinks(fetchPage(frontier)).persist()
      pages.count() // materialize: fetchPage runs exactly once per URL
      acc = if (acc == null) pages else acc.unionByName(pages)
      val next = expandFrontier(pages, visited).persist()
      next.count()
      val grown = visited.union(next).distinct().persist()
      grown.count()
      if (frontier ne visited) frontier.unpersist()
      visited.unpersist()
      visited = grown
      frontier = next
      d += 1
    }
    if (frontier ne visited) frontier.unpersist()
    visited.unpersist()
    // empty crawl: derive the page schema from fetchPage on an empty
    // frontier so callers see the same columns as a non-empty crawl
    if (acc == null)
      dedupByContent(cleanLinks(fetchPage(roots.select(col("url")).limit(0))))
    else dedupByContent(acc)
  }

  /** Bounded-cache crawl for long-lived sessions: like [[crawl]], but
    * each BFS round's page batch is LANDED to `path` as soon as it is
    * fetched — into a (crawl_date, crawl_round) partition via dynamic
    * overwrite, so a re-run of the same day+round is idempotent and
    * never clobbers other rounds — and then its cache is released. Where
    * [[crawl]]'s returned union pins every round's pages in executor
    * cache until session end (O(total crawl)), here cache peaks at ONE
    * round's pages + the visited set. Dedup is per-round (the visited
    * set already prevents refetching a URL; cross-URL duplicate content
    * across rounds is deduped downstream, e.g. `dedupByContent` at read).
    * Returns the number of landed pages.
    *
    * The frontier/visited sets are EAGER `localCheckpoint`s, not
    * persists: a lineage-carrying cached frontier gets invalidated when
    * the round that produced it is unpersisted, silently re-invoking
    * `fetchPage` on replay (observed: +2 duplicate fetches on a 4-page
    * crawl with the persist form). Checkpointing truncates the lineage
    * to the materialized blocks — O(|URLs|), reclaimed by the context
    * cleaner — so releasing a round's page cache can never re-fetch. */
  def crawlAndLand(spark: SparkSession, roots: DataFrame, depth: Int,
                   fetchPage: DataFrame => DataFrame, path: String): Long = {
    // ONE crawl = ONE crawl_date, captured on the driver before the loop:
    // evaluating current_date() inside each round's write would scatter a
    // midnight-crossing crawl across two date partitions, and a same-day
    // re-run would then never overwrite the pre-midnight rounds (breaking
    // the idempotency contract above).
    val crawlDate = utcToday()
    var visited = roots.select(col("url")).localCheckpoint()
    var frontier = visited
    var total = 0L
    var d = 0
    while (d <= depth && frontier.count() > 0) {
      val pages = cleanLinks(fetchPage(frontier)).persist()
      pages.count() // materialize: fetchPage runs exactly once per URL
      val batch = dedupByContent(pages)
        .withColumn("crawl_date", lit(crawlDate))
        .withColumn("crawl_round", lit(d))
      batch.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("crawl_date", "crawl_round").parquet(path)
      total += batch.count() // reads the round cache, not the network
      val next = expandFrontier(pages, visited).localCheckpoint()
      val grown = visited.union(next).distinct().localCheckpoint()
      pages.unpersist() // landed + lineage truncated: safe to release
      visited = grown
      frontier = next
      d += 1
    }
    total
  }

  /** The single source of the landing partition date: driver-side UTC.
    * Both landing paths ([[crawlAndLand]] and [[land]]) MUST use this —
    * `current_date()` is session-timezone-dependent, so mixing it with a
    * UTC stamp can put the same wall-clock write into two different
    * `crawl_date` partitions, and `read(path, date)` callers would miss
    * data across the two. */
  private[etl] def utcToday(): String =
    java.time.LocalDate.now(java.time.ZoneOffset.UTC).toString

  /** Date-partitioned landing write (bronze.py:53,91): dynamic partition
    * overwrite — re-running a day replaces exactly that day's partition
    * and leaves the rest of history untouched, matching the reference's
    * idempotent per-key bronze writes (bronze.py:91) (§2.8). Stamps the
    * same driver-side UTC date as [[crawlAndLand]] (see [[utcToday]]). */
  def land(df: DataFrame, path: String): Unit =
    df.withColumn("crawl_date", lit(utcToday()))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("crawl_date").parquet(path)

  /** Read the bronze table (all dates or one date partition — partition
    * pruning makes the single-date read O(day), not O(history)). */
  def read(spark: SparkSession, path: String, date: Option[String] = None): DataFrame = {
    val df = spark.read.parquet(path)
    date.fold(df)(dt => df.filter(col("crawl_date") === dt))
  }
}
