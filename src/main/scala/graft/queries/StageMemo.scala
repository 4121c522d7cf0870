package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Path-valued memo for pipeline STAGE outputs (the kmeans/PQ/eigen
  * train-once precedent applied to intermediate TABLES): a stage's
  * output is computed once per upstream-table contents, materialized as
  * parquet in a process-scoped temp dir, and every consumer reads the
  * materialization — exactly what a production pipeline does between
  * stages (at deployment the materialization is a TxTable commit).
  *
  * Unlike the trained-artifact memos the stage outputs are ∝ corpus
  * (near-dup pairs, cluster labelings, inverted-index postings), so
  * they are NEVER collected: the memo holds only the PATH (plus
  * optional stage scalars). Keys must embed a content fingerprint of
  * the upstream table ([[VectorOps.stampedKey]]) so an in-place rewrite
  * regenerates. Values are the exact rows the per-invocation
  * computation produced (all stage builders are deterministic), so
  * every oracle row is unchanged by construction; hits/misses land on
  * the shared bench counters, making the first consuming rep's stage
  * build visible in `reps_raw`. Same single-threaded harness contract
  * as [[graft.TempCaches]].
  */
object StageMemo {
  private val paths = scala.collection.concurrent.TrieMap[String, String]()

  // ONE static cleanup hook over every temp dir ever created (a hook
  // per materialization would accumulate an unbounded thread list in a
  // long session that rewrites tables, and a build failure would leak
  // its hook); dirs whose build failed hold nothing but still get swept.
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    tempDirs.forEach(rm(_))
  }))

  /** Build-once-read-many: materialize `build`'s output under a temp
    * dir keyed by `key`, then (and on every later call) return a
    * parquet read of it. The temp dirs are removed on JVM exit. */
  def materialize(s: SparkSession, key: String, tag: String)
                 (build: => DataFrame): DataFrame =
    s.read.parquet(materializePath(s, key, tag)(build))

  /** As [[materialize]] but returns the path — for stages whose
    * consumers key derived artifacts (scalars, sub-stages) on it: the
    * path is unique PER MATERIALIZATION, so anything keyed by it can
    * never outlive a rebuild (unlike the logical key, which survives
    * [[clear]] and fingerprint collisions). */
  def materializePath(s: SparkSession, key: String, tag: String)
                     (build: => DataFrame): String =
    VectorOps.memoGet(paths, key) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-stage-$tag-")
      tempDirs.add(dir.toFile)
      build.write.mode("overwrite").parquet(dir.toString)
      dir.toString
    }

  /** Test hook: forget every materialized path (a spec that mutates an
    * upstream table in place must rebuild; the temp dirs themselves are
    * removed by the shutdown hook). */
  private[graft] def clear(): Unit = paths.clear()
}
