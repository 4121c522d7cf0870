package graft

import graft.queries.{StageMemo, VectorOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The staged-pipeline memo contract: build-once-read-many with values
  * identical to the live computation, a content-fingerprinted key so an
  * in-place table rewrite regenerates, and hit/miss accounting on the
  * shared bench counters (what makes a stage build visible in
  * `reps_raw` instead of silently vanishing from the measurement). */
class StageMemoSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("materialize builds once, serves identical rows on every later call") {
    import spark.implicits._
    StageMemo.clear()
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v") }
    val first = StageMemo.materialize(spark, "spec-key-1", "spec")(build)
      .collect().map(_.toSeq).toSet
    val second = StageMemo.materialize(spark, "spec-key-1", "spec")(build)
      .collect().map(_.toSeq).toSet
    assert(builds == 1, "second call must read the materialization, not rebuild")
    assert(first == Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    assert(second == first)
  }

  test("clear() forgets the path and a new key rebuilds") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq(1L).toDF("id") }
    StageMemo.materialize(spark, "spec-key-2", "spec")(build)
    StageMemo.clear()
    StageMemo.materialize(spark, "spec-key-2", "spec")(build)
    assert(builds == 2, "clear() must force a rebuild")
  }

  test("stampedKey changes when a table file is rewritten in place") {
    val dir = java.nio.file.Files.createTempDirectory("stagememo-fp-").toString
    val sub = new java.io.File(s"$dir/documents.parquet"); sub.mkdirs()
    val f = new java.io.File(sub, "part-00000.snappy.parquet")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    val k1 = VectorOps.stampedKey(dir, "documents")
    // same path, different size => different fingerprint (mtime
    // granularity can be 1s on some filesystems, so change the SIZE)
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3, 4))
    val k2 = VectorOps.stampedKey(dir, "documents")
    assert(k1 != k2, "in-place rewrite must change the stage key")
  }

  test("hits/misses land on the shared bench counters") {
    import spark.implicits._
    StageMemo.clear()
    val h0 = VectorOps.memoHits.get(); val m0 = VectorOps.memoMisses.get()
    StageMemo.materialize(spark, "spec-key-3", "spec")(Seq(1L).toDF("id"))
    StageMemo.materialize(spark, "spec-key-3", "spec")(Seq(1L).toDF("id"))
    assert(VectorOps.memoMisses.get() == m0 + 1)
    assert(VectorOps.memoHits.get() == h0 + 1)
  }

  test("the dedup stage consumers agree with the live computation") {
    // q59/q83 read materialized pairs+clusters; assert against a
    // freshly-computed live q51 labeling on the gate corpus that the
    // staged cluster ids are the identical mapping.
    StageMemo.clear()
    val dir = "/root/testdata/sf0.001"
    val staged = SparkEntry.queries("q51_neardup_clusters")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val livePairs = SparkEntry.queries("q48_neardup_pipeline")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val live = graft.operators.Components.connectedComponents(livePairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(staged == live)
  }
}
