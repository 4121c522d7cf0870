package graft

import graft.etl.TxTable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The Delta-class commit log (round-13 verdict stretch item 7):
  * versioned manifests + optimistic concurrency + time travel. The
  * headline assertions are the verdict's own "done" criteria:
  * two concurrent upserts lose neither writer's rows, and version N-1
  * stays readable after N commits.
  */
class TxTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-tx").toString + "/table"

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def rowsOf(root: String, version: Long = -1L): Set[(Long, String)] =
    TxTable.read(spark, root, version).collect()
      .map(r => (r.getLong(r.fieldIndex("k")), r.getString(r.fieldIndex("v")))).toSet

  test("refresh/append/merge commit monotonically increasing versions") {
    val root = tmp()
    assert(!TxTable.exists(root))
    assert(TxTable.refresh(spark, root, df(1L -> "a", 2L -> "b")) == 0)
    assert(TxTable.append(spark, root, df(3L -> "c")) == 1)
    assert(TxTable.mergeUpsert(spark, root, df(2L -> "B2", 4L -> "d"), "k") == 2)
    assert(TxTable.latestVersion(root) == 2)
    assert(rowsOf(root) == Set(1L -> "a", 2L -> "B2", 3L -> "c", 4L -> "d"))
  }

  test("time travel: every prior version reads back exactly as committed") {
    val root = tmp()
    TxTable.refresh(spark, root, df(1L -> "a"))
    TxTable.append(spark, root, df(2L -> "b"))
    TxTable.mergeUpsert(spark, root, df(1L -> "A2"), "k")
    assert(rowsOf(root, 0) == Set(1L -> "a"))
    assert(rowsOf(root, 1) == Set(1L -> "a", 2L -> "b"))
    assert(rowsOf(root, 2) == Set(1L -> "A2", 2L -> "b"))
    assert(rowsOf(root) == rowsOf(root, 2))
  }

  test("optimistic concurrency: the claim admits exactly one writer per version") {
    val root = tmp()
    TxTable.refresh(spark, root, df(1L -> "a"))
    // two writers race for version 1 — exactly one tryCommit wins
    val d1 = "data/v1-x"; val d2 = "data/v1-y"
    df(9L -> "x").write.parquet(s"$root/$d1")
    df(8L -> "y").write.parquet(s"$root/$d2")
    val r1 = TxTable.tryCommit(root, 1, "append", Seq("data/v0-keep", d1))
    val r2 = TxTable.tryCommit(root, 1, "append", Seq("data/v0-keep", d2))
    assert(r1 != r2, "both writers claimed the same version")
  }

  test("concurrent upserts from a shared base: no lost update (the rebase path)") {
    val root = tmp()
    TxTable.refresh(spark, root, df(1L -> "a", 2L -> "b"))
    // two threads upsert DIFFERENT keys concurrently through the public
    // API; whichever loses the version race must rebase on the winner
    // and re-apply, so the final table carries BOTH writers' rows
    val t1 = new Thread(() => TxTable.mergeUpsert(spark, root, df(1L -> "A", 3L -> "c"), "k"))
    val t2 = new Thread(() => TxTable.mergeUpsert(spark, root, df(2L -> "B", 4L -> "d"), "k"))
    t1.start(); t2.start(); t1.join(60000); t2.join(60000)
    assert(TxTable.latestVersion(root) == 2, "both upserts must commit (as v1 and v2)")
    assert(rowsOf(root) == Set(1L -> "A", 2L -> "B", 3L -> "c", 4L -> "d"),
      s"lost update: ${rowsOf(root)}")
  }

  test("uncommitted data dirs are invisible to readers (crash window 1)") {
    val root = tmp()
    TxTable.refresh(spark, root, df(1L -> "a"))
    // simulate a writer that crashed after writing data, before commit
    df(99L -> "orphan").write.parquet(s"$root/data/v1-orphan")
    assert(rowsOf(root) == Set(1L -> "a"))
    assert(TxTable.latestVersion(root) == 0)
  }

  test("a crashed writer's temp manifest is invisible; the version stays available (crash window 2)") {
    val root = tmp()
    TxTable.refresh(spark, root, df(1L -> "a"))
    // simulate a writer that crashed between temp-write and the atomic
    // link publish: the leftover .tmp-* is ignored by version resolution
    // and does NOT burn the version — publish is single-step atomic, so
    // there is no claimed-but-unreadable window in this protocol
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_txlog", "v1.json.tmp-deadbeef"),
      """{"version":1,"action":"append","dirs":["data/ghost"]}""")
    assert(TxTable.latestVersion(root) == 0)
    assert(rowsOf(root) == Set(1L -> "a"))
    val v = TxTable.append(spark, root, df(2L -> "b"))
    assert(v == 1 && rowsOf(root) == Set(1L -> "a", 2L -> "b"))
  }

  test("vacuum drops pre-horizon versions but keeps everything from the horizon") {
    val root = tmp()
    TxTable.refresh(spark, root, df(1L -> "a"))
    TxTable.mergeUpsert(spark, root, df(1L -> "A2"), "k")
    TxTable.mergeUpsert(spark, root, df(1L -> "A3"), "k")
    TxTable.vacuum(root, keepFrom = 1)
    assert(rowsOf(root, 1) == Set(1L -> "A2"))
    assert(rowsOf(root, 2) == Set(1L -> "A3"))
    intercept[IllegalArgumentException] { TxTable.snapshot(root, 0) }
  }
}
