package graft

import graft.etl.TxTable
import graft.sources.GraftTableSource
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The name-based SQL surface ([[graft.sources.GraftCatalog]]): a
  * SQL-only user must be able to create, load, query, time-travel, and
  * administer graft tables with zero Scala calls and zero paths —
  * the round-19 verdict's Delta-parity gap. */
class GraftCatalogSpec extends AnyFunSuite {

  private val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft-catalog-wh-").toString

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    // catalogs instantiate lazily on first reference, so runtime conf
    // is enough — and it proves config-only registration (no builder
    // code path needed)
    s.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s.conf.set("spark.sql.catalog.graft.root", warehouse)
    s
  }

  private def sql(q: String) = spark.sql(q)

  test("pure-SQL lifecycle: create, insert, select, time travel, drop — no Scala, no paths") {
    sql("CREATE NAMESPACE graft.db")
    sql("CREATE TABLE graft.db.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES('statsColumns'='k')")
    // the created table is a real TxTable with the schema recorded as
    // a v0 create commit, skipping columns declared
    val root = s"$warehouse/db/t"
    assert(TxTable.exists(root))
    assert(TxTable.snapshot(root, 0L).action == "create")
    assert(TxTable.snapshot(root, 0L).statsCols == Seq("k"))
    // empty table reads as zero rows with the declared schema
    assert(sql("SELECT * FROM graft.db.t").count() == 0)
    assert(sql("SELECT * FROM graft.db.t").schema.fieldNames.toSeq == Seq("k", "v"))

    sql("INSERT INTO graft.db.t VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graft.db.t VALUES (3, 'c')")
    assert(sql("SELECT * FROM graft.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"))

    // VERSION AS OF: v0 = create (empty), v1 = first insert
    assert(sql("SELECT * FROM graft.db.t VERSION AS OF 0").count() == 0)
    assert(sql("SELECT * FROM graft.db.t VERSION AS OF 1").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))

    // TIMESTAMP AS OF: v1's commit time resolves to v1 (not v2)
    val t1 = new java.sql.Timestamp(TxTable.commitTimeMs(root, 1L))
    assert(sql(s"SELECT * FROM graft.db.t TIMESTAMP AS OF '$t1'").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L))
    // a pre-creation timestamp fails loudly instead of reading latest
    val ex = intercept[Exception] {
      sql("SELECT * FROM graft.db.t TIMESTAMP AS OF '1999-01-01 00:00:00'").collect()
    }
    assert(ex.getMessage.contains("no version committed at or before"))

    // INSERT OVERWRITE = transactional refresh, history preserved
    sql("INSERT OVERWRITE graft.db.t VALUES (9, 'z')")
    assert(sql("SELECT * FROM graft.db.t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet == Set(9L -> "z"))
    assert(sql("SELECT * FROM graft.db.t VERSION AS OF 2").count() == 3)

    // catalog plumbing
    assert(sql("SHOW TABLES IN graft.db").collect().map(_.getString(1)).toSeq == Seq("t"))
    assert(sql("DESCRIBE TABLE graft.db.t").collect()
      .map(_.getString(0)).toSet.contains("k"))
    // the transactional state surfaces as table properties
    val props = sql("SHOW TBLPROPERTIES graft.db.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("statsColumns") == "k" && props("version") == "3" &&
      props("action") == "refresh", props)
    sql("DROP TABLE graft.db.t")
    assert(!TxTable.exists(root))
    intercept[Exception] { sql("SELECT * FROM graft.db.t").collect() }
  }

  test("name-based reads keep manifest-level skipping engaged (pruned BatchScan)") {
    import spark.implicits._
    sql("CREATE TABLE graft.skip (k BIGINT, v STRING) TBLPROPERTIES('statsColumns'='k')")
    // 4 batches of 100 contiguous keys = 4 statted dirs
    (0 until 4).foreach { b =>
      val vals = (b * 100L until (b + 1) * 100L)
        .map(k => s"($k, 'v$k')").mkString(", ")
      sql(s"INSERT INTO graft.skip VALUES $vals")
    }
    val df = sql("SELECT v FROM graft.skip WHERE k >= 150 AND k < 250")
    assert(df.collect().map(_.getString(0)).toSet ==
      (150L until 250L).map(k => s"v$k").toSet)
    // the plan is the DSv2 GraftScan delegating to ParquetScan, and the
    // WHERE clause pruned dirs at the manifest level
    val nodes = PlanSpec.allNodes(df.queryExecution.executedPlan)
    val scans = nodes.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.exists(_.isInstanceOf[graft.sources.GraftScan]),
      s"expected the graft DSv2 scan, got ${nodes.map(_.nodeName)}")
    assert(GraftTableSource.lastKeptDirs.get <= 2 &&
      GraftTableSource.lastPrunedDirs.get >= 2,
      s"skipping not engaged: kept=${GraftTableSource.lastKeptDirs.get} " +
        s"pruned=${GraftTableSource.lastPrunedDirs.get}")
    // schema enforcement holds on the SQL write path
    val mism = intercept[Exception] {
      sql("INSERT INTO graft.skip VALUES (1)")
    }
    assert(mism != null)
    sql("DROP TABLE graft.skip")
  }

  test("ALTER TABLE SET TBLPROPERTIES routes to the skipping declarations; others rejected") {
    sql("CREATE TABLE graft.alt (k BIGINT, s STRING)")
    sql("INSERT INTO graft.alt VALUES (1, 'x')")
    sql("ALTER TABLE graft.alt SET TBLPROPERTIES('statsColumns'='k')")
    val root = s"$warehouse/alt"
    assert(TxTable.snapshot(root).statsCols == Seq("k"))
    sql("ALTER TABLE graft.alt SET TBLPROPERTIES('bloomColumns'='s')")
    assert(TxTable.snapshot(root).bloomCols == Seq("s"))
    val ex = intercept[Exception] {
      sql("ALTER TABLE graft.alt ADD COLUMN z INT")
    }
    assert(ex.getMessage.contains("evolve"), ex.getMessage)
    // rename keeps the table (and its history) intact
    sql("ALTER TABLE graft.alt RENAME TO alt2")
    assert(sql("SELECT * FROM graft.alt2").count() == 1)
    assert(sql("SELECT * FROM graft.alt2 VERSION AS OF 1").count() == 1)
    sql("DROP TABLE graft.alt2")
  }

  test("PARTITIONED BY is rejected with the skipping-columns pointer") {
    val ex = intercept[Exception] {
      sql("CREATE TABLE graft.part (k BIGINT, d STRING) PARTITIONED BY (d)")
    }
    assert(ex.getMessage.contains("statsColumns"), ex.getMessage)
  }

  test("identifier segments cannot escape the warehouse root") {
    val ex = intercept[Exception] {
      spark.sessionState.catalogManager.catalog("graft")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array(".."), "etc"))
    }
    assert(ex.getMessage.contains("illegal graft identifier"), ex.getMessage)
  }

  // --- MERGE INTO (GraftMergeRule, registered via GraftSparkExtensions) ---

  /** A sibling session with the extensions' analyzer rules injected
    * (the spec-JVM equivalent of
    * spark.sql.extensions=graft.plans.GraftSparkExtensions, which
    * ExtensionsProbe drives on a fresh JVM). */
  private lazy val mergeSession: SparkSession = {
    val s2 = org.apache.spark.sql.GraftBridge.sessionWithInjected(spark)(ext =>
      new graft.plans.GraftSparkExtensions().apply(ext))
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", warehouse)
    s2
  }

  test("MERGE INTO by name is the transactional upsert, row-for-row with Gold.upsert") {
    import spark.implicits._
    val s2 = mergeSession
    s2.sql("CREATE TABLE graft.m (k BIGINT, v STRING)")
    s2.sql("INSERT INTO graft.m VALUES (1, 'a'), (2, 'b')")
    val before = TxTable.latestVersion(s"$warehouse/m")
    s2.sql("""MERGE INTO graft.m AS t
             |USING (SELECT * FROM VALUES (2L, 'B'), (3L, 'c') AS x(k, v)) AS s
             |ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = s2.sql("SELECT * FROM graft.m").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(1L -> "a", 2L -> "B", 3L -> "c"))
    // exactly ONE commit, and it is a merge
    assert(TxTable.latestVersion(s"$warehouse/m") == before + 1)
    assert(TxTable.snapshot(s"$warehouse/m").action == "merge")
    // row-for-row ≡ Gold.upsert applying the same incoming batch to the
    // same pre-merge state
    val goldRoot = tmpTable("gold-twin")
    graft.etl.Gold.upsert(spark, goldRoot, Seq(1L -> "a", 2L -> "b").toDF("k", "v"), "k")
    graft.etl.Gold.upsert(spark, goldRoot, Seq(2L -> "B", 3L -> "c").toDF("k", "v"), "k")
    val goldRows = graft.etl.Gold.readTable(spark, goldRoot).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == goldRows)
    s2.sql("DROP TABLE graft.m")
  }

  test("MERGE source column order does not matter (aligned by name, target-typed)") {
    val s2 = mergeSession
    s2.sql("CREATE TABLE graft.mo (k BIGINT, v STRING)")
    s2.sql("INSERT INTO graft.mo VALUES (1, 'a')")
    // source projects (v, k) — reversed — and k as INT (cast to BIGINT)
    s2.sql("""MERGE INTO graft.mo t
             |USING (SELECT 'z' AS v, 9 AS k) s
             |ON t.k = s.k
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(s2.sql("SELECT * FROM graft.mo").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set(1L -> "a", 9L -> "z"))
    s2.sql("DROP TABLE graft.mo")
  }

  test("MERGE shapes beyond the upsert fail loudly, table untouched") {
    val s2 = mergeSession
    s2.sql("CREATE TABLE graft.mr (k BIGINT, v STRING)")
    s2.sql("INSERT INTO graft.mr VALUES (1, 'a')")
    val v = TxTable.latestVersion(s"$warehouse/mr")
    def rejected(q: String, needle: String): Unit = {
      val ex = intercept[Exception] { s2.sql(q) }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("graft MERGE INTO supports exactly")),
        s"wrong failure for [$needle]: $ex")
    }
    rejected("""MERGE INTO graft.mr t USING (SELECT 1L AS k, 'x' AS v) s
               |ON t.k = s.k
               |WHEN MATCHED THEN DELETE""".stripMargin, "DELETE")
    rejected("""MERGE INTO graft.mr t USING (SELECT 1L AS k, 'x' AS v) s
               |ON t.k = s.k AND t.v = s.v
               |WHEN MATCHED THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "multi-key")
    rejected("""MERGE INTO graft.mr t USING (SELECT 1L AS k, 'x' AS v) s
               |ON t.k = s.k
               |WHEN MATCHED AND s.v = 'x' THEN UPDATE SET *
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "conditional")
    rejected("""MERGE INTO graft.mr t USING (SELECT 1L AS k, 'x' AS v) s
               |ON t.k = s.k
               |WHEN MATCHED THEN UPDATE SET v = concat(s.v, '!')
               |WHEN NOT MATCHED THEN INSERT *""".stripMargin, "expression assignment")
    // nothing committed by any rejected statement
    assert(TxTable.latestVersion(s"$warehouse/mr") == v)
    assert(s2.sql("SELECT v FROM graft.mr").collect().map(_.getString(0)).toSeq == Seq("a"))
    s2.sql("DROP TABLE graft.mr")
  }

  private def tmpTable(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cat-$name").toString + "/t"

  // --- SQL UPDATE (GraftUpdateRule → scoped-rewrite updateKeys/Range) ---

  test("UPDATE by name: IN set and range shapes, expression assignments, scoped commits") {
    val s2 = mergeSession
    s2.sql("CREATE TABLE graft.upd (k BIGINT, v STRING, n BIGINT) " +
      "TBLPROPERTIES('statsColumns'='k')")
    val vals = (0L until 40L).map(k => s"($k, 'v$k', $k)").mkString(", ")
    s2.sql(s"INSERT INTO graft.upd VALUES $vals")
    val root = s"$warehouse/upd"

    // point shape → updateKeys commit; SET is an expression over the
    // table's own columns
    s2.sql("UPDATE graft.upd SET v = concat(v, '!'), n = n * 10 WHERE k IN (3, 5)")
    assert(TxTable.snapshot(root).action == "updateKeys")
    val got = s2.sql("SELECT v, n FROM graft.upd WHERE k IN (3, 5) ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("v3!", 30L), ("v5!", 50L)), got)
    assert(s2.sql("SELECT count(*) FROM graft.upd").head.getLong(0) == 40L)
    assert(s2.sql("SELECT v FROM graft.upd WHERE k = 4").head.getString(0) == "v4")

    // range shape (strict integral bounds tighten exactly)
    s2.sql("UPDATE graft.upd SET n = 0 WHERE k > 10 AND k <= 12")
    assert(TxTable.snapshot(root).action == "updateRange")
    // exactly (10, 12] = {11, 12} zeroed; 10 and 13 untouched
    assert(s2.sql("SELECT n FROM graft.upd WHERE k IN (10, 11, 12, 13) ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(10L, 0L, 0L, 13L))

    // every update is a commit; time travel reads the pre-update state
    assert(s2.sql("SELECT v FROM graft.upd VERSION AS OF 1 WHERE k = 3")
      .head.getString(0) == "v3")

    // rejected shapes fail loudly, table untouched
    val before = TxTable.latestVersion(root)
    def rejected(q: String): Unit = {
      val ex = intercept[Exception] { s2.sql(q) }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("graft UPDATE supports")), s"wrong failure: $ex")
    }
    rejected("UPDATE graft.upd SET n = 0") // unconditioned = whole-table rewrite
    rejected("UPDATE graft.upd SET n = 0 WHERE v = 'v1' AND n = 1") // two columns
    assert(TxTable.latestVersion(root) == before)
    s2.sql("DROP TABLE graft.upd")
  }

  // --- SQL DELETE FROM (SupportsDelete: scoped-rewrite shapes only) ---

  test("DELETE FROM by name: IN set, closed range, strict integral bounds, truncate") {
    sql("CREATE TABLE graft.del (k BIGINT, v STRING) TBLPROPERTIES('statsColumns'='k')")
    val vals = (0L until 40L).map(k => s"($k, 'v$k')").mkString(", ")
    sql(s"INSERT INTO graft.del VALUES $vals")
    val root = s"$warehouse/del"

    sql("DELETE FROM graft.del WHERE k IN (3, 5)")
    assert(TxTable.snapshot(root).action == "deleteKeys")
    assert(sql("SELECT count(*) FROM graft.del").head.getLong(0) == 38L)

    // single equality is the point form too
    sql("DELETE FROM graft.del WHERE k = 7")
    assert(TxTable.snapshot(root).action == "deleteKeys")
    assert(sql("SELECT count(*) FROM graft.del").head.getLong(0) == 37L)

    // a bare IS NOT NULL is not a scoped shape: refused loudly
    val nn = intercept[Exception] { sql("DELETE FROM graft.del WHERE k IS NOT NULL") }
    assert(nn.getMessage.toLowerCase.contains("delete"), nn.getMessage)
    assert(sql("SELECT count(*) FROM graft.del").head.getLong(0) == 37L)

    sql("DELETE FROM graft.del WHERE k >= 10 AND k <= 19")
    assert(TxTable.snapshot(root).action == "deleteRange")
    assert(sql("SELECT count(*) FROM graft.del").head.getLong(0) == 27L)

    // strict bounds tighten exactly for integral columns: (30, 35) = [31, 34]
    sql("DELETE FROM graft.del WHERE k > 30 AND k < 35")
    assert(sql("SELECT k FROM graft.del WHERE k >= 30 AND k <= 35 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(30L, 35L))

    // every delete is a commit; time travel reads the pre-delete state
    assert(sql("SELECT count(*) FROM graft.del VERSION AS OF 1").head.getLong(0) == 40L)

    // arbitrary predicates are refused loudly (scoped-rewrite contract)
    val ex = intercept[Exception] {
      sql("DELETE FROM graft.del WHERE v = 'v0' AND k = 0")
    }
    assert(ex.getMessage.toLowerCase.contains("delete"), ex.getMessage)

    // unconditioned DELETE = truncate, as a full-replace commit
    sql("DELETE FROM graft.del")
    assert(sql("SELECT count(*) FROM graft.del").head.getLong(0) == 0L)
    assert(sql("SELECT * FROM graft.del").schema.fieldNames.toSeq == Seq("k", "v"))
    sql("DROP TABLE graft.del")
  }

  // --- CALL procedures (Delta OPTIMIZE/VACUUM/RESTORE parity) ---

  test("CALL graft.system.compact / restore / vacuum drive the table's maintenance") {
    sql("CREATE TABLE graft.mnt (k BIGINT, v STRING)")
    (0 until 4).foreach { b =>
      val vals = (b * 10L until (b + 1) * 10L).map(k => s"($k, 'v$k')").mkString(", ")
      sql(s"INSERT INTO graft.mnt VALUES $vals")
    }
    val root = s"$warehouse/mnt"
    val dirsBefore = TxTable.snapshot(root).dirs.length
    assert(dirsBefore == 4)
    // compact: 4 ingest dirs bin-pack into one commit
    val cv = sql("CALL graft.system.compact(table => 'mnt')").collect()
    assert(cv.length == 1 && cv.head.getLong(0) == 5L,
      s"compact returned ${cv.toSeq}")
    assert(TxTable.snapshot(root).action == "compact")
    assert(TxTable.snapshot(root).dirs.length < dirsBefore)
    assert(sql("SELECT count(*) FROM graft.mnt").head.getLong(0) == 40L)
    // restore: roll back to pre-compact version 4 (zero-copy)
    val rv = sql("CALL graft.system.restore(table => 'mnt', version => 4)").collect()
    assert(rv.head.getLong(0) == 6L)
    assert(TxTable.snapshot(root).dirs.length == dirsBefore)
    assert(sql("SELECT count(*) FROM graft.mnt").head.getLong(0) == 40L)
    // vacuum: forget history below version 6; old versions unreadable,
    // current contents intact
    sql("CALL graft.system.vacuum(table => 'mnt', keep_from => 6, grace_ms => 0)")
    intercept[Exception] { sql("SELECT * FROM graft.mnt VERSION AS OF 0").collect() }
    assert(sql("SELECT count(*) FROM graft.mnt").head.getLong(0) == 40L)
    sql("DROP TABLE graft.mnt")
  }

  test("procedures reject unknown tables and unknown names loudly") {
    val ex = intercept[Exception] {
      sql("CALL graft.system.compact(table => 'nope')").collect()
    }
    assert(ex.getMessage.contains("does not exist"), ex.getMessage)
    val ex2 = intercept[Exception] {
      sql("CALL graft.system.frobnicate(table => 'x')").collect()
    }
    // Spark wraps the catalog's error as FAILED_TO_LOAD_ROUTINE
    assert(ex2.getMessage.contains("frobnicate"), ex2.getMessage)
  }

  test("namespaces list, report metadata, and refuse non-cascade drop of non-empty") {
    sql("CREATE NAMESPACE graft.nsa")
    sql("CREATE TABLE graft.nsa.inner (k BIGINT)")
    val nss = sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(nss.contains("nsa"), nss)
    val ex = intercept[Exception] { sql("DROP NAMESPACE graft.nsa") }
    assert(ex != null)
    sql("DROP NAMESPACE graft.nsa CASCADE")
    assert(!new java.io.File(s"$warehouse/nsa").exists())
  }
}
