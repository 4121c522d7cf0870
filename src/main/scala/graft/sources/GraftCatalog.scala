package graft.sources

import graft.etl.TxTable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DSv2 `TableCatalog` over a warehouse of [[TxTable]]s — the
  * name-based SQL surface (round-19 verdict task 1: "the last
  * Delta-parity surface a SQL-only user hits"). Register with
  *
  * {{{
  * spark.sql.catalog.graft      = graft.sources.GraftCatalog
  * spark.sql.catalog.graft.root = /warehouse/graft
  * }}}
  *
  * and every table is addressable by NAME from pure SQL, no Scala and
  * no paths:
  *
  *  - `CREATE TABLE graft.ns.t (k BIGINT, v STRING)` — a metadata-only
  *    v0 commit recording the enforced schema ([[TxTable.create]]);
  *    `TBLPROPERTIES` / `OPTIONS` keys `statsColumns` / `bloomColumns`
  *    declare the data-skipping columns at creation, so the first data
  *    commit is already statted.
  *  - `INSERT INTO graft.ns.t ...` / `INSERT OVERWRITE` — the existing
  *    [[GraftTable]] V1Write path: transactional append / refresh
  *    commits, identical to every other write route.
  *  - `SELECT ... FROM graft.ns.t` — the DSv2 read path with
  *    manifest-level skipping, DPP, and aggregate pushdown, resolved
  *    at LATEST per query (each query still reads one pinned
  *    consistent snapshot).
  *  - `SELECT ... FROM graft.ns.t VERSION AS OF 3` — time travel via
  *    the catalog's `loadTable(ident, version)` hook; `TIMESTAMP AS
  *    OF ts` resolves through [[TxTable.versionAtTimestamp]] (commit
  *    mtimes, the `history` clock).
  *  - `MERGE INTO graft.ns.t` — upsert-by-SQL, rewritten to
  *    [[TxTable.mergeUpsert]] by the rule
  *    [[graft.plans.GraftMergeRule]] (riding this catalog's name
  *    resolution).
  *  - `ALTER TABLE graft.ns.t SET TBLPROPERTIES('statsColumns'='k')` —
  *    routes to [[TxTable.setStatsColumns]]/[[TxTable.setBloomColumns]]
  *    (metadata commits that backfill existing dirs). All other alters
  *    are rejected loudly: the schema contract evolves through writes
  *    (`evolve=true`), not DDL.
  *  - `SHOW TABLES IN graft.ns` / `DESCRIBE TABLE` / `DROP TABLE` /
  *    `ALTER TABLE ... RENAME TO` — standard catalog plumbing; a
  *    namespace is a directory, a table is a TxTable root.
  *
  * Scale posture: the catalog holds NO state beyond the root path —
  * every lookup is the table's own O(1) hinted log discovery, so a
  * 1000-executor deployment pointing many drivers at one warehouse
  * coordinates exactly as the underlying commit protocol does
  * (rename-wins manifests), with no metastore bottleneck in front.
  * Reference counterpart: the Milvus collection addressed by name
  * (`dags/utils/seed_milvus.py:71`).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with StagingTableCatalog {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).map(_.replaceAll("/+$", "")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs a warehouse root: set spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array.empty

  /** Identifier → filesystem path under the root. Each segment must be
    * a plain directory name: anything path-like would let a SQL
    * identifier escape the warehouse root. */
  private def pathOf(ident: Identifier): String = {
    val segs = (ident.namespace() :+ ident.name()).toSeq
    segs.foreach { s =>
      require(s.nonEmpty && !s.contains("/") && !s.contains("\\") &&
        s != "." && s != ".." && !s.startsWith("_"),
        s"illegal graft identifier segment '$s' (path separators, dot " +
          "segments, and _-prefixed names are reserved)")
    }
    (root +: segs).mkString("/")
  }

  private def nsPath(namespace: Array[String]): String =
    (root +: namespace.toSeq).mkString("/")

  private def spark: SparkSession = SparkSession.active

  // --- tables ---

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File(nsPath(namespace))
    if (!dir.isDirectory) throw new NoSuchNamespaceException(namespace)
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      // "_"-prefixed names are reserved (identifier rule in pathOf):
      // in-flight CTAS staging dirs live there and must not list
      .filter(f => f.isDirectory && !f.getName.startsWith("_") &&
        TxTable.exists(f.toString))
      .map(f => Identifier.of(namespace, f.getName))
      .sortBy(_.name())
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    TxTable.exists(pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    val path = pathOf(ident)
    if (!TxTable.exists(path)) throw new NoSuchTableException(ident)
    GraftTable(path, GraftTableSource.resolveVersion(path, -1L))
  }

  /** `VERSION AS OF <v>` (Spark hands the version as a string). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val path = pathOf(ident)
    if (!TxTable.exists(path)) throw new NoSuchTableException(ident)
    val v = try version.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a numeric table version, got '$version'")
    }
    require(TxTable.versionExists(path, v),
      s"graft table ${ident} has no version $v")
    GraftTable(path, v)
  }

  /** `TIMESTAMP AS OF <ts>` (Spark hands microseconds since epoch). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val path = pathOf(ident)
    if (!TxTable.exists(path)) throw new NoSuchTableException(ident)
    GraftTable(path, TxTable.versionAtTimestamp(path, timestamp / 1000L))
  }

  /** Shared CREATE/CTAS validation: no PARTITIONED BY (manifest-level
    * dir skipping plays the pruning role) and no unknown TBLPROPERTIES
    * (an unknown property is far more likely a typo'd skipping
    * declaration — 'statColumns' — than an intentional annotation, and
    * accepting it silently creates an UNSKIPPED table whose every scan
    * reads all dirs with no error anywhere; r19 reviewer). Spark's own
    * managed keys pass — Spark injects them on every CREATE and the
    * engine does not interpret them. Returns the declared
    * (statsColumns, bloomColumns). */
  private def validatedSkipping(partitions: Array[Transform],
                                properties: java.util.Map[String, String]): (Seq[String], Seq[String]) = {
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft tables do not take PARTITIONED BY transforms — declare " +
        "data-skipping columns via TBLPROPERTIES('statsColumns'= , " +
        "'bloomColumns'= ) instead (manifest-level dir skipping plays " +
        "the partition-pruning role)")
    def prop(key: String): Seq[String] =
      Seq(key, TableCatalog.OPTION_PREFIX + key)
        .flatMap(k => Option(properties.get(k)))
        .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty).distinct
    val sparkManaged = Set(TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_IS_MANAGED_LOCATION,
      "transient_lastDdlTime")
    val understood = Set("statsColumns", "bloomColumns")
      .flatMap(k => Set(k, TableCatalog.OPTION_PREFIX + k))
    val unknownProps = properties.keySet().toArray(Array.empty[String])
      .filterNot(understood).filterNot(sparkManaged)
    if (unknownProps.nonEmpty) throw new UnsupportedOperationException(
      s"graft tables understand TBLPROPERTIES('statsColumns'= , " +
        s"'bloomColumns'= ) only; rejected: ${unknownProps.sorted.mkString(", ")} " +
        "(misspelling a skipping declaration would otherwise silently " +
        "create an unskipped table)")
    (prop("statsColumns"), prop("bloomColumns"))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    val path = pathOf(ident)
    val (statsCols, bloomCols) = validatedSkipping(partitions, properties)
    // NOT NULL is neither enforced at write time nor recorded by the
    // table format (commit fingerprints normalize nullability, because
    // a parquet round-trip always reads back nullable) — refuse the
    // declaration rather than silently drop the constraint
    schema.fields.filterNot(_.nullable).toSeq match {
      case Seq() => ()
      case nn => throw new UnsupportedOperationException(
        s"graft tables do not enforce NOT NULL — declare " +
          s"${nn.map(_.name).mkString(", ")} nullable (the format " +
          "normalizes nullability: a parquet round-trip reads back " +
          "nullable, so the constraint could be recorded but never kept)")
    }
    // namespace dirs materialize on first use (CREATE NAMESPACE is
    // optional, the filesystem-catalog convention)
    new java.io.File(path).getParentFile.mkdirs()
    if (!TxTable.create(path, schema, statsCols, bloomCols))
      throw new TableAlreadyExistsException(ident)
    GraftTable(path, 0L)
  }

  // --- staged creates/replaces (`CREATE TABLE ... AS SELECT`,
  // `[CREATE OR] REPLACE TABLE [... AS SELECT]`) — the atomic CTAS/RTAS
  // surface. CREATE stages into a sibling `_staging-*` TxTable and
  // RENAMES into place on commit (one filesystem rename = the atomic
  // point; a racing creator loses loudly, rename-wins like every other
  // graft commit). REPLACE is a full-replace `refresh(evolve=true)`
  // commit on the EXISTING table — atomic by the manifest protocol and
  // HISTORY-KEEPING: the pre-replace versions stay time-travelable
  // (Delta's REPLACE behaves the same way), unlike the non-atomic
  // drop+recreate Spark falls back to without a StagingTableCatalog,
  // which loses the table entirely on a crash between the two steps.
  //
  // Nullability: staged schemas are normalized to nullable rather than
  // rejected — they are QUERY-DERIVED (a CTAS of `count(*)` infers a
  // non-nullable column the user never declared), unlike the explicit
  // NOT NULL a human types into plain CREATE TABLE, which stays a loud
  // rejection. The format records nullable-normalized schemas anyway.
  //
  // A crash between stageCreate and commit leaves only an orphaned
  // `_staging-*` dir (reserved namespace, never listed, never read);
  // delete it at leisure.

  override def stageCreate(ident: Identifier, info: TableInfo): StagedTable =
    stagedTable(ident, info, mustExist = Some(false))

  override def stageReplace(ident: Identifier, info: TableInfo): StagedTable =
    stagedTable(ident, info, mustExist = Some(true))

  override def stageCreateOrReplace(ident: Identifier, info: TableInfo): StagedTable =
    stagedTable(ident, info, mustExist = None)

  private def stagedTable(ident: Identifier, info: TableInfo,
                          mustExist: Option[Boolean]): StagedTable = {
    val path = pathOf(ident)
    val (statsCols, bloomCols) = validatedSkipping(info.partitions(), info.properties())
    val schema = StructType(info.schema().fields.map(_.copy(nullable = true)))
    val bad = (statsCols ++ bloomCols).filterNot(schema.fieldNames.contains)
    require(bad.isEmpty,
      s"declared skipping columns not in the schema: ${bad.mkString(", ")}")
    val exists = TxTable.exists(path)
    mustExist match {
      case Some(true) if !exists => throw new NoSuchTableException(ident)
      case Some(false) if exists => throw new TableAlreadyExistsException(ident)
      case _                     => ()
    }
    if (exists) new StagedGraftReplace(ident, path, schema, statsCols, bloomCols)
    else new StagedGraftCreate(ident, path, schema, statsCols, bloomCols)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!TxTable.exists(path)) throw new NoSuchTableException(ident)
    // ADD COLUMNS batches into ONE evolve commit (Spark hands each
    // column as its own AddColumn change); everything else applies
    // change-by-change
    val (adds, rest) = changes.partition(_.isInstanceOf[TableChange.AddColumn])
    rest.foreach {
      case set: TableChange.SetProperty if set.property() == "statsColumns" =>
        TxTable.setStatsColumns(spark, path,
          set.value().split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      case set: TableChange.SetProperty if set.property() == "bloomColumns" =>
        TxTable.setBloomColumns(spark, path,
          set.value().split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      case other => throw new UnsupportedOperationException(
        s"graft tables alter the skipping declarations " +
          s"(SET TBLPROPERTIES('statsColumns'|'bloomColumns')) and ADD " +
          s"COLUMNS (nullable, appended); other schema changes ride a " +
          s"write with evolve=true. Rejected: $other")
    }
    if (adds.nonEmpty) {
      val fields = adds.map(_.asInstanceOf[TableChange.AddColumn]).map { a =>
        // append-only, top-level, nullable: the evolve commit cannot
        // backfill immutable dirs, so a NOT NULL or positioned or
        // nested add would lie about what old rows read back as
        if (a.fieldNames().length != 1) throw new UnsupportedOperationException(
          s"graft ADD COLUMNS adds top-level columns only; rejected " +
            s"nested field ${a.fieldNames().mkString(".")}")
        if (!a.isNullable) throw new UnsupportedOperationException(
          s"graft ADD COLUMNS requires nullable columns — existing rows " +
            s"read the new column as NULL; '${a.fieldNames().head}' " +
            "declared NOT NULL cannot hold")
        if (a.position() != null) throw new UnsupportedOperationException(
          s"graft ADD COLUMNS appends at the end (parquet resolves " +
            s"missing columns by name); a position for " +
            s"'${a.fieldNames().head}' is not supported")
        org.apache.spark.sql.types.StructField(
          a.fieldNames().head, a.dataType(), nullable = true)
      }
      val cur = TxTable.tableSchema(spark, path)
      val dup = fields.map(_.name).filter(cur.fieldNames.contains)
      if (dup.nonEmpty) throw new UnsupportedOperationException(
        s"column(s) already exist: ${dup.mkString(", ")}")
      TxTable.evolveSchema(spark, path,
        org.apache.spark.sql.types.StructType(cur.fields ++ fields))
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val path = pathOf(ident)
    if (!TxTable.exists(path)) false
    else {
      TxTable.deleteRecursively(new java.io.File(path))
      // cached snapshots/stats for the dropped root must not leak into
      // a same-named successor
      TxTable.clearResolutionCaches()
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = pathOf(oldIdent); val to = pathOf(newIdent)
    if (!TxTable.exists(from)) throw new NoSuchTableException(oldIdent)
    if (TxTable.exists(to)) throw new TableAlreadyExistsException(newIdent)
    new java.io.File(to).getParentFile.mkdirs()
    java.nio.file.Files.move(java.nio.file.Paths.get(from),
      java.nio.file.Paths.get(to))
    TxTable.clearResolutionCaches()
  }

  override def invalidateTable(ident: Identifier): Unit =
    TxTable.clearResolutionCaches()

  // --- maintenance procedures (`CALL graft.system.<proc>(...)`) —
  // the Delta OPTIMIZE/VACUUM/RESTORE SQL parity, routed to the
  // table format's own maintenance primitives. Each returns a one-row
  // summary. The `table` argument is the catalog-relative name
  // ('t' or 'ns.t'), resolved through the same identifier rules as
  // every other catalog lookup. ---

  /** Resolve a procedure's `table` argument; fails on unknown tables. */
  private def tableArg(name: String): String = {
    val segs = name.split('.').toSeq
    val path = pathOf(Identifier.of(segs.init.toArray, segs.last))
    require(TxTable.exists(path), s"graft table '$name' does not exist")
    path
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      Array("compact", "vacuum", "restore", "history")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  override def loadProcedure(ident: Identifier): org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    import org.apache.spark.sql.connector.catalog.procedures._
    import org.apache.spark.sql.connector.read.{LocalScan, Scan}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    require(ident.namespace().sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace().mkString(".")} " +
        "(graft procedures live under 'system')")

    def p(n: String, dt: DataType) = ProcedureParameter.in(n, dt)
    /** One-row result as the CALL command's scan. */
    def result(schema: StructType, values: Any*): java.util.Iterator[Scan] =
      java.util.List.of[Scan](new LocalScan {
        override def readSchema(): StructType = schema
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(values.toIndexedSeq))
      }).iterator()
    def str(row: InternalRow, i: Int): String = row.getUTF8String(i).toString
    val versionResult = StructType(Seq(StructField("version", LongType)))

    abstract class Proc(procName: String, params: Array[ProcedureParameter],
                        desc: String)
        extends UnboundProcedure with BoundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure = this
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = params
    }

    ident.name() match {
      case "compact" => new Proc("compact", Array(
        p("table", StringType).build(),
        p("target_bytes", LongType)
          .defaultValue(graft.etl.Compact.DefaultTargetBytes.toString)
          .comment("max output dir size").build(),
        p("cluster_by", StringType).defaultValue("''")
          .comment("comma-separated layout columns").build(),
        p("z_order", BooleanType).defaultValue("false").build()),
        "bin-pack (optionally cluster / z-order) a graft table's dirs " +
          "into one compacted commit; history stays time-travelable") {
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val cols = str(input, 2).split(',').map(_.trim).filter(_.nonEmpty).toSeq
          val v = TxTable.compact(spark, tableArg(str(input, 0)),
            targetBytes = input.getLong(1), clusterBy = cols,
            zOrder = input.getBoolean(3))
          result(versionResult, v)
        }
      }
      case "vacuum" => new Proc("vacuum", Array(
        p("table", StringType).build(),
        p("keep_from", LongType)
          .comment("drop manifests below this version, then unreferenced dirs").build(),
        p("grace_ms", LongType)
          .defaultValue(TxTable.DefaultVacuumGraceMs.toString)
          .comment("in-flight writer grace").build()),
        "destructive retention: forget history below keep_from " +
          "(time travel works until the operator chooses to forget)") {
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val path = tableArg(str(input, 0))
          TxTable.vacuum(path, input.getLong(1), input.getLong(2))
          result(StructType(Seq(StructField("kept_from", LongType))),
            input.getLong(1))
        }
      }
      case "history" => new Proc("history", Array(
        p("table", StringType).build()),
        "the table's commit history, newest first (DESCRIBE HISTORY " +
          "parity): one row per still-retained version — exactly what " +
          "time travel can still read") {
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val df = TxTable.history(spark, tableArg(str(input, 0)))
          // bounded collect: one row per RETAINED version (vacuum
          // bounds retention; a never-vacuumed table holds its full
          // commit count, the same bound Delta's DESCRIBE HISTORY has)
          val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(df.schema)
          val collected = df.collect().map(r => conv(r).asInstanceOf[InternalRow])
          java.util.List.of[Scan](new LocalScan {
            override def readSchema(): StructType = df.schema
            override def rows(): Array[InternalRow] = collected
          }).iterator()
        }
      }
      case "restore" => new Proc("restore", Array(
        p("table", StringType).build(),
        p("version", LongType).comment("the version to restore to").build()),
        "zero-copy rollback commit: current state becomes `version`'s; " +
          "both sides stay readable, the txn ledger is kept") {
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val v = TxTable.restore(spark, tableArg(str(input, 0)), input.getLong(1))
          result(versionResult, v)
        }
      }
      case other => throw new RuntimeException(
        s"unknown graft procedure '$other' — available: system.compact, " +
          "system.vacuum, system.restore, system.history")
    }
  }

  // --- namespaces (a namespace = a directory that is not itself a
  // table; nesting is allowed) ---

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = new java.io.File(nsPath(namespace))
    if (namespace.nonEmpty && !dir.isDirectory)
      throw new NoSuchNamespaceException(namespace)
    Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory && !f.getName.startsWith("_") &&
        !TxTable.exists(f.toString))
      .map(f => namespace :+ f.getName)
      .sortBy(_.mkString("."))
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (new java.io.File(nsPath(namespace)).isDirectory &&
      !TxTable.exists(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    java.util.Collections.singletonMap(SupportsNamespaces.PROP_LOCATION,
      nsPath(namespace))
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && namespace.nonEmpty)
      throw new NamespaceAlreadyExistsException(namespace)
    namespace.foreach(s => require(s.nonEmpty && !s.contains("/") &&
      !s.contains("\\") && s != "." && s != ".." && !s.startsWith("_"),
      s"illegal namespace segment '$s'"))
    new java.io.File(nsPath(namespace)).mkdirs(): Unit
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = new java.io.File(nsPath(namespace))
    if (!namespaceExists(namespace) || namespace.isEmpty) false
    else {
      val nonEmpty = Option(dir.listFiles()).exists(_.nonEmpty)
      if (nonEmpty && !cascade)
        throw new org.apache.spark.sql.catalyst.analysis.NonEmptyNamespaceException(
          namespace)
      TxTable.deleteRecursively(dir)
      if (nonEmpty) TxTable.clearResolutionCaches()
      true
    }
  }
}

/** Common staged-write shape for the atomic CTAS/RTAS surface: a
  * [[StagedTable]] whose write lands through the same `V1Write` →
  * transactional-commit path as every other graft write. */
private[sources] sealed abstract class StagedGraftTable(
    ident: Identifier, tableSchema: StructType)
    extends StagedTable with SupportsWrite {

  protected def spark: SparkSession = SparkSession.active

  override def name(): String = ident.toString
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.V1_BATCH_WRITE)

  /** Where this staged table's AS-SELECT rows land. */
  protected def insertStaged(data: org.apache.spark.sql.DataFrame): Unit

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation: org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                                  overwrite: Boolean): Unit = insertStaged(data)
            }
        }
    }
}

/** Staged CREATE (CTAS): the table builds as a sibling `_staging-*`
  * TxTable (v0 create + v1 data append), and `commitStagedChanges`
  * RENAMES it into place — one atomic filesystem rename, so a reader
  * never sees a partial table and a crash leaves only an orphaned
  * staging dir. A concurrent creator of the same name loses loudly at
  * the rename (rename-wins, like every manifest commit). */
private[sources] final class StagedGraftCreate(
    ident: Identifier, path: String, tableSchema: StructType,
    statsCols: Seq[String], bloomCols: Seq[String])
    extends StagedGraftTable(ident, tableSchema) {

  private val tmpPath: String = {
    val f = new java.io.File(path)
    new java.io.File(f.getParentFile,
      s"_staging-${f.getName}-${java.util.UUID.randomUUID().toString.take(8)}").toString
  }
  locally {
    new java.io.File(tmpPath).getParentFile.mkdirs()
    require(TxTable.create(tmpPath, tableSchema, statsCols, bloomCols),
      s"could not stage CTAS at $tmpPath")
  }

  override protected def insertStaged(data: org.apache.spark.sql.DataFrame): Unit =
    TxTable.append(spark, tmpPath, data): Unit

  override def commitStagedChanges(): Unit = {
    import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardCopyOption}
    try
      Files.move(Paths.get(tmpPath), Paths.get(path),
        StandardCopyOption.ATOMIC_MOVE): Unit
    catch {
      case e @ (_: FileAlreadyExistsException |
                _: java.nio.file.FileSystemException) =>
        TxTable.deleteRecursively(new java.io.File(tmpPath))
        if (TxTable.exists(path)) throw new TableAlreadyExistsException(ident)
        else throw e
    }
    TxTable.clearResolutionCaches() // tmp-path snapshots must not linger
  }

  override def abortStagedChanges(): Unit = {
    TxTable.deleteRecursively(new java.io.File(tmpPath))
    TxTable.clearResolutionCaches()
  }
}

/** Staged REPLACE (RTAS / `[CREATE OR] REPLACE TABLE`): a full-replace
  * `refresh(evolve = true)` commit on the EXISTING table — atomic by
  * the manifest protocol, with pre-replace versions kept
  * time-travelable (Delta's REPLACE semantics). Declared skipping
  * properties re-declare after the data commit (backfilling the fresh
  * dirs); when the REPLACE declares none, the carried declarations
  * stand — sound either way, since stats on a column the new schema
  * dropped simply never match a predicate again. A failed AS-SELECT
  * never reaches the manifest commit, so abort has nothing to undo
  * (uncommitted data dirs are vacuum's to sweep). */
private[sources] final class StagedGraftReplace(
    ident: Identifier, path: String, tableSchema: StructType,
    statsCols: Seq[String], bloomCols: Seq[String])
    extends StagedGraftTable(ident, tableSchema) {

  @volatile private var wrote = false

  private def declare(): Unit = {
    if (statsCols.nonEmpty) TxTable.setStatsColumns(spark, path, statsCols): Unit
    if (bloomCols.nonEmpty) TxTable.setBloomColumns(spark, path, bloomCols): Unit
  }

  override protected def insertStaged(data: org.apache.spark.sql.DataFrame): Unit = {
    TxTable.refresh(spark, path, data, evolve = true): Unit
    declare()
    wrote = true
  }

  override def commitStagedChanges(): Unit =
    if (!wrote) { // REPLACE TABLE without AS SELECT: the empty table
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], tableSchema)
      TxTable.refresh(spark, path, empty, evolve = true): Unit
      declare()
    }

  override def abortStagedChanges(): Unit = ()
}
