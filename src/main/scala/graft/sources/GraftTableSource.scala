package graft.sources

import graft.etl.TxTable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * [[TxTable]] format as a first-class Spark data source, so the table
  * format's transactional reads, time travel, and manifest-level data
  * skipping are reachable from the standard reader/writer API (and from
  * `CREATE TABLE ... USING graft` paths that resolve through
  * `DataSourceRegister`), not just the Scala `TxTable` calls and the
  * `graft_table(...)` SQL table functions.
  *
  * Read path (DSv1 `PrunedFilteredScan` — the stable public connector
  * surface; chosen over DSv2 because its `buildScan` can delegate to a
  * full native parquet scan plan instead of re-implementing columnar
  * parquet reading in a `PartitionReader`):
  *  - the snapshot VERSION is pinned at relation creation
  *    (`versionAsOf` option, default latest), so one DataFrame is one
  *    consistent snapshot however many actions/retries scan it;
  *  - Catalyst pushes the query's conjunctive filters into
  *    `buildScan`; the connector translates range-expressible ones
  *    (=, <, <=, >, >=, IN, and AND-combinations) into per-column
  *    [lo, hi] ranges and prunes non-overlapping data dirs at the
  *    MANIFEST level via [[TxTable.pruneSnapshot]] — whole directories
  *    are skipped before Spark ever lists a file, the Delta-paper read
  *    path, now driven by the WHERE clause instead of an explicit API;
  *  - the kept dirs are read through a regular parquet scan with the
  *    translatable filters re-applied (so parquet row-group skipping
  *    and column pruning still engage below the manifest-level skip);
  *  - every filter is reported unhandled (`unhandledFilters` identity),
  *    so Spark re-applies the exact predicates on top — pruning can
  *    therefore only SKIP work, never change a result, whatever the
  *    translation does.
  *
  * Write path (`CreatableRelationProvider`): SaveMode.Append →
  * [[TxTable.append]] (a transactional commit, racing writers
  * serialize); Overwrite → [[TxTable.refresh]] (full-replace commit,
  * history kept — time travel still reads every prior version);
  * ErrorIfExists/Ignore follow their SaveMode contracts. Option
  * `evolve=true` permits a schema change (the table contract's
  * enforcement/evolution split).
  *
  * Options: `path` (required), `versionAsOf` (read; default latest),
  * `evolve` (write; default false). Streaming reads live in
  * [[GraftTailSource]] (same format name via `readStream`).
  */
class GraftTableSource extends RelationProvider with CreatableRelationProvider
    with StreamSourceProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source requires a path: spark.read.format(\"graft\").load(path)"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val root = pathOf(parameters)
    val version = parameters.get("versionAsOf").map(_.trim.toLong).getOrElse(-1L)
    GraftTableRelation(sqlContext, root, version)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val root = pathOf(parameters)
    val evolve = parameters.get("evolve").exists(_.trim.toBoolean)
    val spark = data.sparkSession
    mode match {
      case SaveMode.Append    => TxTable.append(spark, root, data, evolve)
      case SaveMode.Overwrite => TxTable.refresh(spark, root, data, evolve)
      case SaveMode.ErrorIfExists =>
        if (TxTable.exists(root)) throw new IllegalStateException(
          s"graft table at $root already exists (SaveMode.ErrorIfExists)")
        TxTable.refresh(spark, root, data, evolve)
      case SaveMode.Ignore =>
        if (!TxTable.exists(root)) TxTable.refresh(spark, root, data, evolve)
    }
    GraftTableRelation(sqlContext, root, -1L)
  }

  // --- streaming (readStream.format("graft")): see GraftTailSource ---

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val root = pathOf(parameters)
    val resolved = schema.getOrElse(
      TxTable.tableSchema(sqlContext.sparkSession, root))
    (s"graft[$root]", resolved)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    GraftTailSource(sqlContext, pathOf(parameters), schema, parameters, metadataPath)

  // --- streaming write (writeStream.format("graft")): see GraftTableSink ---

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    import org.apache.spark.sql.streaming.OutputMode
    require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
      s"graft sink supports Append (idempotent commits) and Complete " +
        s"(full-replace refresh per batch); got $outputMode — for Update-" +
        "shaped upserts use foreachBatch with TxTable.mergeUpsert")
    // partitionBy would be silently dropped — the txn-append path
    // writes whole-table entries only; fail loudly like Update does
    require(partitionColumns.isEmpty,
      "graft sink does not lay out partitionBy columns — for a " +
        "partition-scoped table use foreachBatch with mergeUpsertPartitioned")
    // writer identity for the txn ledger. Derived checkpoint paths are
    // NORMALIZED (absolute, no '.', no trailing slash, no scheme) so a
    // cosmetic respelling across restarts ('ckpt' vs './ckpt/') cannot
    // change the identity and un-record the replay high-water mark;
    // the session-conf checkpoint root (plus queryName, which scopes
    // the engine's actual checkpoint under that root) works too. ']'
    // is sanitized — appendIdempotent rejects it (manifest encoding).
    def normalize(p: String): String =
      try java.nio.file.Paths.get(p.stripPrefix("file:"))
        .toAbsolutePath.normalize.toString
      catch { case _: Exception => p }
    val appId = parameters.get("appId").getOrElse {
      val ckpt = parameters.get("checkpointLocation").map(normalize)
        .orElse(sqlContext.sparkSession.conf
          .getOption("spark.sql.streaming.checkpointLocation").map(normalize)
          .map(root => parameters.get("queryName")
            .fold(root)(q => s"$root/$q")))
        .getOrElse(throw new IllegalArgumentException(
          "graft sink needs a writer identity for idempotent commits: set " +
            "option(\"appId\", ...) or a checkpointLocation"))
      ckpt
    }.replace(']', '_')
    GraftTableSink(sqlContext, pathOf(parameters), appId, outputMode)
  }
}

/** One pinned-version snapshot of a TxTable as a DSv1 relation.
  * `InsertableRelation` makes `INSERT INTO` / `INSERT OVERWRITE` on a
  * `USING graft` view a transactional append/refresh commit — the
  * last DML shape the SQL surface was missing (reads, time travel,
  * and skipping already flow through the TVFs and this relation). */
final case class GraftTableRelation(sqlContext: SQLContext, root: String,
                                    versionAsOf: Long)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    if (overwrite) TxTable.refresh(sqlContext.sparkSession, root, data)
    else TxTable.append(sqlContext.sparkSession, root, data)

  private val spark: SparkSession = sqlContext.sparkSession
  /** Resolved ONCE: the relation is a consistent snapshot — concurrent
    * commits after DataFrame creation are invisible to it (and every
    * prior version stays readable, so versionAsOf time travel is just
    * pinning a different number). */
  private val snap = TxTable.snapshot(root, versionAsOf)

  override val schema: StructType =
    if (snap.schemaDdl.nonEmpty) StructType.fromDDL(snap.schemaDdl)
    else spark.read.parquet(snap.dirs.map(d => s"$root/$d"): _*).schema

  /** All filters stay Spark's responsibility — the connector uses them
    * only to SKIP dirs/row-groups, never to claim exactness. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val ranges = GraftTableSource.conjunctiveRanges(filters)
    val strRanges = GraftTableSource.conjunctiveStrRanges(filters)
    val points = GraftTableSource.conjunctivePoints(filters)
    val (kept, pruned) = TxTable.pruneSnapshot(root, snap, ranges, strRanges, points)
    GraftTableSource.lastKeptDirs.set(kept.length)
    GraftTableSource.lastPrunedDirs.set(pruned)
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else // explicit schema: uniform column order/types across dirs
        spark.read.schema(schema).parquet(kept.map(d => s"$root/$d"): _*)
    // re-apply translatable predicates INSIDE the scan plan so parquet
    // row-group stats skip below the manifest-level dir skip (Spark
    // re-applies the exact originals on top regardless — see
    // unhandledFilters)
    val filtered = filters.flatMap(GraftTableSource.toColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    val projected =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col).toIndexedSeq: _*)
    projected.rdd
  }
}

object GraftTableSource {

  /** Last buildScan's manifest-level skip counts (test/probe
    * observability, same role as TxTable's resolution counters). */
  private[graft] val lastKeptDirs = new java.util.concurrent.atomic.AtomicInteger
  private[graft] val lastPrunedDirs = new java.util.concurrent.atomic.AtomicInteger

  private def num(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _         => None // strings/dates/etc: no range translation
  }

  /** Per-column [lo, hi] ranges implied by a CONJUNCTION of pushed
    * filters (Spark splits top-level AND into array elements; nested
    * And recurses; Or/Not and non-numeric comparisons contribute
    * nothing — sound, they just don't prune). Open bounds (>, <) are
    * widened to closed — also sound for skipping. Multiple constraints
    * on one column intersect. */
  private[graft] def conjunctiveRanges(filters: Array[Filter]): Map[String, (Double, Double)] = {
    def one(f: Filter): Seq[(String, Double, Double)] = f match {
      case EqualTo(a, v)            => num(v).map(d => (a, d, d)).toSeq
      case GreaterThan(a, v)        => num(v).map(d => (a, d, Double.PositiveInfinity)).toSeq
      case GreaterThanOrEqual(a, v) => num(v).map(d => (a, d, Double.PositiveInfinity)).toSeq
      case LessThan(a, v)           => num(v).map(d => (a, Double.NegativeInfinity, d)).toSeq
      case LessThanOrEqual(a, v)    => num(v).map(d => (a, Double.NegativeInfinity, d)).toSeq
      case In(a, vs) =>
        val ds = vs.toSeq.flatMap(num)
        // every member must translate, else the range could miss rows
        if (ds.nonEmpty && ds.length == vs.length) Seq((a, ds.min, ds.max)) else Nil
      case And(l, r) => one(l) ++ one(r)
      case _         => Nil
    }
    filters.flatMap(one).groupBy(_._1).map { case (c, cs) =>
      c -> (cs.map(_._2).max, cs.map(_._3).min)
    }
  }

  /** String-typed counterpart of [[conjunctiveRanges]] — [lo, hi]
    * bounds in code-point order against the sidecar's
    * [[TxTable.DirStrStat]] records, hi = None meaning unbounded above
    * (no finite string bounds a `>` predicate — a "biggest string"
    * sentinel would be unsound). `StringStartsWith(p)` translates to
    * [p, increment(p)]: every string with prefix p sorts inside that
    * range (the same increment rule the stat writer's max truncation
    * uses; an un-incrementable prefix keeps the sound lower bound).
    * Open bounds widen to closed; Or/Not contribute nothing — all
    * sound, they just don't prune. */
  private[graft] def conjunctiveStrRanges(filters: Array[Filter]): Map[String, (String, Option[String])] = {
    def str(v: Any): Option[String] = v match {
      case s: String => Some(s)
      case _         => None
    }
    def one(f: Filter): Seq[(String, String, Option[String])] = f match {
      case EqualTo(a, v)            => str(v).map(s => (a, s, Some(s))).toSeq
      case GreaterThan(a, v)        => str(v).map(s => (a, s, None)).toSeq
      case GreaterThanOrEqual(a, v) => str(v).map(s => (a, s, None)).toSeq
      case LessThan(a, v)           => str(v).map(s => (a, "", Some(s))).toSeq
      case LessThanOrEqual(a, v)    => str(v).map(s => (a, "", Some(s))).toSeq
      case StringStartsWith(a, p) if p.nonEmpty =>
        Seq((a, p, TxTable.strIncrement(p)))
      case In(a, vs) =>
        val ss = vs.toSeq.flatMap(str)
        if (ss.nonEmpty && ss.length == vs.length)
          Seq((a, ss.min(TxTable.strOrdering), Some(ss.max(TxTable.strOrdering))))
        else Nil
      case And(l, r) => one(l) ++ one(r)
      case _         => Nil
    }
    filters.flatMap(one).groupBy(_._1).map { case (c, cs) =>
      val lo = cs.map(_._2).max(TxTable.strOrdering)
      val his = cs.flatMap(_._3)
      val hi = if (his.isEmpty) None else Some(his.min(TxTable.strOrdering))
      c -> (lo, hi)
    }
  }

  /** Per-column candidate-value POINT sets implied by a conjunction of
    * EqualTo/In filters — the shape the per-dir Bloom filters prune
    * (high-cardinality keys where every dir's min/max range spans the
    * whole key space). Multiple point conjuncts on one column
    * intersect; an empty intersection (contradictory predicate) prunes
    * every filtered dir, which is sound — no row satisfies it. */
  private[graft] def conjunctivePoints(filters: Array[Filter]): Map[String, Seq[Any]] = {
    // only the exact types the Bloom builder hashes
    // (TxTable.bloomHashable — ONE definition, shared with the prune
    // side so the whitelists cannot drift apart): a Double/Decimal
    // value would truncate through Number.longValue in mightContain —
    // a false NEGATIVE, i.e. an unsound prune. Anything else simply
    // doesn't bloom-prune.
    def one(f: Filter): Seq[(String, Set[Any])] = f match {
      case EqualTo(a, v) if TxTable.bloomHashable(v) => Seq((a, Set(v)))
      case In(a, vs) if vs.nonEmpty && vs.forall(TxTable.bloomHashable) =>
        Seq((a, vs.toSet))
      case And(l, r) => one(l) ++ one(r)
      case _         => Nil
    }
    filters.flatMap(one).groupBy(_._1).map { case (c, cs) =>
      c -> cs.map(_._2).reduce(_ intersect _).toSeq
    }
  }

  /** Filter → Column for re-application inside the parquet scan plan.
    * Partial on purpose: an untranslated filter is simply not pushed
    * (Spark applies the original on top either way). */
  private[graft] def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case Or(l, r)  => for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case Not(c)    => toColumn(c).map(!_)
    case _         => None
  }
}
