package org.apache.spark.sql

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Second (and only other) bridge into `private[sql]` surface, for the
  * graft DSv2 connector's delegated read path: builds Spark's OWN
  * vectorized parquet `Scan` over an explicit list of data directories,
  * with column pruning and data-filter pushdown applied — so a
  * `format("graft")` read plans as a native columnar `BatchScan
  * ParquetScan` (whole-stage codegen, row-group skipping) instead of
  * crossing an externalized `RDD[Row]` boundary the way a DSv1
  * `PrunedFilteredScan` must. Kept to the one constructor call so the
  * private-API contact area stays explicit and auditable, mirroring
  * [[GraftBridge]]. */
object GraftParquetBridge {

  /** A vectorized parquet Scan over `dirs`, reading `required` columns,
    * with `filters` (already resolved against `schema`) pushed down to
    * parquet row-group/page stats. Empty `dirs` builds a scan that
    * plans zero partitions — the all-pruned case. */
  def parquetScan(spark: SparkSession, dirs: Seq[String], schema: StructType,
                  required: StructType, filters: Seq[Expression]): Scan = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val index = new InMemoryFileIndex(
      session, dirs.map(new Path(_)), Map.empty[String, String], Some(schema))
    val builder = ParquetScanBuilder(session, index, schema, schema,
      CaseInsensitiveStringMap.empty())
    // same order Spark's own V2ScanRelationPushDown drives: filters,
    // then column pruning, then build
    builder.pushFilters(filters)
    builder.pruneColumns(required)
    builder.build()
  }

  /** Parquet scan with a pushed AGGREGATION (COUNT/MIN/MAX answered
    * from footer metadata, no data pages read) — Some only when the
    * parquet builder accepts it (requires
    * `spark.sql.parquet.aggregatePushdown=true` and a supported agg
    * shape, the same gate native parquet reads have). */
  def parquetAggScan(spark: SparkSession, dirs: Seq[String], schema: StructType,
                     aggregation: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Option[Scan] = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val index = new InMemoryFileIndex(
      session, dirs.map(new Path(_)), Map.empty[String, String], Some(schema))
    val builder = ParquetScanBuilder(session, index, schema, schema,
      CaseInsensitiveStringMap.empty())
    if (builder.pushAggregation(aggregation)) Some(builder.build()) else None
  }
}
