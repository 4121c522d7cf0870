package org.apache.spark.sql

import org.apache.spark.sql.catalyst.catalog.CatalogTable
import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Third (and final) bridge into `private[sql]` surface: re-exposes
  * Spark's `V2TableWithV1Fallback` so the graft DSv2 table can hand
  * `DataStreamWriter.toTable` a V1 CatalogTable to fall back on — the
  * exact mechanism Delta's table uses for streaming writes by name
  * (Spark dispatches `writeStream.format("graft").toTable("t")` to the
  * V1 `StreamSinkProvider` with the table's location as the path).
  * One-liner shim, mirroring [[GraftBridge]] / [[GraftParquetBridge]]:
  * the private-API contact area stays explicit and auditable. */
trait GraftV1FallbackBridge extends V2TableWithV1Fallback {
  /** The fallback CatalogTable (provider + location drive the V1 sink). */
  protected def graftV1Table: CatalogTable
  final override def v1Table: CatalogTable = graftV1Table
}
