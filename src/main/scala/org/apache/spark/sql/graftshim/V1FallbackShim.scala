package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Re-export of Spark's `private[sql]` [[V2TableWithV1Fallback]] so
  * [[graft.sources.GraftLakeTable]] can opt into the V1 streaming
  * fallback (the designed hook behind `readStream.table` /
  * `writeStream.toTable` for DataFrame-level connectors — Delta's
  * mechanism). Same minimal-surface rule as [[StreamShim]]: one
  * trait, nothing else.
  */
trait GraftV1FallbackTable extends V2TableWithV1Fallback
