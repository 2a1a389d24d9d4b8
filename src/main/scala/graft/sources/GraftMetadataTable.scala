package graft.sources

import java.util

import graft.lake.GraftTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-only METADATA tables on catalog names (Iceberg's `t.history`
  * / `t.files` surface; the reference inspects the same state through
  * `DESCRIBE HISTORY` / `DESCRIBE DETAIL`, 02-lab-optimizations.md:
  * 193-211): `SELECT * FROM cat.ns.t.history|files|detail|partitions`
  * resolves here after the real-table lookup misses, so a genuine
  * table named like a metadata kind always wins. Rows come straight
  * from the transaction-log snapshot — METADATA-sized (≤ file count),
  * never data-sized; no data file is ever opened. Being plain SQL
  * relations, the inventories compose with the whole query surface
  * (aggregate over file sizes, join history to partitions, …) instead
  * of being terminal DESCRIBE output.
  */
final class GraftMetadataTable(
    spark: SparkSession,
    path: String,
    kind: String,
    tableName: String)
  extends Table with SupportsRead {

  // one snapshot read per resolution: schema and scan see the same
  // point-in-time state (a concurrent commit between analysis and
  // execution cannot skew the row set against the reported schema)
  private lazy val metaDf: DataFrame = {
    val t = GraftTable.forPath(spark, path)
    kind match {
      case "history" => t.history
      case "files" => t.filesDF
      case "detail" => t.detailDF
      case "partitions" => t.partitionsDF
    }
  }

  override def name(): String = tableName

  override def schema(): StructType = metaDf.schema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema()
      override def pruneColumns(requiredSchema: StructType): Unit =
        required =
          if (requiredSchema.isEmpty) StructType(schema().fields.take(1))
          else requiredSchema
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        override def toV1TableScan[T <: BaseRelation with TableScan](
            ctx: SQLContext): T = {
          val names = required.fieldNames.toSeq
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = required
            override def buildScan(): RDD[Row] =
              metaDf.select(names.map(col): _*).rdd
          }.asInstanceOf[T]
        }
      }
    }
}
