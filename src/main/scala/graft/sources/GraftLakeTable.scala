package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.lake.GraftTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-V2 `Table` over a GraftLake path — what
  * [[GraftCatalog]] hands Spark so `spark.sql` SELECT / INSERT /
  * DELETE / time travel work on catalog-named tables with no temp
  * views (the reference drives everything through bare SQL:
  * reference docs/02-lab-optimizations.md:116-187).
  *
  * Reads and writes bridge to the battle-tested V1 paths rather than
  * re-implementing a reader: [[V1Scan]] wraps [[GraftRelation]] (so
  * pushed filters keep driving partition/stats/bloom file skipping)
  * and [[V1Write]] wraps the transactional `append`/`overwrite`.
  * `pinnedVersion` carries `VERSION/TIMESTAMP AS OF` resolution from
  * the catalog's time-travel `loadTable` overloads into the scan.
  */
final class GraftLakeTable(
    spark: SparkSession,
    val path: String,
    tableName: String,
    pinnedVersion: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  private lazy val table = GraftTable.forPath(spark, path)

  override def name(): String = tableName

  override def schema(): StructType =
    pinnedVersion.map(table.snapshotAt(_).schema)
      .getOrElse(table.snapshot.schema)

  override def partitioning(): Array[Transform] =
    table.snapshot.partitionColumns
      .map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] = {
    val props = table.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
    (props + (TableCatalog.PROP_LOCATION -> path) +
      (TableCatalog.PROP_PROVIDER -> "graftlake")).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  // --- read: V1Scan bridge into GraftRelation's pruning scan --------

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      private var pushed: Array[Filter] = Array.empty
      private var required: StructType = schema()

      // filters drive FILE SKIPPING only; report every filter back as
      // residual so Spark keeps the exact post-scan Filter (same
      // contract as GraftRelation.unhandledFilters)
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        pushed = filters; filters
      }
      override def pushedFilters(): Array[Filter] = pushed
      override def pruneColumns(requiredSchema: StructType): Unit =
        // keep snapshot field order; an empty projection (COUNT(*))
        // still needs one column to materialize rows
        required =
          if (requiredSchema.isEmpty) StructType(schema().fields.take(1))
          else requiredSchema

      // NOTE on join sizing: Scan-level SupportsReportStatistics is
      // USELESS on this route — V2ScanRelationPushDown wraps a V1Scan
      // in V1ScanWrapper, which does not forward statistics, so the
      // static planner sees the default "assume huge" size either
      // way. Broadcast decisions for catalog-named tables come from
      // AQE's runtime sizes (asserted in GraftCatalogSpec); the
      // path-based `format("graftlake")` reader keeps its static
      // BaseRelation.sizeInBytes estimate.
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required
        override def toV1TableScan[T <: BaseRelation with TableScan](
            ctx: SQLContext): T = {
          val opts = pinnedVersion
            .map(v => Map("versionasof" -> v.toString)).getOrElse(Map.empty)
          val rel = new GraftRelation(ctx, path, opts)
          val (cols, filters) = (required.fieldNames, pushed)
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = required
            override def buildScan(): RDD[Row] = rel.buildScan(cols, filters)
          }.asInstanceOf[T]
        }
      }
    }

  // --- write: V1 InsertableRelation bridge --------------------------

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      "cannot write to a time-travelled table snapshot")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(df: DataFrame, ignored: Boolean): Unit =
              if (overwrite) table.overwrite(df) else { table.append(df); () }
          }
      }
    }
  }

  // --- DELETE FROM ---------------------------------------------------

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(GraftFilters.translatesFully)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(pinnedVersion.isEmpty, "cannot delete from a table snapshot")
    val cond = filters.flatMap(GraftFilters.toColumn)
      .reduceOption(_ && _).getOrElse(lit(true))
    table.delete(cond)
  }
}
