package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import graft.lake.GraftTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
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
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with SupportsRowLevelOperations with SupportsMetadataColumns
  with org.apache.spark.sql.graftshim.GraftV1FallbackTable {

  private lazy val table = GraftTable.forPath(spark, path)

  override def name(): String = tableName

  // --- native row-level operations (UPDATE / MERGE / subquery DELETE)

  /** Spark's row-level rewrites plan against this. The write shape is
    * table-selectable, mirroring Delta/Iceberg's per-table write
    * modes: the default is the group-based copy-on-write rewrite
    * ([[GraftRowLevelOperation]] — whole matching files rewritten,
    * runtime group filtering scopes them), while
    * `graft.dml.mode = merge-on-read` selects the delta-based
    * operation ([[GraftDeltaOperation]] — only CHANGED rows ship:
    * deletes become deletion-vector marks, post-images append;
    * O(changed rows) for sparse DML on huge files). Simple-filter
    * DELETEs still take the [[SupportsDelete]] path below (Spark's
    * OptimizeMetadataOnlyDeleteFromTable restores it).
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedVersion.isEmpty,
      "cannot run row-level DML on a time-travelled table snapshot")
    val mor = table.snapshot.metadata.map(_.properties)
      .flatMap(_.get("graft.dml.mode"))
      .exists(m => m.equalsIgnoreCase("merge-on-read") ||
        m.equalsIgnoreCase("mor"))
    () =>
      if (mor) new GraftDeltaOperation(spark, table, info.command())
      else new GraftRowLevelOperation(spark, table, info.command())
  }

  /** `_graft_file` (the log-recorded data file path — the row-level
    * group key, and a provenance column users can SELECT) and
    * `_graft_pos` (the row's index within its file — with `_graft_file`
    * it is the delta-write row id), plus `_graft_row_id` on
    * row-tracked tables (the stable id, resolved exactly like the
    * `rowIds` reader option).
    */
  override def metadataColumns(): Array[MetadataColumn] = {
    def mc(n: String, dt: org.apache.spark.sql.types.DataType,
        nullable: Boolean): MetadataColumn = new MetadataColumn {
      override def name(): String = n
      override def dataType(): org.apache.spark.sql.types.DataType = dt
      override def isNullable: Boolean = nullable
    }
    val base = Array(
      mc("_graft_file", org.apache.spark.sql.types.StringType, false),
      mc("_graft_pos", org.apache.spark.sql.types.LongType, false))
    if (!table.rowLevelTrackingOn(table.snapshot)) base
    else base :+ mc("_graft_row_id", org.apache.spark.sql.types.LongType, true)
  }

  /** V1 fallback identity for STREAMING by catalog name (Delta's own
    * mechanism): `spark.readStream.table(t)` and
    * `df.writeStream.format("graftlake").toTable(t)` have no DSv2
    * bridge here (MicroBatchStream / StreamingWrite are row-level
    * APIs, while this table's scan and commit paths are
    * DataFrame-level), so both engines fall back to the battle-tested
    * V1 [[graft.streaming.GraftSource]] / [[graft.streaming.GraftSink]]
    * through this descriptor — provider + location are all either
    * path needs. Reader OPTIONS don't survive Spark's own fallback
    * resolution (it builds the v1 relation with empty options), so
    * [[graft.plans.StreamingV1FallbackRule]] preempts it for reads.
    */
  override def v1Table: org.apache.spark.sql.catalyst.catalog.CatalogTable = {
    import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
    // UnresolvedCatalogRelation asserts a database-qualified
    // identifier, and the streaming write plan RE-RESOLVES this
    // identifier — without the catalog part it would look in the
    // session catalog and miss; keep all three parts
    val parts = tableName.split('.')
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(
      parts.last,
      Some(if (parts.length >= 2) parts(parts.length - 2) else "default"),
      if (parts.length >= 3) Some(parts(parts.length - 3)) else None)
    CatalogTable(
      identifier = ident,
      tableType = CatalogTableType.EXTERNAL,
      storage = CatalogStorageFormat.empty.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(path).toUri),
        properties = Map("path" -> path)),
      schema = schema(),
      provider = Some("graftlake"))
  }

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
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC)

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
          val metaWanted = cols.filter(c =>
            c == "_graft_file" || c == "_graft_row_id" || c == "_graft_pos")
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = ctx
            override def schema: StructType = required
            override def buildScan(): RDD[Row] =
              if (metaWanted.isEmpty) rel.buildScan(cols, filters)
              else {
                // metadata-column read (SELECT _graft_file / _graft_row_id):
                // the provenance scan keeps the same DV masking and file
                // skipping; live snapshot only (a pinned version's files
                // may predate id assignment)
                require(pinnedVersion.isEmpty,
                  "metadata columns are a live-snapshot read")
                val pred = filters.flatMap(GraftFilters.toColumn)
                  .reduceOption(_ && _)
                table.readWithProvenance(pred,
                    wantFile = metaWanted.contains("_graft_file"),
                    wantRowId = metaWanted.contains("_graft_row_id"),
                    wantPos = metaWanted.contains("_graft_pos"))
                  .select(cols.map(org.apache.spark.sql.functions.col)
                    .toIndexedSeq: _*).rdd
              }
          }.asInstanceOf[T]
        }
      }
    }

  // --- write: V1 InsertableRelation bridge --------------------------

  /** The full DataFrameWriterV2 / INSERT OVERWRITE surface on catalog
    * names, each mode routed to the matching transactional commit:
    * append → `append`; `.overwrite(lit(true))` / static INSERT
    * OVERWRITE → full `overwrite`; `.overwrite(cond)` → L20
    * `replaceWhere` (exact-only filter translation — untranslatable
    * conditions refuse via `canOverwrite` rather than over-delete,
    * same contract as DELETE). `.overwritePartitions()` / dynamic-mode
    * INSERT OVERWRITE can't ride the V1 bridge (Spark demands real
    * BATCH_WRITE there) — [[graft.plans.DynamicOverwriteRule]]
    * rewrites that plan shape to the atomic L63 commit instead.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      "cannot write to a time-travelled table snapshot")
    new WriteBuilder with SupportsTruncate with SupportsOverwrite {
      private var mode: DataFrame => Unit = df => { table.append(df); () }

      override def truncate(): WriteBuilder = {
        mode = df => { table.overwrite(df); () }; this
      }
      override def canOverwrite(filters: Array[Filter]): Boolean =
        filters.forall(GraftFilters.translatesFully)
      override def overwrite(filters: Array[Filter]): WriteBuilder = {
        val cond = filters.flatMap(GraftFilters.toColumn)
          .reduceOption(_ && _).getOrElse(lit(true))
        mode = df => { table.replaceWhere(cond, df); () }; this
      }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(df: DataFrame, ignored: Boolean): Unit =
              mode(fillGenerated(df))
          }
      }
    }
  }

  /** V2 INSERT materializes omitted columns as NULL (there is no
    * "absent column" in `INSERT INTO t (a, b) VALUES ...` — Spark
    * pads), which would defeat the table layer's fill-when-absent
    * generated columns AND silently break derived partition pruning
    * if a writer supplied a wrong explicit value. So the bridge
    * enforces Delta's write-time invariant per generated column that
    * arrives in the frame: explicit non-NULL values must EQUAL the
    * generation expression (one count over the incoming frame — only
    * paid when the column is present), NULL slots fill from it.
    */
  private def fillGenerated(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, expr}
    val gens = table.snapshot.metadata.map(_.properties).getOrElse(Map.empty)
      .collect { case (k, v) if k.startsWith("graft.generated.") =>
        k.stripPrefix("graft.generated.") -> v }
    gens.foldLeft(df) { case (d, (c, e)) =>
      if (!d.columns.contains(c)) d
      else {
        val gen = expr(e).cast(d.schema(c).dataType)
        val bad = d.filter(col(c).isNotNull && !(col(c) <=> gen)).count()
        require(bad == 0, s"generated column $c: $bad incoming rows " +
          s"contradict its generation expression ($e)")
        d.withColumn(c, coalesce(col(c), gen))
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
