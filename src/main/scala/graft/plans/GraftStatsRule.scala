package graft.plans

import graft.sources.GraftRelation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Injects GraftLake's ANALYZE statistics into Catalyst so the
  * optimizer's OWN join planning sees them (reference
  * docs/02-lab-optimizations.md:744-770 — `EXPLAIN EXTENDED` showing
  * row estimates, `optimizedPlan.stats` populated): any
  * `LogicalRelation` over a [[GraftRelation]] that lacks a catalog
  * table gets a synthetic one carrying
  * `CatalogStatistics(rowCount, NDV, nulls, numeric min/max)` parsed
  * from the `graft.stats.*` table properties.
  *
  * With `spark.sql.cbo.enabled=true`, Catalyst then derives
  * `sizeInBytes` from rowCount × row width instead of the raw file
  * size — which is what lets a pruned or compressed-on-disk dimension
  * broadcast when the size heuristic alone would shuffle both sides —
  * and fills `attributeStats` for filter/join cardinality estimation.
  * Without CBO enabled, the rule is a harmless no-op decoration.
  *
  * Installed by [[graft.GraftExtensions]] as a post-hoc resolution
  * rule; a plain `spark.read.format("graftlake")` — or SQL over such
  * a view — needs no API call to benefit (contrast [[graft.lake.Cbo]],
  * the explicit side-API the rule supersedes).
  */
case class GraftStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case lr: LogicalRelation if lr.catalogTable.isEmpty =>
      lr.relation match {
        case rel: GraftRelation =>
          rel.catalogStatistics match {
            case Some(stats) =>
              val ct = CatalogTable(
                identifier = TableIdentifier(
                  s"graft_${Integer.toHexString(System.identityHashCode(rel))}"),
                tableType = CatalogTableType.EXTERNAL,
                storage = CatalogStorageFormat.empty,
                schema = lr.relation.schema,
                provider = Some("graftlake"),
                stats = Some(stats))
              lr.copy(catalogTable = Some(ct))
            case None => lr
          }
        case _ => lr
      }
  }
}
