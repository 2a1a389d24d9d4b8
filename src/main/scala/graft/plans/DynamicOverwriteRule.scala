package graft.plans

import graft.sources.GraftLakeTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, OverwritePartitionsDynamic}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Dynamic partition overwrite on catalog-named graftlake tables
  * (`df.writeTo(t).overwritePartitions()`, and `INSERT OVERWRITE`
  * under `partitionOverwriteMode=dynamic`).
  *
  * Spark's capability check demands real `BATCH_WRITE` for
  * [[OverwritePartitionsDynamic]] — the V1 write bridge every other
  * write mode rides has no fallback exec for this one plan shape. So
  * the post-hoc rule rewrites the node into a command running the
  * table's own L63 `overwritePartitionsDynamic` (one atomic commit
  * replacing exactly the partitions present in the new data). The
  * analyzer has already aligned and cast the query's columns to the
  * table schema when this fires.
  */
object DynamicOverwriteRule {
  def apply(spark: SparkSession): Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.resolveOperatorsDown {
        case o @ OverwritePartitionsDynamic(r: DataSourceV2Relation, query, _, _, _)
            if o.resolved && r.table.isInstanceOf[GraftLakeTable] =>
          GraftDynamicOverwriteCommand(
            r.table.asInstanceOf[GraftLakeTable].path, query)
      }
  }
}

final case class GraftDynamicOverwriteCommand(
    path: String, query: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[QueryPlan[_]] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graftshim.StreamShim.ofRows(spark, query)
    val t = graft.lake.GraftTable.forPath(spark, path)
    if (t.snapshot.partitionColumns.isEmpty) t.overwrite(df)
    else t.overwritePartitionsDynamic(df)
    Nil
  }
}
