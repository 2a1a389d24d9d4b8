package graft.plans

import scala.jdk.CollectionConverters._

import graft.sources.GraftLakeTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.execution.datasources.DataSource
import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation

/** Resolution rule behind `spark.readStream.table("cat.ns.t")` on
  * graftlake catalog tables.
  *
  * The analyzer resolves a streaming table reference to a
  * [[StreamingRelationV2]]; [[GraftLakeTable]] reports no
  * MICRO_BATCH_READ capability (the DSv2 streaming read API is
  * row-level, this table's scan path is DataFrame-level), so
  * execution would use Spark's own V2TableWithV1Fallback bridge —
  * which builds the V1 relation with EMPTY options, silently dropping
  * every reader option (`maxVersionsPerTrigger`, `readChangeFeed`,
  * `startingVersion`, ...). This rule preempts that bridge during
  * analysis: the V2 node becomes a V1 `StreamingRelation` over the
  * registered "graftlake" source with the CALLER's options plus the
  * table path, so catalog-name streams behave exactly like
  * `readStream.format("graftlake").option(...).load(path)`.
  *
  * Attribute identity: when the V1 source schema matches the V2
  * node's column names/types (the no-CDF case), the V2 attributes are
  * kept so any references already bound stay valid; a schema-changing
  * option (`readChangeFeed` adds `_change_type`) takes the fresh
  * V1 attributes — the node is still unreferenced at that point in
  * the resolution fixed-point.
  */
case class StreamingV1FallbackRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case StreamingRelationV2(_, _, t: GraftLakeTable, options, output, _, _, _) =>
        val ds = DataSource(
          spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          className = "graftlake",
          options = options.asScala.toMap + ("path" -> t.path))
        val fresh = StreamingRelation(ds)
        val sameShape =
          fresh.output.map(a => (a.name, a.dataType)) ==
            output.map(a => (a.name, a.dataType))
        if (sameShape) fresh.copy(output = output) else fresh
    }
}
