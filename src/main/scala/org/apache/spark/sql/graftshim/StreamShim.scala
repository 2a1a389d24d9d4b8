package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Bridge for v1 streaming sources: `Source.getBatch` must return a
  * DataFrame whose logical plan has `isStreaming=true`, but the public
  * reader API only builds batch plans. This re-tags the scan relations
  * of a batch plan as streaming — the same move Spark's own
  * FileStreamSource makes when it builds each micro-batch from a file
  * list. Lives under `org.apache.spark.sql` for `private[sql]` access;
  * kept to the minimum surface (one method, two relation shapes).
  */
object StreamShim {

  /** The inverse bridge, for v1 sinks: `Sink.addBatch` receives a
    * streaming-incarnated DataFrame that the batch writer refuses; run
    * its already-planned incremental execution and rewrap the
    * InternalRow RDD as a plain batch frame (the Delta sink's move).
    */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val session = classic.sparkSession.asInstanceOf[ClassicSession]
    session.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }

  /** Re-create `df` with its leaf scan relations marked streaming and
    * owned by `stream` (the source reporting this batch). A plan with
    * a join (e.g. the deletion-vector anti-join) can't have every leaf
    * re-tagged — that reads as an unsupported stream-stream join — so
    * it instead executes as a batch plan whose InternalRow RDD becomes
    * a single streaming leaf.
    */
  def asStreaming(df: DataFrame, stream: SparkDataStream): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    val session = classic.sparkSession.asInstanceOf[ClassicSession]
    val analyzed = classic.queryExecution.analyzed
    // multi-leaf or join-bearing plans (DV anti-join, clone-branch
    // unions, change-feed exceptAll) can't have every leaf re-tagged
    val scanLeaves = analyzed.collect {
      case lr: LogicalRelation => lr
      case loc: LocalRelation => loc
    }.size
    val hasJoin = analyzed
      .collectFirst { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      .isDefined
    if (hasJoin || scanLeaves > 1) {
      session.internalCreateDataFrame(
        classic.queryExecution.toRdd, classic.schema, isStreaming = true)
    } else {
      val plan = analyzed.transform {
        case lr: LogicalRelation =>
          lr.copy(isStreaming = true, stream = Some(stream))
        case loc: LocalRelation =>
          loc.copy(isStreaming = true, stream = Some(stream))
      }
      ClassicDataset.ofRows(session, plan)
    }
  }

  /** Incarnate an already-analyzed logical plan as a DataFrame —
    * for injected commands that hold a resolved query (e.g. the
    * dynamic-overwrite rewrite). `Dataset.ofRows` is private[sql].
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
