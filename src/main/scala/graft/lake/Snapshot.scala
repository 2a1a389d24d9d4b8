package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Reconstructed table state at a version: metadata + active files.
  * Replays the action log (from the latest parquet checkpoint when
  * available) applying add/remove set semantics, exactly like the
  * `_delta_log` replay the reference's time travel relies on
  * (reference docs/02-lab-optimizations.md:196-211).
  */
final case class Snapshot(
    version: Long,
    metadata: Option[Metadata],
    activeFiles: Seq[AddFile],
    dvFiles: Seq[String] = Nil) {

  def schema: StructType =
    metadata.map(m => DataType.fromJson(m.schemaJson).asInstanceOf[StructType])
      .getOrElse(new StructType())

  def partitionColumns: Seq[String] = metadata.map(_.partitionColumns).getOrElse(Nil)

  def numFiles: Int = activeFiles.size
  def sizeInBytes: Long = activeFiles.map(_.size).sum
  def numRecords: Long = activeFiles.flatMap(_.stats.map(_.numRecords)).sum
}

object Snapshot {

  /** Pure-JSON replay (no Spark needed) — used by checkpoint writing. */
  private[lake] def replay(log: TxnLog, v: Long): Snapshot =
    applyActions(v, Nil, (0L to v).flatMap(log.readCommit))

  /** Replay with checkpoint fast-path. */
  def at(spark: SparkSession, log: TxnLog, version: Option[Long] = None): Snapshot = {
    val latest = log.latestVersion().getOrElse(
      throw new IllegalStateException(s"not a GraftLake table: ${log.tablePath}"))
    val v = version.getOrElse(latest)
    require(v <= latest, s"version $v does not exist (latest: $latest)")
    log.readCheckpoint(spark, v) match {
      case Some((cv, base)) =>
        applyActions(v, base, ((cv + 1) to v).flatMap(log.readCommit))
      case None => replay(log, v)
    }
  }

  /** Version whose commit timestamp is the latest ≤ `tsMillis`. */
  def versionAtTimestamp(log: TxnLog, tsMillis: Long): Long = {
    val vs = log.listVersions()
    vs.filter(v => log.commitTimestamp(v) <= tsMillis).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no commit at or before timestamp $tsMillis"))
  }

  private def applyActions(v: Long, base: Seq[Action], tail: Seq[Action]): Snapshot = {
    var meta: Option[Metadata] = None
    val files = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    val dvs = scala.collection.mutable.LinkedHashSet[String]()
    (base ++ tail).foreach {
      case m: Metadata => meta = Some(m)
      case a: AddFile => files(a.path) = a
      case r: RemoveFile => files.remove(r.path)
      case d: AddDV => dvs += d.path
      case d: RemoveDV => dvs -= d.path
      case _: CommitInfo => ()
    }
    Snapshot(v, meta, files.values.toSeq, dvs.toSeq)
  }
}
