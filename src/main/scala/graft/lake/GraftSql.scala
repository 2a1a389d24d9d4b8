package graft.lake

import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL front-end for GraftLake maintenance statements — the exact
  * statement shapes the reference lab runs against Delta (reference
  * docs/02-lab-optimizations.md: `OPTIMIZE sales VORDER` §C,
  * `DESCRIBE HISTORY` / `VERSION AS OF` / `DELETE FROM` §D,
  * `VACUUM ... DRY RUN | RETAIN n HOURS` §E, `DESCRIBE DETAIL` §F),
  * plus RESTORE and UPDATE. Anything else falls through to
  * `spark.sql` with every registered table exposed as a temp view of
  * its current snapshot.
  */
final class GraftSql(spark: SparkSession) {

  private val tables = scala.collection.mutable.Map[String, GraftTable]()

  def register(name: String, path: String): GraftTable = {
    val t = GraftTable.forPath(spark, path)
    tables(name) = t
    t
  }

  def registerCreate(name: String, path: String, df: DataFrame,
                     partitionBy: Seq[String] = Nil): GraftTable = {
    val t = GraftTable.create(spark, path, df, partitionBy)
    tables(name) = t
    t
  }

  def table(name: String): GraftTable = tables.getOrElse(name,
    throw new IllegalArgumentException(s"unknown GraftLake table: $name"))

  private val optimizeRe: Regex =
    """(?is)^\s*OPTIMIZE\s+(\w+)(\s+VORDER)?(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?(\s+VORDER)?(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val vacuumDryRe: Regex =
    """(?is)^\s*VACUUM\s+(\w+)\s+DRY\s+RUN\s*;?\s*$""".r
  private val vacuumRetainRe: Regex =
    """(?is)^\s*VACUUM\s+(\w+)(?:\s+RETAIN\s+([0-9.]+)\s+HOURS)?\s*;?\s*$""".r
  private val historyRe: Regex =
    """(?is)^\s*DESCRIBE\s+HISTORY\s+(\w+)\s*;?\s*$""".r
  private val detailRe: Regex =
    """(?is)^\s*DESCRIBE\s+DETAIL\s+(\w+)\s*;?\s*$""".r
  private val extendedRe: Regex =
    """(?is)^\s*DESCRIBE\s+EXTENDED\s+(\w+)\s*;?\s*$""".r
  private val deleteRe: Regex =
    """(?is)^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r
  private val analyzeRe: Regex =
    """(?is)^\s*ANALYZE\s+TABLE\s+(\w+)\s+COMPUTE\s+STATISTICS\s*;?\s*$""".r
  private val updateRe: Regex =
    """(?is)^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$""".r
  private val cloneRe: Regex =
    """(?is)^\s*CREATE\s+TABLE\s+(\w+)\s+SHALLOW\s+CLONE\s+(\w+)\s+LOCATION\s+'([^']+)'(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*$""".r
  private val bloomRe: Regex =
    """(?is)^\s*COMPUTE\s+BLOOM\s+(?:ON\s+)?(\w+)\s*\(\s*(\w+)\s*\)\s*;?\s*$""".r
  private val renameColRe: Regex =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val dropColRe: Regex =
    """(?is)^\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*$""".r
  private val restoreRe: Regex =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$""".r
  private val restoreTsRe: Regex =
    """(?is)^\s*RESTORE\s+(?:TABLE\s+)?(\w+)\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*$""".r
  private val copyIntoRe: Regex =
    """(?is)^\s*COPY\s+INTO\s+(\w+)\s+FROM\s+'([^']+)'\s*;?\s*$""".r
  private val tableChangesRe: Regex =
    """(?is)^\s*TABLE\s+CHANGES\s+(\w+)\s+BETWEEN\s+(\d+)\s+AND\s+(\d+)\s*;?\s*$""".r
  private val versionAsOfRe: Regex =
    """(?is)\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)""".r
  private val timestampAsOfRe: Regex =
    """(?is)\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'""".r

  private def parseTsMillis(s: String): Long = Snapshot.parseTsMillis(s)

  /** Execute one statement; DDL/maintenance returns its metrics as a
    * DataFrame, queries return their result.
    */
  def sql(statement: String): DataFrame = {
    import spark.implicits._
    statement match {
      case optimizeRe(name, vorder1, zcols, vorder2, whereCond) =>
        val t = table(name)
        val metrics =
          if (zcols != null)
            t.zorderWhere(128L * 1024 * 1024,
              Option(whereCond).map(expr),
              zcols.split(",").map(_.trim).toIndexedSeq: _*)
          else {
            val m = t.optimize(where = Option(whereCond).map(expr))
            // V-Order ≈ layout optimization flag in the reference
            // (02-lab:126-152: DESCRIBE EXTENDED shows VORDER after
            // OPTIMIZE ... VORDER) — persist it as a table property
            if (vorder1 != null || vorder2 != null) {
              t.setTableProperties(Map("graft.vorder" -> "true"))
              m + ("vorder" -> "true")
            } else m
          }
        metrics.toSeq.sorted.toDF("metric", "value")
      case vacuumDryRe(name) =>
        table(name).vacuum(retentionHours = 7 * 24.0, dryRun = true)
      case vacuumRetainRe(name, hours) =>
        val h = Option(hours).map(_.toDouble).getOrElse(7 * 24.0)
        table(name).vacuum(h, dryRun = false)
      case historyRe(name) => table(name).history
      case detailRe(name) =>
        val s = table(name).snapshot
        Seq((table(name).path, s.version, s.numFiles, s.sizeInBytes,
          s.partitionColumns.mkString(","), s.numRecords))
          .toDF("location", "version", "numFiles", "sizeInBytes",
            "partitionColumns", "numRecords")
      case extendedRe(name) =>
        // schema rows followed by table properties (reference 02-lab:
        // 128-136 checks the VORDER property here)
        val s = table(name).snapshot
        val schemaRows = s.schema.fields.toSeq.map(f =>
          (f.name, f.dataType.simpleString))
        val propRows = s.metadata.toSeq.flatMap(_.properties.toSeq.sorted)
        (schemaRows ++ propRows).toDF("col_name", "data_type")
      case deleteRe(name, cond) =>
        // no WHERE = whole-table delete (Delta parity)
        val c = Option(cond).map(expr).getOrElse(lit(true))
        table(name).delete(c).toSeq.sorted.toDF("metric", "value")
      case analyzeRe(name) =>
        table(name).computeStats()
      case updateRe(name, sets, cond) =>
        val assignments = sets.split(",").map { a =>
          val Array(k, v) = a.split("=", 2)
          k.trim -> expr(v.trim)
        }.toMap
        table(name).update(expr(cond), assignments).toSeq.sorted.toDF("metric", "value")
      case cloneRe(newName, srcName, destPath, v) =>
        val cloned = GraftTable.shallowClone(spark, table(srcName).path,
          destPath, Option(v).map(_.toLong))
        tables(newName) = cloned
        Seq(("cloned", s"$srcName -> $newName"),
          ("location", destPath),
          ("sourceVersion", Option(v).getOrElse("latest")))
          .toDF("metric", "value")
      case bloomRe(name, colName) =>
        val ver = table(name).computeBloomFilter(colName)
        Seq(("bloomColumn", colName), ("version", ver.toString))
          .toDF("metric", "value")
      case renameColRe(name, from, to) =>
        val v = table(name).renameColumn(from, to)
        Seq(("renamed", s"$from -> $to"), ("version", v.toString))
          .toDF("metric", "value")
      case dropColRe(name, colName) =>
        val v = table(name).dropColumn(colName)
        Seq(("dropped", colName), ("version", v.toString))
          .toDF("metric", "value")
      case restoreRe(name, v) =>
        val nv = table(name).restore(v.toLong)
        Seq(("restoredToVersion", v), ("newVersion", nv.toString))
          .toDF("metric", "value")
      case restoreTsRe(name, ts) =>
        val nv = table(name).restoreToTimestamp(parseTsMillis(ts))
        Seq(("restoredToTimestamp", ts), ("newVersion", nv.toString))
          .toDF("metric", "value")
      case copyIntoRe(name, src) =>
        table(name).copyInto(src).toSeq.sorted.toDF("metric", "value")
      case tableChangesRe(name, from, to) =>
        // BETWEEN is inclusive of both bounds; changeFeed's range is
        // (from, to]
        table(name).changeFeed(from.toLong - 1, to.toLong)
      case other =>
        // register snapshots (incl. any VERSION AS OF rewrites) and
        // delegate to Spark SQL
        var rewritten = other
        versionAsOfRe.findAllMatchIn(other).foreach { m =>
          val (name, v) = (m.group(1), m.group(2).toLong)
          if (tables.contains(name)) {
            val viewName = s"${name}__v$v"
            table(name).toDFAt(v).createOrReplaceTempView(viewName)
            rewritten = rewritten.replace(m.matched, viewName)
          }
        }
        timestampAsOfRe.findAllMatchIn(other).foreach { m =>
          val name = m.group(1)
          if (tables.contains(name)) {
            val ms = parseTsMillis(m.group(2))
            val viewName = s"${name}__ts$ms"
            table(name).toDFAsOfTimestamp(ms).createOrReplaceTempView(viewName)
            rewritten = rewritten.replace(m.matched, viewName)
          }
        }
        tables.foreach { case (n, t) => t.toDF.createOrReplaceTempView(n) }
        spark.sql(rewritten)
    }
  }
}
