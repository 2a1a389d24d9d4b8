package graft.lake

import scala.jdk.CollectionConverters._

import graft.GraftSparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.VariantType

/** L119 — VARIANT columns end-to-end + shredded data skipping: the
  * semi-structured column survives the log's schema roundtrip and
  * every DML path, declared shred paths materialize hidden typed
  * companions on write, and a `variant_get` predicate prunes files
  * through the companions' footer stats without the logical schema
  * ever showing them.
  */
class VariantSpec extends GraftSparkSpec {
  import org.apache.spark.sql.Column

  /** n rows of id + a variant payload {"m": {"score": id}, "tag": "t<id%3>"}. */
  private def payloadDf(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"""{"m": {"score": $i}, "tag": "t${i % 3}"}"""))
      .toDF("id", "js")
      .select(col("id"), parse_json(col("js")).as("pay"))
  }

  private def score: Column = variant_get(col("pay"), "$.m.score", "bigint")
  private def tag: Column = variant_get(col("pay"), "$.tag", "string")

  test("variant roundtrip: create/append/read through the log's schema json") {
    val t = GraftTable.create(spark, tmpDir("variant_rt"), payloadDf(1 to 50))
    assert(t.snapshot.schema("pay").dataType == VariantType)
    // the CREATE commit itself stamps the reader feature: a
    // pre-variant client refuses with an actionable name, not a
    // schema parse error
    assert(t.snapshot.protocol.exists(p =>
      p.readerFeatures.contains("variantType") &&
        p.writerFeatures.contains("variantType")))
    t.append(payloadDf(51 to 80))
    assert(t.toDF.count() == 80L)
    assert(t.toDF.select(sum(score)).head().getLong(0) == (1 to 80).sum.toLong)
    assert(t.toDF.filter(tag === "t0").count() ==
      (1 to 80).count(_ % 3 == 0).toLong)
  }

  test("ADD COLUMN of a variant mid-life stamps the feature in the " +
      "same commit; variant-free tables stay unstamped") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmpDir("variant_addcol"),
      (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    assert(!t.snapshot.protocol.exists(
      _.readerFeatures.contains("variantType")))
    t.addColumn("pay", VariantType)
    assert(t.snapshot.protocol.exists(p =>
      p.readerFeatures.contains("variantType") &&
        p.writerFeatures.contains("variantType")))
    assert(t.toDF.filter(col("pay").isNull).count() == 10L)
  }

  test("shred declaration validates; companions are written but hidden") {
    val t = GraftTable.create(spark, tmpDir("variant_shred"), payloadDf(1 to 10))
    intercept[IllegalArgumentException](
      t.setVariantShred("nope", Seq("$.m.score" -> "bigint")))
    intercept[IllegalArgumentException](
      t.setVariantShred("id", Seq("$.m.score" -> "bigint"))) // not variant
    intercept[IllegalArgumentException](
      t.setVariantShred("pay", Seq("m.score" -> "bigint"))) // no $ prefix
    intercept[Exception](
      t.setVariantShred("pay", Seq("$.m.score" -> "no_such_type")))
    t.setVariantShred("pay", Seq("$.m.score" -> "bigint", "$.tag" -> "string"))
    t.append(payloadDf(11 to 20))
    // logical surface never shows the companions
    assert(t.toDF.columns.toSet == Set("id", "pay"))
    // ...but the post-declaration file physically carries them
    val files = t.snapshot.activeFiles.map(_.path)
    val raw = spark.read.option("mergeSchema", "true").parquet(
      files.map(p => s"${t.path}/$p"): _*)
    val shredCols = raw.columns.filter(_.startsWith(VariantShred.ColPrefix))
    assert(shredCols.length == 2, raw.columns.mkString(","))
    // companion values equal the extraction (null-free here)
    val sc = VariantShred.shredColName("pay", "$.m.score",
      org.apache.spark.sql.types.LongType)
    assert(raw.filter(col(sc).isNotNull).count() == 10L)
    // generic TBLPROPERTIES path gets the same validation
    intercept[IllegalArgumentException](t.setTableProperties(
      Map(VariantShred.PropPrefix + "id" -> "$.x::int")))
  }

  test("re-declaring a path with a different type yields a fresh companion") {
    // old-typed companions carry stats computed under try_variant_get of
    // the OLD type; if the new-typed rewrite matched them, stale bounds
    // could prune files whose rows match under the new type. The name
    // CRC includes the canonical type, so the stale stats never match.
    val asInt = VariantShred.shredColName("pay", "$.m.score",
      org.apache.spark.sql.types.IntegerType)
    val asLong = VariantShred.shredColName("pay", "$.m.score",
      org.apache.spark.sql.types.LongType)
    assert(asInt != asLong)
    // same path+type spelled differently is canonicalized to ONE name
    val asLong2 = VariantShred.shredColName("pay", "$.m.score",
      org.apache.spark.sql.types.DataType.fromDDL("long"))
    assert(asLong == asLong2)
    val t = GraftTable.create(spark, tmpDir("variant_retype"), payloadDf(1 to 50))
    t.setVariantShred("pay", Seq("$.m.score" -> "int"))
    t.append(payloadDf(51 to 100).coalesce(1))
    t.setVariantShred("pay", Seq("$.m.score" -> "bigint"))
    // files written under the int declaration carry only the int-typed
    // companion: a bigint predicate must keep them (stat gap), never
    // prune off the stale int stats
    val (kept, total) = t.pruneFiles(score > 1000L)
    assert(total == kept || kept >= 2,
      s"old-typed files must stay conservative: kept=$kept total=$total")
    assert(t.readWhere(score <= 100L).count() == 100L)
  }

  test("variant_get predicates skip files via companion stats") {
    val t = GraftTable.create(spark, tmpDir("variant_skip"), payloadDf(0 until 1))
    t.setVariantShred("pay", Seq("$.m.score" -> "bigint", "$.tag" -> "string"))
    // four appends with disjoint score ranges → one file each
    Seq(1 to 100, 101 to 200, 201 to 300, 301 to 400)
      .foreach(r => t.append(payloadDf(r).coalesce(1)))
    val (kept, total) = t.pruneFiles(score >= 250L && score <= 260L)
    assert(total == 5, s"expected 5 files, got $total")
    // the pre-declaration create file has no companion stats → kept
    // conservatively; exactly one post-declaration file matches
    assert(kept == 2, s"expected 2 kept (1 match + 1 statless), got $kept")
    // string companion skips too
    val (keptT, _) = t.pruneFiles(score > 380L && tag === "t1")
    assert(keptT == 2, s"expected 2 kept for range+tag, got $keptT")
    // readWhere stays exact (original predicate applied post-scan)
    assert(t.readWhere(score >= 250L && score <= 260L).count() == 11L)
    assert(t.readWhere(tag === "t2").count() ==
      (0 to 400).count(_ % 3 == 2).toLong)
    // unshredded path/type degrades to no skipping, never wrongness
    val (keptU, totalU) = t.pruneFiles(
      variant_get(col("pay"), "$.m.other", "bigint") === 5L)
    assert(keptU == totalU)
  }

  test("DML with variant predicates; CoW rewrite regenerates companions") {
    val t = GraftTable.create(spark, tmpDir("variant_dml"), payloadDf(1 to 100))
    t.setVariantShred("pay", Seq("$.m.score" -> "bigint"))
    t.delete(score <= 20L)
    assert(t.toDF.count() == 80L)
    t.deleteMergeOnRead(tag === "t0") // MoR over variant predicate
    assert(t.toDF.count() == (21 to 100).count(_ % 3 != 0).toLong)
    // the CoW delete's rewritten survivor file carries companions
    val raw = spark.read.option("mergeSchema", "true").parquet(
      t.snapshot.activeFiles.map(f => s"${t.path}/${f.path}"): _*)
    assert(raw.columns.exists(_.startsWith(VariantShred.ColPrefix)))
    // OPTIMIZE rewrites keep companions: a post-compaction disjoint
    // append skips the compacted file via its regenerated stats
    t.append(payloadDf(101 to 200))
    t.optimize()
    t.append(payloadDf(201 to 300).coalesce(1))
    val (kept, total) = t.pruneFiles(score > 250L)
    assert(kept < total, s"optimize lost skipping: $kept/$total")
    assert(t.readWhere(score > 250L).count() == 50L)
  }

  test("Delta export stamps the variantType feature protocol; the log " +
      "round-trips through attachDelta; Iceberg v2 export refuses") {
    val t = GraftTable.create(spark, tmpDir("variant_exp"), payloadDf(1 to 40))
    DeltaExport.export(t)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val v0 = java.nio.file.Paths.get(t.path, "_graft_delta", "_delta_log",
      f"${0L}%020d.json")
    val proto = java.nio.file.Files.readAllLines(v0).asScala
      .map(mapper.readTree).find(_.has("protocol")).map(_.get("protocol"))
    assert(proto.isDefined)
    assert(proto.get.get("minReaderVersion").asInt == 3)
    assert(proto.get.get("minWriterVersion").asInt == 7)
    val rf = proto.get.get("readerFeatures").asScala.map(_.asText).toSet
    val wf = proto.get.get("writerFeatures").asScala.map(_.asText).toSet
    assert(rf == Set("variantType"), rf)
    assert(wf.contains("variantType"), wf)
    // the exported log reads back into the engine with values intact
    val att = GraftTable.attachDelta(spark,
      t.path + "/_graft_delta", tmpDir("variant_exp_att"))
    assert(att.toDF.select(sum(score)).head().getLong(0) ==
      (1 to 40).sum.toLong)
    // a variant-free export keeps the widest-reader baseline protocol
    import spark.implicits._
    val plain = GraftTable.create(spark, tmpDir("variant_exp_plain"),
      (1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    DeltaExport.export(plain)
    val p0 = java.nio.file.Paths.get(plain.path, "_graft_delta",
      "_delta_log", f"${0L}%020d.json")
    val proto2 = java.nio.file.Files.readAllLines(p0).asScala
      .map(mapper.readTree).find(_.has("protocol")).map(_.get("protocol")).get
    assert(proto2.get("minReaderVersion").asInt == 1)
    assert(!proto2.has("readerFeatures"))
    // Iceberg v2 has no variant type — refuse, never mis-map
    intercept[UnsupportedOperationException](IcebergExport.export(t))
  }

  test("variant flows through the streaming sink; streamed files carry " +
      "companions and skip") {
    import org.apache.spark.sql.streaming.Trigger
    val srcPath = tmpDir("variant_ssrc")
    val dstPath = tmpDir("variant_sdst")
    val ckpt = tmpDir("variant_sckpt")
    // range-disjoint source files → range-disjoint streamed files
    GraftTable.create(spark, srcPath,
      payloadDf(1 to 400).repartitionByRange(4, col("id")))
    val dst = GraftTable.create(spark, dstPath, payloadDf(0 to 0))
    dst.setVariantShred("pay", Seq("$.m.score" -> "bigint"))
    val q = spark.readStream.format("graftlake").load(srcPath)
      .writeStream.format("graftlake")
      .option("path", dstPath).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(dst.toDF.count() == 401L)
    assert(dst.toDF.select(sum(score)).head().getLong(0) ==
      (0 to 400).sum.toLong)
    // the streamed files physically carry the companion...
    val raw = spark.read.option("mergeSchema", "true").parquet(
      dst.snapshot.activeFiles.map(f => s"${dst.path}/${f.path}"): _*)
    assert(raw.columns.exists(_.startsWith(VariantShred.ColPrefix)))
    // ...and their footer stats skip: a narrow score range keeps the
    // statless create file + the one matching streamed file
    val (kept, total) = dst.pruneFiles(score >= 350L && score <= 360L)
    assert(total >= 5, s"expected ≥5 files, got $total")
    assert(kept < total, s"streamed files must skip: $kept/$total")
    assert(dst.readWhere(score >= 350L && score <= 360L).count() == 11L)
  }

  test("time travel, clone, and clearVariantShred") {
    val t = GraftTable.create(spark, tmpDir("variant_tt"), payloadDf(1 to 30))
    t.setVariantShred("pay", Seq("$.tag" -> "string"))
    t.append(payloadDf(31 to 60))
    assert(t.toDFAt(0).count() == 30L)
    t.clearVariantShred("pay")
    assert(t.snapshot.metadata.get.properties.keySet
      .forall(!_.startsWith(VariantShred.PropPrefix)))
    // post-clear appends write no companions; reads stay exact
    t.append(payloadDf(61 to 90))
    assert(t.readWhere(tag === "t1").count() ==
      (1 to 90).count(_ % 3 == 1).toLong)
  }
}
