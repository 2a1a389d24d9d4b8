package graft.lake

import graft.GraftSparkSpec
import org.apache.spark.sql.functions._

/** Row filters + column masks (L114 — storage-layer governance):
  * policy enforcement on every public read surface, maintenance ops
  * reading RAW by construction, pruning-soundness guards on masked
  * predicates, policy-invariant schema, and the MV exclusivity rule.
  */
class GovernanceSpec extends GraftSparkSpec {

  private def fixture(name: String): GraftTable = {
    import spark.implicits._
    GraftTable.create(spark, tmpDir(name),
      (1 to 100).map(i => (i.toLong, s"user$i@x.com", i % 10))
        .toDF("id", "email", "grade").repartition(4))
  }

  test("row filter + mask apply on toDF / SQL / time travel / tags; " +
      "schema is policy-invariant; masks see RAW inputs") {
    val t = fixture("gov_basic")
    t.createTag("pre-policy")
    t.setRowFilter("grade < 5")
    t.setColumnMask("email",
      "concat('***', substring(email, char_length(email) - 3, 4))")
    assert(t.toDF.count() == 50L)
    assert(t.toDF.schema.map(f => (f.name, f.dataType)) ==
      t.snapshot.schema.map(f => (f.name, f.dataType)),
      "masking must not change the read schema (names/types)")
    val emails = t.toDF.select("email").collect().map(_.getString(0))
    assert(emails.forall(_.startsWith("***")),
      "every visible email must be masked")
    // masks evaluate against RAW values: the substring above reads the
    // ORIGINAL email's tail, which survives into the masked value
    assert(emails.exists(_.endsWith(".com")))
    // time travel and tag reads enforce the CURRENT policy — policy
    // strengthening closes VERSION AS OF too
    assert(t.toDFAt(0).count() == 50L,
      "time travel must not bypass the row filter")
    assert(t.toDFAtTag("pre-policy").select("email").collect()
      .forall(_.getString(0).startsWith("***")),
      "tag reads must not bypass the mask")
    // SQL via GraftSql registration reads governed too
    val gsql = new GraftSql(spark)
    gsql.register("gov", t.path)
    assert(gsql.sql("SELECT COUNT(*) AS c FROM gov").head.getLong(0) == 50L)
    // clearing restores raw reads
    t.clearRowFilter()
    t.clearColumnMask("email")
    assert(t.toDF.count() == 100L)
    assert(t.toDF.select("email").collect()
      .forall(!_.getString(0).startsWith("***")))
  }

  test("readWhere: pruning stays on for clean predicates, a predicate " +
      "over a MASKED column disables stats pruning and matches masked " +
      "values") {
    val t = fixture("gov_prune")
    t.setColumnMask("id", "CAST(id % 7 AS BIGINT)")
    // predicate on the masked column: must evaluate against the MASKED
    // value (what the reader sees), and must not be stats-pruned on
    // raw footers (raw id range 1..100 vs masked range 0..6)
    val hit = t.readWhere(col("id") === 3L)
    assert(hit.count() == 14L, // ids 3,10,17,...,94 with id%7==3
      "masked-column predicate must match masked values")
    assert(hit.select("id").collect().forall(_.getLong(0) == 3L))
    // predicate on an unmasked column keeps full skipping + the mask
    val g = t.readWhere(col("grade") === 1)
    assert(g.count() == 10L)
    assert(g.select("id").collect().forall(_.getLong(0) < 7L))
  }

  test("maintenance reads RAW: OPTIMIZE preserves hidden rows, " +
      "ANALYZE/constraints validate true data, exports carry full rows") {
    import spark.implicits._
    val t = fixture("gov_maintenance")
    t.setRowFilter("grade < 5")
    t.setColumnMask("email", "'hidden'")
    // OPTIMIZE rewrites through the raw path: hidden rows survive
    t.optimize()
    assert(t.toDF.count() == 50L)
    t.clearRowFilter()
    assert(t.toDF.count() == 100L,
      "OPTIMIZE under a row filter must never drop hidden rows")
    t.setRowFilter("grade < 5")
    // CHECK constraint validation runs on raw rows: a constraint
    // violated only by HIDDEN rows must still refuse
    intercept[IllegalArgumentException](
      t.addConstraint("low_grade", "grade < 5"))
    // ANALYZE sees raw values (stats feed pruning of raw footers)
    val statsRow = t.computeStats().filter(col("column") === "email")
      .select("n_distinct").head
    assert(statsRow.getLong(0) > 1L,
      "stats must describe raw data, not the constant mask")
    // the Delta export's external read is file-level: full rows
    DeltaExport.export(t)
    val ext = DeltaExport.externalRead(spark, t.path)
    assert(ext.count() == 100L,
      "exports are maintenance surfaces — they carry raw rows")
    // CDC stays raw (documented contract): changesBetween sees all rows
    t.append(Seq((200L, "z@z.com", 9)).toDF("id", "email", "grade"))
    val changes = t.changesBetween(t.version - 1, t.version)
    assert(changes.count() == 1L &&
      changes.select("email").head.getString(0) == "z@z.com")
  }

  test("streaming batches are governed; DFP/bloom reads guard masked keys") {
    val t = fixture("gov_stream")
    t.setRowFilter("grade < 5")
    val out = spark.readStream.format("graftlake").load(t.path)
      .writeStream.format("memory").queryName("gov_stream_q")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    out.awaitTermination(60000)
    assert(spark.table("gov_stream_q").count() == 50L,
      "streaming micro-batches must apply the row filter")
    // masked join key: the cost-based read falls back to a governed
    // full scan rather than pruning raw stats with masked dim keys
    t.setColumnMask("id", "CAST(id % 7 AS BIGINT)")
    import spark.implicits._
    val dim = Seq(3L).toDF("id")
    val joined = t.readCostBased(dim, "id").join(dim, "id")
    // 14 ids have id%7==3; the row filter (grade<5) then keeps 8
    assert(joined.count() == 8L,
      "a masked join key must not prune on raw stats")
  }

  test("the row filter PRUNES FILES through footer stats — a policy " +
      "is IO reduction, not just a post-scan filter") {
    import spark.implicits._
    // range-clustered files: ids 1..25 / 26..50 / 51..75 / 76..100
    val parts = (0 until 4).map(b =>
      (b * 25 + 1 to b * 25 + 25).map(i => (i.toLong, i % 10))
        .toDF("id", "grade").coalesce(1))
    val t = GraftTable.create(spark, tmpDir("gov_fileprune"), parts.head)
    parts.tail.foreach(p => t.append(p))
    val rawFiles = t.toDF.inputFiles.length
    assert(rawFiles == 4, s"fixture expects 4 range-clustered files, got $rawFiles")
    t.setRowFilter("id > 90")
    assert(t.toDF.inputFiles.length == 1,
      "the policy must skip files whose [min,max] cannot satisfy it")
    assert(t.toDF.count() == 10L)
    // readWhere composes policy pruning with predicate pruning
    val rw = t.readWhere(col("id") < 95L)
    assert(rw.inputFiles.length == 1 && rw.count() == 4L)
    // time travel prunes by the CURRENT policy too: at version 1 the
    // table holds only ids 1..50, so `id > 90` skips EVERY file
    assert(t.toDFAt(1).inputFiles.length == 0 && t.toDFAt(1).count() == 0L)
    t.clearRowFilter()
    assert(t.toDF.inputFiles.length == 4)
  }

  test("installing a policy stamps the `governance` READER feature — " +
      "a pre-governance client refuses the read instead of leaking " +
      "raw rows") {
    val t = fixture("gov_protocol")
    val before = t.snapshot.protocol.map(_.readerFeatures).getOrElse(Nil)
    assert(!before.contains("governance"))
    t.setRowFilter("grade < 5")
    val p = t.snapshot.protocol.getOrElse(fail("protocol action expected"))
    assert(p.readerFeatures.contains("governance"),
      "the SAME commit that installs the policy must stamp the feature")
    assert(p.writerFeatures.contains("governance"),
      "reader features also appear in writerFeatures (Delta rule)")
    // the mask path stamps too
    val t2 = fixture("gov_protocol2")
    t2.setColumnMask("email", "'x'")
    assert(t2.snapshot.protocol.exists(_.readerFeatures.contains("governance")))
    // CREATE with policy properties stamps at version 0
    import spark.implicits._
    val t3 = GraftTable.create(spark, tmpDir("gov_protocol3"),
      Seq((1L, 1), (2L, 7)).toDF("id", "grade"),
      properties = Map("graft.rowFilter" -> "grade < 5"))
    assert(t3.snapshot.protocol.exists(_.readerFeatures.contains("governance")))
    assert(t3.toDF.count() == 1L)
    // clones/branches KEEP the policy properties, so they must keep
    // the protocol floors too (shallow clone used to drop them)
    val bt = t.createBranch("dev")
    assert(bt.snapshot.protocol.exists(_.readerFeatures.contains("governance")),
      "a branch of a governed table must carry the governance floor")
    assert(bt.toDF.count() == 50L,
      "the branch inherits (and enforces) the parent's policy")
    val sc = GraftTable.shallowClone(spark, t.path, tmpDir("gov_clone"))
    assert(sc.snapshot.protocol.exists(_.readerFeatures.contains("governance")))
    assert(sc.toDF.count() == 50L)
  }

  test("MV exclusivity: a registered view refuses policies and a " +
      "policy refuses view registration") {
    import spark.implicits._
    val t = fixture("gov_mv")
    val mv = MaterializedAgg.create(spark, tmpDir("gov_mv_view"), t,
      groupCols = Seq("grade"), sumCols = Seq("id"))
    graft.plans.MvCatalog.registerPersistent(mv)
    intercept[IllegalArgumentException](t.setRowFilter("grade < 5"))
    intercept[IllegalArgumentException](t.setColumnMask("email", "'x'"))
    graft.plans.MvCatalog.deregisterPersistent(t)
    t.setRowFilter("grade < 5")
    val t2 = fixture("gov_mv2")
    t2.setColumnMask("email", "'x'")
    val mv2 = MaterializedAgg.create(spark, tmpDir("gov_mv2_view"), t2,
      groupCols = Seq("grade"), sumCols = Seq("id"))
    intercept[IllegalArgumentException](
      graft.plans.MvCatalog.registerPersistent(mv2))
  }

  test("policy expressions validate at ALTER time; SQL surface works") {
    val t = fixture("gov_sql")
    intercept[Exception](t.setRowFilter("no_such_column < 5"))
    intercept[IllegalArgumentException](t.setColumnMask("nope", "'x'"))
    // the GENERIC property path gets the same guards — no bypass by
    // spelling the policy as a raw TBLPROPERTY
    intercept[Exception](t.setTableProperties(
      Map("graft.rowFilter" -> "no_such_column < 5")))
    intercept[Exception](t.setTableProperties(
      Map("graft.colMask.nope" -> "'x'")))
    t.setTableProperties(Map("graft.rowFilter" -> "grade < 5"))
    assert(t.toDF.count() == 50L)
    t.clearRowFilter()
    val gsql = new GraftSql(spark)
    gsql.register("govs", t.path)
    gsql.sql("ALTER TABLE govs SET ROW FILTER 'grade < 5'")
    gsql.sql("ALTER TABLE govs SET MASK email AS '''masked'''")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM govs").head.getLong(0) == 50L)
    assert(gsql.sql("SELECT email FROM govs LIMIT 1").head.getString(0)
      == "masked")
    gsql.sql("ALTER TABLE govs DROP ROW FILTER")
    gsql.sql("ALTER TABLE govs DROP MASK email")
    assert(gsql.sql("SELECT COUNT(*) AS c FROM govs").head.getLong(0) == 100L)
  }
}
